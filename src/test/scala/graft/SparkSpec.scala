package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funspec.AnyFunSpec
import org.scalatest.matchers.should.Matchers
import org.scalatest.BeforeAndAfterAll

/** Shared local SparkSession for specs. */
trait SparkSpec extends AnyFunSpec with Matchers with BeforeAndAfterAll {
  lazy val spark: SparkSession = SparkSpec.session

  /** "2018-12-01T20:00" → epoch ms UTC. */
  def ts(s: String): Long =
    java.time.LocalDateTime
      .parse(if (s.length == 16) s + ":00" else s)
      .toInstant(java.time.ZoneOffset.UTC).toEpochMilli
}

object SparkSpec {
  lazy val session: SparkSession = {
    val b = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
    graft.sources.Tables.sessionConfs.foreach { case (k, v) => b.config(k, v) }
    val s = b.getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
