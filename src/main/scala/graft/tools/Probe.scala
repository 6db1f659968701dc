package graft.tools
// Scratch timing probe (dev-only; not part of the driver contract).
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.text.TextOps

object Probe {
  def main(args: Array[String]): Unit = {
    val b = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
    Tables.sessionConfs.foreach { case (k, v) => b.config(k, v) }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val docs = Tables.documents(spark, d).select(col("doc_id"), col("text"))
    def time(tag: String)(f: => Long): Unit = {
      f; val t0 = System.nanoTime(); val n = f
      println(f"STAGE $tag: ${(System.nanoTime() - t0) / 1e9}%.2f s rows=$n")
    }
    time("tokens-count")(docs.select(TextOps.tokenCount(col("text")).as("n")).agg(sum("n")).count())
    time("plang")(docs.select(TextOps.predictedLang(col("text")).as("p")).groupBy("p").count().count())
    time("fingerprint")(docs.select(md5(array_join(TextOps.tokens(col("text")), " ")).as("f")).agg(count(lit(1))).count())
    time("full-q71")(graft.SparkEntry.queries("q71_pipeline_e2e")(spark, d).count())
    spark.stop()
  }
}
