package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: print formatted physical plans for selected gate queries so
  * plan regressions (lost pushdown, surprise cartesians, global windows)
  * are visible per round. Not part of the driver contract.
  *
  *   runMain graft.tools.ExplainAudit <sfDir> [queryName...]
  */
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val b = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
    graft.sources.Tables.sessionConfs.foreach { case (k, v) => b.config(k, v) }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // keep cache-hygiene operators lazy so their FULL plan is printable
    // (materialized results explain as an opaque existing-RDD scan)
    spark.conf.set(graft.util.Checkpoints.MaterializeConf, "false")
    val names =
      if (args.length > 1) args.drop(1).toSeq
      else graft.SparkEntry.queries.keys.toSeq.sorted
    names.foreach { n =>
      println(s"===== $n =====")
      graft.SparkEntry.queries(n)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
