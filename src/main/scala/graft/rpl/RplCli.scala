package graft.rpl

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.query.{GetSnapshot, Query}

/** Minimal RPL pipeline CLI mirroring the reference's `net-spider-rpl-cli`
  * snapshot/cis flow (CLI.hs:65-139): parse logs → DIO+DAO snapshots →
  * combine → print.
  *
  * Usage: runMain graft.rpl.RplCli <logPathGlob> <cooja|syslog:YEAR>
  *        [summary|nodes|links|graphml]
  */
object RplCli {
  def main(args: Array[String]): Unit = {
    val path = args(0)
    val head: ContikiNg.LogHead = args(1) match {
      case "cooja" => ContikiNg.CoojaHead
      case s if s.startsWith("syslog:") =>
        ContikiNg.SyslogHead(s.drop(7).toInt)
      case other => sys.error(s"unknown log format: $other")
    }
    val mode = if (args.length > 2) args(2) else "summary"
    val b = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[4]"))
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
    graft.sources.Tables.sessionConfs.foreach { case (k, v) => b.config(k, v) }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val (dioF, daoF) = ContikiNg.readLogs(spark, path, head)
    def starts(df: org.apache.spark.sql.DataFrame) =
      df.select(col("subject")).distinct().collect().map(_.getString(0)).toSeq
    val dioG = GetSnapshot(spark, dioF, Query(starts(dioF), unifier = Rpl.DioUnifier))
    val daoG = GetSnapshot(spark, daoF, Query(starts(daoF), unifier = Rpl.daoUnifier))
    val combined = Rpl.combineGraphs(dioG, daoG)

    mode match {
      case "summary" =>
        val s = Rpl.dodagSummary(daoG).collect()(0)
        println(s"""{"node_num":${s.getAs[Long]("node_num")},"edge_num":${s.getAs[Long]("edge_num")},"depth":${s.getAs[Long]("depth")},"root":"${s.getAs[String]("root")}","graph_ts":${s.getAs[Long]("graph_ts")},"combined_nodes":${combined.nodes.count()},"combined_links":${combined.links.count()}}""")
      case "nodes" =>
        combined.nodes.orderBy("node_id").select(to_json(struct(col("*"))))
          .collect().foreach(r => println(r.getString(0)))
      case "links" =>
        combined.links.orderBy("source_node", "dest_node")
          .select(to_json(struct(col("*"))))
          .collect().foreach(r => println(r.getString(0)))
      case "graphml" =>
        println(graft.io.GraphMl.write(combined))
      case other => sys.error(s"unknown mode: $other")
    }
    spark.stop()
  }
}
