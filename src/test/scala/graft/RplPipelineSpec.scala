package graft

import org.apache.spark.sql.functions._
import graft.model._
import graft.operators._
import graft.query.{GetSnapshot, Query}
import graft.rpl._

/** End-to-end RPL pipeline: fixture log → findings → snapshot (DIO/DAO
  * unifiers) → combined graph → DODAG analytics — the reference CLI's
  * `cis` flow (net-spider-rpl-cli/src/NetSpider/RPL/CLI.hs:129-138) and
  * AnalyzeSpec semantics. */
class RplPipelineSpec extends SparkSpec {

  private implicit val stringEnc: org.apache.spark.sql.Encoder[String] =
    org.apache.spark.sql.Encoders.STRING

  private val fixtureDir = "/root/reference/net-spider-rpl/test/data"
  private def haveFixtures =
    java.nio.file.Files.exists(java.nio.file.Paths.get(fixtureDir))

  it("DioUnifier merges both ends, preferring the lower NeighborType") {
    // n1 sees n2 as preferred parent (newer); n2 sees n1 as candidate.
    val samples = Findings.fromSeq(spark, Seq(
      FoundNode("n1", 2000L, Map.empty, Seq(FoundLink("n2",
        LinkState.ToTarget, Map("neighbor_type" -> "preferred_parent",
          "neighbor_rank" -> "128", "metric" -> "100"))), 0),
      FoundNode("n2", 3000L, Map.empty, Seq(FoundLink("n1",
        LinkState.Unused, Map("neighbor_type" -> "parent_candidate",
          "neighbor_rank" -> "256", "metric" -> "120"))), 1)))
    val g = Weave.snapshot(samples, PolicyAppend, Rpl.DioUnifier)
    val links = g.links.collect()
    links.length shouldBe 1
    val l = links(0)
    // main side = n1's sample (preferred_parent < parent_candidate)
    l.getString(0) shouldBe "n1" // source
    l.getString(1) shouldBe "n2"
    l.getLong(3) shouldBe 2000L
    val attrs = l.getMap[String, String](4).toMap
    attrs("source_neighbor_type") shouldBe "preferred_parent"
    attrs("dest_neighbor_type") shouldBe "parent_candidate"
  }

  it("combineGraphs merges DIO and DAO node sets on IPv6 identity") {
    val dioG = SnapshotGraph(
      Findings.fromSeq(spark, Seq(
        FoundNode("dio://[fd00::1]", 1000L, Map("rank" -> "128"), Nil, 0)))
        .sparkSession.createDataFrame(
          Seq(("dio://[fd00::1]", false, Some(1000L), Some(Map("rank" -> "128"))),
            ("dio://[fd00::2]", true, None, None)))
        .toDF("node_id", "is_on_boundary", "epoch_ms", "node_attrs"),
      spark.createDataFrame(Seq(
        ("dio://[fd00::1]", "dio://[fd00::2]", true, 1000L,
          Map("x" -> "1"))))
        .toDF("source_node", "dest_node", "is_directed", "epoch_ms", "link_attrs"))
    val daoG = SnapshotGraph(
      spark.createDataFrame(
        Seq(("dao://[fd00::1]", false, Some(2000L), Some(Map("dao_route_num" -> "5"))),
          ("dao://[fd00::3]", false, Some(500L), None)))
        .toDF("node_id", "is_on_boundary", "epoch_ms", "node_attrs"),
      spark.createDataFrame(Seq(
        ("dao://[fd00::1]", "dao://[fd00::3]", true, 2000L,
          Map.empty[String, String])))
        .toDF("source_node", "dest_node", "is_directed", "epoch_ms", "link_attrs"))
    val combined = Rpl.combineGraphs(dioG, daoG)
    val nodes = combined.nodes.collect().map(r => (r.getString(0),
      if (r.isNullAt(2)) None else Some(r.getLong(2)),
      if (r.isNullAt(3)) None else Some(r.getMap[String, String](3).toMap)))
      .sortBy(_._1).toSeq
    nodes shouldBe Seq(
      // fd00::1: rep = latest with attrs (dao@2000); merged attrs
      ("fd00::1", Some(2000L),
        Some(Map("rank" -> "128", "dao_route_num" -> "5"))),
      ("fd00::2", None, None),
      ("fd00::3", Some(500L), None))
    val links = combined.links.collect()
      .map { r =>
        val m: Map[String, String] = r.getMap[String, String](4).toMap
        (r.getString(0), r.getString(1), m("link_type"))
      }.sorted.toSeq
    links shouldBe Seq(("fd00::1", "fd00::2", "dio"), ("fd00::1", "fd00::3", "dao"))
  }

  it("full pipeline on syslog_root: parse → query → combine → analyze") {
    if (!haveFixtures) cancel("fixtures missing")
    val (dioF, daoF) = ContikiNg.readLogs(spark,
      s"$fixtureDir/syslog_root.log", ContikiNg.SyslogHead(2019))
    // starts = all DAO subjects sorted by route_num desc (CLI.hs:388-389)
    val daoStarts = daoF.select(col("subject")).distinct()
      .collect().map(_.getString(0)).toSeq
    val dioStarts = dioF.select(col("subject")).distinct()
      .collect().map(_.getString(0)).toSeq
    val dioG = GetSnapshot(spark, dioF,
      Query(dioStarts, unifier = Rpl.DioUnifier))
    val daoG = GetSnapshot(spark, daoF,
      Query(daoStarts, unifier = Rpl.daoUnifier))
    val combined = Rpl.combineGraphs(dioG, daoG)
    // root node fd00::212:1199:eebb:62c4 with 4 DAO children + 4 DIO
    // neighbors (same 4 addresses) ⇒ 5 combined nodes
    combined.nodes.count() shouldBe 5
    val summary = Rpl.dodagSummary(daoG).collect()(0)
    summary.getAs[Long]("node_num") shouldBe 5
    summary.getAs[Long]("edge_num") shouldBe 4
    summary.getAs[Long]("depth") shouldBe 1
    summary.getAs[String]("root") shouldBe "dao://[fd00::212:1199:eebb:62c4]"
    summary.getAs[Long]("graph_ts") shouldBe 1546968337000L
  }

  it("dodagSummary error paths: multiple roots and all orphans") {
    def graphOf(links: Seq[(String, String)], nodes: Seq[String]) =
      SnapshotGraph(
        spark.createDataFrame(nodes.map(n => (n, false, Some(1L),
          None: Option[Map[String, String]])))
          .toDF("node_id", "is_on_boundary", "epoch_ms", "node_attrs"),
        spark.createDataFrame(links.map { case (s, d) =>
          (s, d, true, 1L, Map.empty[String, String]) })
          .toDF("source_node", "dest_node", "is_directed", "epoch_ms", "link_attrs"))
    // two disjoint trees ⇒ multiple root candidates
    Rpl.getRoot(graphOf(Seq(("a", "b"), ("c", "d")),
      Seq("a", "b", "c", "d"))) shouldBe
      Left("The graph contains multiple root candidates.")
    // no links at all ⇒ orphans only
    Rpl.getRoot(graphOf(Nil, Seq("a", "b"))) shouldBe
      Left("The graph contains orphan nodes only.")
    // clean single root
    Rpl.getRoot(graphOf(Seq(("a", "b"), ("b", "c")),
      Seq("a", "b", "c"))) shouldBe Right("a")
  }
}
