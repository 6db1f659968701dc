package graft

import graft.model.SnapshotGraph
import graft.io.GraphMl

/** Golden-structure test mirroring the reference WriterSpec case
  * (net-spider/test/NetSpider/GraphML/WriterSpec.hs:59-120): mixed
  * directed/undirected, escaped node ids, boundary node without
  * timestamp. */
class GraphMlSpec extends SparkSpec {

  it("writes escaped GraphML with key table and meta attributes") {
    val nodes = spark.createDataFrame(Seq(
      ("\"the root\"", false, Some(100L), Some(Map.empty[String, String])),
      ("☃", true, None, None),
      ("<child>", false, Some(1537660132000L), Some(Map.empty[String, String]))))
      .toDF("node_id", "is_on_boundary", "epoch_ms", "node_attrs")
    val links = spark.createDataFrame(Seq(
      ("\"the root\"", "☃", true, 100L, Map.empty[String, String]),
      ("<child>", "\"the root\"", false, 1537660132000L, Map.empty[String, String])))
      .toDF("source_node", "dest_node", "is_directed", "epoch_ms", "link_attrs")
    val got = GraphMl.write(SnapshotGraph(nodes, links))

    got should startWith("<?xml version=\"1.0\" encoding=\"UTF-8\"?>\n")
    got should include("<key id=\"d0\" for=\"node\" attr.name=\"@timestamp\" attr.type=\"long\"/>")
    got should include("<key id=\"d2\" for=\"node\" attr.name=\"@is_on_boundary\" attr.type=\"boolean\"/>")
    got should include("<key id=\"d3\" for=\"edge\" attr.name=\"@timestamp\" attr.type=\"long\"/>")
    got should include("<node id=\"&quot;the root&quot;\">")
    got should include("<node id=\"&lt;child&gt;\">")
    got should include("<node id=\"☃\">")
    // boundary node has no timestamp rows, only the boundary flag
    got should include("  <node id=\"☃\">\n    <data key=\"d2\">true</data>\n  </node>")
    got should include("<data key=\"d1\">1970-01-01T00:00:00.100</data>")
    got should include("<edge source=\"&quot;the root&quot;\" target=\"☃\" directed=\"true\">")
    got should include("<edge source=\"&lt;child&gt;\" target=\"&quot;the root&quot;\" directed=\"false\">")
    got should endWith("</graph>\n</graphml>\n")
  }

  it("infers user attribute types for the key table") {
    val nodes = spark.createDataFrame(Seq(
      ("a", false, Some(1L), Some(Map("rank" -> "128", "name" -> "x"))),
      ("b", false, Some(2L), Some(Map("rank" -> "42", "name" -> "3x")))))
      .toDF("node_id", "is_on_boundary", "epoch_ms", "node_attrs")
    val links = spark.emptyDataFrame
      .sparkSession.createDataFrame(
        Seq.empty[(String, String, Boolean, Long, Map[String, String])])
      .toDF("source_node", "dest_node", "is_directed", "epoch_ms", "link_attrs")
    val got = GraphMl.write(SnapshotGraph(nodes, links))
    got should include("attr.name=\"rank\" attr.type=\"long\"")
    got should include("attr.name=\"name\" attr.type=\"string\"")
  }
}
