package graft

import graft.io.Json
import graft.model._

/** JSON wire-format codec: reads the reference's golden docs
  * (FoundSpec.hs:28-46, Timestamp string-or-object Timestamp.hs:76-101)
  * and round-trips the canonical form. */
class JsonSpec extends SparkSpec {

  it("reads the reference golden FoundNode doc") {
    import spark.implicits._
    val golden =
      """{"subject_node": "foobar", "found_at": {"epoch_time": 99200},
        | "node_attrs": "hoge",
        | "neighbor_links": [
        |   {"target_node": "quux", "link_state": "to_subject", "link_attrs": []}
        | ]}""".stripMargin.replace("\n", "")
    val df = Json.readFoundNodes(spark.createDataset(Seq(golden)))
    val r = df.collect()(0)
    r.getString(0) shouldBe "foobar" // subject
    r.getLong(1) shouldBe 99200L // epoch_ms
    r.getMap[String, String](3).toMap shouldBe Map("value" -> "hoge")
    val links = r.getSeq[org.apache.spark.sql.Row](4)
    links.size shouldBe 1
    links.head.getString(0) shouldBe "quux"
    links.head.getString(1) shouldBe "to_subject"
    links.head.getMap[String, String](2).toMap shouldBe empty
  }

  it("accepts relaxed-ISO string timestamps and tz objects") {
    import spark.implicits._
    val docs = Seq(
      """{"subject_node":"a","found_at":"2018-10-11T11:20:10","neighbor_links":[]}""",
      """{"subject_node":"b","found_at":{"epoch_time":5,"tz_offset_min":540,
        |"tz_summer_only":false,"tz_name":"JST"},"neighbor_links":[]}"""
        .stripMargin.replace("\n", ""))
    val df = Json.readFoundNodes(spark.createDataset(docs))
    df.select("subject", "epoch_ms").collect()
      .map(r => (r.getString(0), r.getLong(1))).sorted.toSeq shouldBe
      Seq(("a", 1539256810000L), ("b", 5L))
  }

  it("round-trips canonical findings through the wire format") {
    val fns = Seq(
      FoundNode("n1", 1000L, Map("k" -> "v"),
        Seq(FoundLink("n2", LinkState.ToTarget, Map("p" -> "1"))), 0),
      FoundNode("n2", 2000L, Map.empty, Nil, 1))
    val df = Findings.fromSeq(spark, fns)
    val wire = Json.writeFoundNodes(df)
    wire.collect().foreach { doc =>
      doc should include("\"subject_node\"")
      doc should include("\"found_at\"")
      doc should include("\"epoch_time\"")
    }
    val back = Json.readFoundNodes(wire)
    val got = back.select("subject", "epoch_ms").collect()
      .map(r => (r.getString(0), r.getLong(1))).sorted.toSeq
    got shouldBe Seq(("n1", 1000L), ("n2", 2000L))
  }

  it("round-trips a snapshot through the wire format") {
    val g = SnapshotGraph(
      spark.createDataFrame(Seq(
        ("n1", false, Some(100L), Some(Map("a" -> "b"))),
        ("n2", true, None, None)))
        .toDF("node_id", "is_on_boundary", "epoch_ms", "node_attrs"),
      spark.createDataFrame(Seq(
        ("n1", "n2", true, 100L, Map("p" -> "1"))))
        .toDF("source_node", "dest_node", "is_directed", "epoch_ms", "link_attrs"))
    val (nd, ld) = Json.writeSnapshot(g)
    val back = Json.readSnapshot(nd, ld)
    back.nodes.collect().map(r => (r.getString(0), r.getBoolean(1),
      if (r.isNullAt(2)) None else Some(r.getLong(2))))
      .sortBy(_._1).toSeq shouldBe
      Seq(("n1", false, Some(100L)), ("n2", true, None))
    val l = back.links.collect()(0)
    (l.getString(0), l.getString(1), l.getBoolean(2), l.getLong(3)) shouldBe
      ("n1", "n2", true, 100L)
    l.getMap[String, String](4).toMap shouldBe Map("p" -> "1")
  }

  it("round-trips snapshot tz through the wire format (Timestamp.hs:76-101)") {
    import graft.model.Tz
    val g = SnapshotGraph(
      spark.createDataFrame(Seq(
        ("n1", false, Some(100L), Some(Map("a" -> "b")),
          Some(Tz(540, false, "JST"))),
        ("n2", true, None, None, None)))
        .toDF("node_id", "is_on_boundary", "epoch_ms", "node_attrs", "tz"),
      spark.createDataFrame(Seq(
        ("n1", "n2", true, 100L, Map("p" -> "1"), Some(Tz(-60, true, "X")))))
        .toDF("source_node", "dest_node", "is_directed", "epoch_ms",
          "link_attrs", "tz"))
    val (nd, ld) = Json.writeSnapshot(g)
    // wire docs carry the tz fields inside the timestamp object
    val doc = nd.collect().sorted.head
    doc should include("\"tz_offset_min\":540")
    doc should include("\"tz_name\":\"JST\"")
    val back = Json.readSnapshot(nd, ld)
    val n1 = back.nodes.filter(org.apache.spark.sql.functions
      .col("node_id") === "n1").collect()(0)
    val ntz = n1.getStruct(n1.fieldIndex("tz"))
    (ntz.getInt(0), ntz.getBoolean(1), ntz.getString(2)) shouldBe
      (540, false, "JST")
    // tz-less node reads back with null tz
    val n2 = back.nodes.filter(org.apache.spark.sql.functions
      .col("node_id") === "n2").collect()(0)
    n2.isNullAt(n2.fieldIndex("tz")) shouldBe true
    val l = back.links.collect()(0)
    val ltz = l.getStruct(l.fieldIndex("tz"))
    (ltz.getInt(0), ltz.getBoolean(1), ltz.getString(2)) shouldBe
      (-60, true, "X")
  }

  it("writes snapshot node/link wire docs with nullable timestamp") {
    val g = SnapshotGraph(
      spark.createDataFrame(Seq(
        ("n1", false, Some(100L), Some(Map("a" -> "b"))),
        ("n2", true, None, None)))
        .toDF("node_id", "is_on_boundary", "epoch_ms", "node_attrs"),
      spark.createDataFrame(Seq(
        ("n1", "n2", true, 100L, Map.empty[String, String])))
        .toDF("source_node", "dest_node", "is_directed", "epoch_ms", "link_attrs"))
    val (nodes, links) = Json.writeSnapshot(g)
    val nodeDocs = nodes.collect().sorted
    nodeDocs(0) should include("\"timestamp\":{\"epoch_time\":100}")
    nodeDocs(1) should (include("\"is_on_boundary\":true") and
      not include "\"timestamp\"")
    links.collect()(0) should include("\"source_node\":\"n1\"")
  }
}
