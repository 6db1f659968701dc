package graft

import graft.model._
import graft.operators.{PolicyOverwrite, Weave}
import graft.io.{GraphMl, Json}

/** Timezone fidelity (§7.4-6): epoch ms + original tz round-trip through
  * the snapshot, GraphML (WriterSpec tz keys) and JSON. */
class TzSpec extends SparkSpec {

  private val jst = Tz(540, summerOnly = false, name = "JST")

  it("tz rides through weave into snapshot nodes and links") {
    val g = Weave.snapshot(Findings.fromSeq(spark, Seq(
      FoundNode("n1", 1000L, Map.empty,
        Seq(FoundLink("n2", LinkState.ToTarget, Map.empty)), 0, Some(jst)),
      FoundNode("n2", 500L, Map.empty, Nil, 1, None))), PolicyOverwrite)
    val nodes = g.nodes.collect().map(r =>
      (r.getString(0), if (r.isNullAt(4)) None else Some(r.getStruct(4).getInt(0))))
      .sortBy(_._1).toSeq
    nodes shouldBe Seq(("n1", Some(540)), ("n2", None))
    val links = g.links.collect()
    links.length shouldBe 1
    links(0).getStruct(5).getString(2) shouldBe "JST"
  }

  it("GraphML gains @tz_* keys only when tz is present") {
    val g = Weave.snapshot(Findings.fromSeq(spark, Seq(
      FoundNode("n1", 1537660132000L, Map.empty,
        Seq(FoundLink("n2", LinkState.Bidirectional, Map.empty)), 0, Some(jst)))))
    val xml = GraphMl.write(g)
    xml should include("attr.name=\"@tz_offset_min\" attr.type=\"int\"")
    xml should include(">540</data>")
    xml should include(">JST</data>")
    val noTz = Weave.snapshot(Findings.fromSeq(spark, Seq(
      FoundNode("n1", 100L, Map.empty, Nil, 0, None))))
    GraphMl.write(noTz) should not include "@tz_offset_min"
  }

  it("JSON wire emits tz fields and reads them back") {
    val df = Findings.fromSeq(spark, Seq(
      FoundNode("n1", 5L, Map.empty, Nil, 0, Some(jst))))
    val doc = Json.writeFoundNodes(df).collect()(0)
    doc should include("\"tz_offset_min\":540")
    doc should include("\"tz_name\":\"JST\"")
    import spark.implicits._
    val back = Json.readFoundNodes(spark.createDataset(Seq(doc)))
    val r = back.collect()(0)
    r.getStruct(5).getInt(0) shouldBe 540
  }
}
