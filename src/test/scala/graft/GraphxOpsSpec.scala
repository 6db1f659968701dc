package graft

import graft.model._
import graft.operators.{GraphxOps, PolicyOverwrite, Weave}

/** GraphX view: Pregel BFS agrees with the DataFrame BFS; connected
  * components split disconnected snapshots. */
class GraphxOpsSpec extends SparkSpec {

  // n2's observation shares n1's timestamp so defNegatesLinkSample does
  // not remove the n1→n2 link (negation needs node ts strictly newer).
  private def chainGraph = Weave.snapshot(Findings.fromSeq(spark, Seq(
    FoundNode("n1", 10L, Map.empty,
      Seq(FoundLink("n2", LinkState.ToTarget, Map.empty)), 0),
    FoundNode("n2", 10L, Map.empty,
      Seq(FoundLink("n3", LinkState.ToTarget, Map.empty)), 1),
    FoundNode("x1", 12L, Map.empty,
      Seq(FoundLink("x2", LinkState.Bidirectional, Map.empty)), 2))),
    PolicyOverwrite)

  it("pregelBfs computes min hops from the root") {
    val hops = GraphxOps.pregelBfs(chainGraph, "n1").collect()
      .map(r => (r.getString(0), r.getLong(1))).sorted.toSeq
    hops shouldBe Seq(("n1", 0L), ("n2", 1L), ("n3", 2L))
  }

  it("pregelBfs traverses undirected links both ways") {
    val hops = GraphxOps.pregelBfs(chainGraph, "x2").collect()
      .map(r => (r.getString(0), r.getLong(1))).sorted.toSeq
    hops shouldBe Seq(("x1", 1L), ("x2", 0L))
  }

  it("missing root yields empty result") {
    GraphxOps.pregelBfs(chainGraph, "nope").count() shouldBe 0
  }

  it("pageRank: ranks sum to ~n and the hub outranks the leaves") {
    // star: hub h linked bidirectionally to 4 leaves (one finding each,
    // same ts so negation stays out of the way)
    val star = Weave.snapshot(Findings.fromSeq(spark,
      (1 to 4).map(i => FoundNode("h", 10L, Map.empty,
        Seq(FoundLink(s"l$i", LinkState.Bidirectional, Map.empty)),
        i.toLong))), graft.operators.PolicyAppend)
    val ranks = GraphxOps.pageRank(star, numIter = 20).collect()
      .map(r => (r.getString(0), r.getDouble(1))).toMap
    ranks.keySet shouldBe Set("h", "l1", "l2", "l3", "l4")
    ranks.values.sum shouldBe 5.0 +- 0.1
    val hub = ranks("h")
    (1 to 4).foreach(i => hub should be > ranks(s"l$i"))
    // leaves are symmetric
    (2 to 4).foreach(i => ranks(s"l$i") shouldBe ranks("l1") +- 1e-9)
  }

  it("stronglyConnectedComponents: cycles group, tails stay singletons") {
    import spark.implicits._
    // a→b→c→a cycle; c→d→e tail (one-way); f↔g two-cycle
    val edges = Seq(("a", "b"), ("b", "c"), ("c", "a"), ("c", "d"),
      ("d", "e"), ("f", "g"), ("g", "f")).toDF("src", "dst")
    val got = graft.operators.GraphxOps.stronglyConnectedComponents(edges)
      .as[(String, String)].collect().toMap
    got shouldBe Map("a" -> "a", "b" -> "a", "c" -> "a",
      "d" -> "d", "e" -> "e", "f" -> "f", "g" -> "f")
  }

  it("connectedComponents separates the two islands") {
    val comps = GraphxOps.connectedComponents(chainGraph).collect()
      .map(r => (r.getString(0), r.getString(1))).toMap
    comps.keySet shouldBe Set("n1", "n2", "n3", "x1", "x2")
    Set(comps("n1"), comps("n2"), comps("n3")).size shouldBe 1
    Set(comps("x1"), comps("x2")).size shouldBe 1
    comps("n1") should not be comps("x1")
  }
}
