package graft

import graft.operators.RandomWalks
import org.apache.spark.sql.functions._

/** operators/RandomWalks: deterministic hash-draw walk corpus (q135). */
class RandomWalksSpec extends SparkSpec {

  private def edges = {
    import spark.implicits._
    // a -> {b, c}; b -> {c}; c is a sink; d -> d self-loop (dropped)
    Seq(("a", "b"), ("a", "c"), ("b", "c"), ("a", "b"), ("d", "d"))
      .toDF("src", "dst")
  }

  it("emits walksPerNode walks per non-sink node; every consecutive " +
      "step is an edge; sinks end walks early") {
    val w = RandomWalks.walks(edges, walksPerNode = 2, length = 3)
    val rows = w.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getString(3)))
    // starts: only a and b have out-edges (d's self-loop is dropped)
    rows.filter(_._3 == 0L).map(t => (t._1, t._2)).sorted shouldBe
      Seq(("a", 0L), ("a", 1L), ("b", 0L), ("b", 1L))
    // b's walks are forced b -> c, then stop (c is a sink)
    val b0 = rows.filter(t => t._1 == "b" && t._2 == 0L).sortBy(_._3)
    b0.map(_._4).take(2) shouldBe Seq("b", "c")
    b0.length shouldBe 2 // no step past the sink
    // every consecutive (node, next) pair is a real edge
    val e = Set(("a", "b"), ("a", "c"), ("b", "c"))
    for {
      (st, wi) <- rows.map(t => (t._1, t._2)).distinct
      walk = rows.filter(t => t._1 == st && t._2 == wi).sortBy(_._3)
      (u, v) <- walk.map(_._4).zip(walk.map(_._4).drop(1))
    } (e.contains((u, v)): Boolean) shouldBe true
  }

  it("is deterministic across partitionings (re-runs must reproduce " +
      "the corpus bit-for-bit)") {
    val w1 = RandomWalks.walks(edges, 2, 3).collect()
      .map(_.toSeq).sortBy(_.toString)
    val w2 = RandomWalks.walks(edges.repartition(7), 2, 3).collect()
      .map(_.toSeq).sortBy(_.toString)
    w1 shouldBe w2
  }

  describe("node2vecWalks (integer-bias second-order walks)") {
    it("wReturn=0 filters the backtrack candidate entirely — a pure " +
        "2-cycle walk stops after one step") {
      import spark.implicits._
      val cyc = Seq(("a", "b"), ("b", "a")).toDF("src", "dst")
      val w = RandomWalks.node2vecWalks(cyc, walksPerNode = 4,
        length = 3, wReturn = 0, wCommon = 4, wOut = 2)
      w.agg(max("step")).collect()(0).getLong(0) shouldBe 1L
    }

    it("weights bias the draw: common (distance-1) neighbors beat out " +
        "neighbors roughly 4:2, returns never happen at weight 0") {
      import spark.implicits._
      // s -> {a, b}; a -> {s(return), b(common: s->b exists), c(out)}
      val e = Seq(("s", "a"), ("s", "b"), ("a", "s"), ("a", "b"),
        ("a", "c")).toDF("src", "dst")
      val w = RandomWalks.node2vecWalks(e, walksPerNode = 400,
        length = 2, wReturn = 0, wCommon = 4, wOut = 2)
      val step2 = w.filter(col("start") === "s" && col("step") === 2)
        .select("node").collect().map(_.getString(0))
      step2 should not contain "s" // return candidate filtered
      val nb = step2.count(_ == "b")
      val nc = step2.count(_ == "c")
      nb should be > nc // 4:2 bias over hundreds of walks
      nc should be > 0 // ...but out steps still happen
    }

    it("is deterministic across partitionings") {
      val w1 = RandomWalks.node2vecWalks(edges, 3, 3).collect()
        .map(_.toSeq).sortBy(_.toString)
      val w2 = RandomWalks.node2vecWalks(edges.repartition(5), 3, 3)
        .collect().map(_.toSeq).sortBy(_.toString)
      w1 shouldBe w2
    }
  }

  it("distinct walks from one start can diverge (the draw depends on " +
      "widx)") {
    // over many walk indices from 'a', both neighbors should appear at
    // step 1 — the draw is not constant per node
    val w = RandomWalks.walks(edges, walksPerNode = 16, length = 1)
    val firstSteps = w.filter(col("start") === "a" && col("step") === 1)
      .select("node").collect().map(_.getString(0)).toSet
    firstSteps shouldBe Set("b", "c")
  }
}
