package graft

import org.apache.spark.sql.functions._
import graft.operators.{Motifs, PolicyKeepN, PolicyOverwrite, TemporalReach, Weave}

/** PolicyKeepN retention, neighborhood aggregation, temporal reachability. */
class GraphTemporalSpec extends SparkSpec {
  import spark.implicits._

  describe("PolicyKeepN") {
    val findings = Seq(
      ("a", 10L, 1L), ("a", 20L, 2L), ("a", 30L, 3L), ("a", 40L, 4L),
      ("b", 5L, 5L))
      .toDF("subject", "epoch_ms", "finding_seq")

    it("keeps exactly the latest n findings per node") {
      Weave.retainFindings(findings, PolicyKeepN(2))
        .select("subject", "epoch_ms").as[(String, Long)]
        .collect().toSet shouldBe Set(("a", 40L), ("a", 30L), ("b", 5L))
    }

    it("n = 1 equals PolicyOverwrite") {
      val keep1 = Weave.retainFindings(findings, PolicyKeepN(1))
        .select("subject", "epoch_ms").as[(String, Long)].collect().toSet
      val over = Weave.retainFindings(findings, PolicyOverwrite)
        .select("subject", "epoch_ms").as[(String, Long)].collect().toSet
      keep1 shouldBe over
    }
  }

  describe("Motifs.neighborDegreeStats") {
    it("matches hand-counted degrees on a star-plus-edge graph") {
      // star: c—a, c—b, c—d; plus a—b
      val edges = Seq(("c", "a"), ("c", "b"), ("c", "d"), ("a", "b"))
        .toDF("s", "t")
      val got = Motifs.neighborDegreeStats(edges)
        .as[(String, Long, Long, Long, Long)].collect().toSet
      got shouldBe Set(
        ("a", 2L, 2L, 3L, 5L), // nbrs c(3), b(2)
        ("b", 2L, 2L, 3L, 5L),
        ("c", 3L, 1L, 2L, 5L), // nbrs a(2), b(2), d(1)
        ("d", 1L, 3L, 3L, 3L))
    }
  }

  describe("TemporalReach.earliestArrival") {
    it("respects time ordering where static BFS does not") {
      // a →(t=10) b →(t=5) c: statically a reaches c, temporally NOT
      // (c's edge happens before arrival at b); d →(t=20) reachable
      // from b only after t=10.
      val edges = Seq(
        ("a", "b", 10L), ("b", "c", 5L), ("b", "d", 20L))
        .toDF("src", "dst", "edge_ms")
      val got = TemporalReach.earliestArrival(edges,
        Seq("a").toDF("node_id"))
        .as[(String, Long)].collect().toMap
      got.keySet shouldBe Set("a", "b", "d")
      got("b") shouldBe 10L
      got("d") shouldBe 20L
    }

    it("takes the earliest admissible arrival among multiple paths") {
      // two routes to d: via b (arrive 30) and via c (arrive 25);
      // the c route's second edge opens only at 25 ≥ 15
      val edges = Seq(
        ("a", "b", 10L), ("b", "d", 30L),
        ("a", "c", 15L), ("c", "d", 25L))
        .toDF("src", "dst", "edge_ms")
      TemporalReach.earliestArrival(edges, Seq("a").toDF("node_id"))
        .filter(col("node_id") === "d")
        .select("arrival_ms").as[Long].head() shouldBe 25L
    }

    it("terminates on same-timestamp cycles") {
      val edges = Seq(("a", "b", 7L), ("b", "a", 7L))
        .toDF("src", "dst", "edge_ms")
      TemporalReach.earliestArrival(edges, Seq("a").toDF("node_id"))
        .as[(String, Long)].collect().toSet shouldBe
          Set(("a", Long.MinValue), ("b", 7L))
    }

    it("seeded invariant: temporally reachable ⊆ statically reachable, " +
        "arrivals are witnessed edge timestamps") {
      for (seed <- Seq(11L, 12L, 13L)) {
        val rnd = new scala.util.Random(seed)
        val edges = Seq.fill(120)((s"v${rnd.nextInt(20)}",
          s"v${rnd.nextInt(20)}", rnd.nextInt(50).toLong))
          .filter(e => e._1 != e._2)
          .toDF("src", "dst", "edge_ms")
        val starts = Seq("v0", "v1").toDF("node_id")
        val temporal = TemporalReach.earliestArrival(edges, starts)
          .as[(String, Long)].collect().toMap
        val static = graft.operators.Bfs
          .reachable(edges.select("src", "dst"), starts)
          .select("node_id").as[String].collect().toSet
        // subset: respecting time can never reach MORE than ignoring it
        temporal.keySet.subsetOf(static) shouldBe true
        val edgeTimes = edges.select("edge_ms").as[Long].collect().toSet
        temporal.filterNot(_._2 == Long.MinValue).values
          .foreach(t => edgeTimes should contain(t))
      }
    }
  }
}
