package graft

import graft.operators.Hits

/** HITS's L1-renormalized integer recurrence, pinned against a
  * driver-local simulation of the same arithmetic — any drift between
  * the plan and the stated semantics (in-sum direction, normalization
  * rounding, missing-endpoint zeros) fails exactly. */
class HitsSpec extends SparkSpec {

  /** The operator's documented recurrence, simulated locally. */
  private def simulate(edges: Seq[(String, String)], iters: Int,
      scale: Long = 1000000L): Map[String, (Long, Long)] = {
    val e = edges.filter { case (s, t) => s != t }.distinct
    val nodes = (e.map(_._1) ++ e.map(_._2)).distinct.sorted
    var a = nodes.map(v => (v, scale)).toMap
    var h = Map.empty[String, Long]
    for (_ <- 1 to iters) {
      val hRaw = e.groupBy(_._1).map { case (u, out) =>
        (u, out.map(x => a(x._2)).sum)
      }
      val hTot = hRaw.values.sum
      h = nodes.map(v =>
        (v, hRaw.getOrElse(v, 0L) / math.max(1L, hTot / scale))).toMap
      val aRaw = e.groupBy(_._2).map { case (v, in) =>
        (v, in.map(x => h(x._1)).sum)
      }
      val aTot = aRaw.values.sum
      a = nodes.map(v =>
        (v, aRaw.getOrElse(v, 0L) / math.max(1L, aTot / scale))).toMap
    }
    nodes.map(v => (v, (h(v), a(v)))).toMap
  }

  private def run(edges: Seq[(String, String)], iters: Int) = {
    import spark.implicits._
    Hits.hits(edges.toDF("src", "dst"), iterations = iters)
      .collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2)))).toMap
  }

  describe("Hits.hits") {

    // a directory page linking to three sources, one of which also
    // links onward; plus duplicate/self edges that must not count
    val graph = Seq(
      ("dir", "s1"), ("dir", "s2"), ("dir", "s3"),
      ("s1", "s2"),
      ("dir", "s1"), // duplicate: counts once
      ("s2", "s2")) // self-loop: drops

    it("matches the driver-local simulation of the stated recurrence — " +
        "including past the CutEvery lineage-cut boundary") {
      for (iters <- Seq(1, 2, 3, 5)) { // 5 > cut period: cut path
        run(graph, iters) shouldBe simulate(graph, iters)
      }
    }

    it("is deterministic and separates the hub from the authorities") {
      val a = run(graph, 2)
      a shouldBe run(graph, 2)
      val (dirHub, dirAuth) = a("dir")
      val (_, s2Auth) = a("s2")
      dirHub should be > a("s1")._1 // the directory is the best hub
      s2Auth should be > dirAuth // pure sources out-rank it on authority
      dirAuth shouldBe 0L // nothing links TO the directory
      a("s3")._1 shouldBe 0L // s3 links to nothing: zero hub
    }

    it("matches the simulation on seeded random multigraphs") {
      val rnd = new scala.util.Random(23)
      for (_ <- 1 to 3) {
        val n = 8 + rnd.nextInt(8)
        val edges = (1 to 50).map(_ =>
          (s"n${rnd.nextInt(n)}", s"n${rnd.nextInt(n)}"))
        run(edges, 2) shouldBe simulate(edges, 2)
      }
    }

    it("tolMicro stops at the first iteration whose Σ|Δauth| crosses " +
        "the bound — identical to the fixed run at that iteration") {
      import spark.implicits._
      val e = graph.filter { case (s, t) => s != t }.distinct
      val nodes = (e.map(_._1) ++ e.map(_._2)).distinct
      val scale = 1000000L
      // authority vectors per iteration (a_0 = scale everywhere, the
      // operator's init), driver-simulated
      val auths = (0 to 8).map { i =>
        if (i == 0) nodes.map(v => (v, scale)).toMap
        else simulate(graph, i).map { case (k, (_, a)) => (k, a) }
      }
      val deltas = (1 to 8).map(i =>
        nodes.map(v => math.abs(auths(i)(v) - auths(i - 1)(v))).sum)
      val tol = math.max(deltas(2), 1L) // iteration 3's step distance
      val k = deltas.indexWhere(_ <= tol) + 1
      k should be < 8 // genuinely early-stops under the cap
      val got = Hits.hits(graph.toDF("src", "dst"),
          iterations = 8, tolMicro = tol)
        .collect()
        .map(r => (r.getString(0), (r.getLong(1), r.getLong(2)))).toMap
      got shouldBe run(graph, k)
    }

    it("renormalizes each vector into the (scale - n, 2*scale) L1 band") {
      // floor division by floor(total/scale) keeps the new total in
      // [total/q - n, total/q] with total/q in [scale, 2*scale): the
      // band is (scale - n, 2*scale), not exactly scale
      val a = run(graph, 2)
      val hubTot = a.values.map(_._1).sum
      val authTot = a.values.map(_._2).sum
      val scale = 1000000L
      hubTot should be < 2L * scale
      hubTot should be > scale - a.size
      authTot should be < 2L * scale
      authTot should be > scale - a.size
    }
  }
}
