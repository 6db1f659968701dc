package graft

import graft.operators.HyperBall

/** HyperBall's register recurrence, pinned against a driver-local
  * BFS + single-element-sketch simulation of the same md5 hashing —
  * any drift in ball semantics (direction, self inclusion, merge)
  * fails exactly; the FP estimators are checked against exact ball
  * sizes on designed graphs. */
class HyperBallSpec extends SparkSpec {

  /** Same h32 as Hll: first 8 hex chars of md5, as a long. */
  private def h32(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(d.take(4).map("%02x".format(_)).mkString, 16)
  }

  private def bucketRho(s: String, m: Int): (Long, Long) = {
    val b = Integer.numberOfTrailingZeros(m)
    val width = 33 - b
    val h = h32(s)
    val rest = h >> b
    val rho = if (rest == 0) width.toLong
      else width - (64 - java.lang.Long.numberOfLeadingZeros(rest))
    (h & (m - 1), rho)
  }

  /** Exact out-balls by BFS, then per-ball registers. */
  private def simulate(edges: Seq[(String, String)], hops: Int,
      m: Int): Map[(String, Long), Long] = {
    val e = edges.filter { case (s, t) => s != t }.distinct
    val nodes = (e.map(_._1) ++ e.map(_._2)).distinct
    val out = e.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    def ball(v: String): Set[String] = {
      var b = Set(v)
      for (_ <- 1 to hops)
        b = b ++ b.flatMap(u => out.getOrElse(u, Set.empty))
      b
    }
    nodes.flatMap { v =>
      ball(v).toSeq.map(u => (v, bucketRho(u, m)))
        .groupBy { case (_, (bkt, _)) => bkt }
        .map { case (bkt, xs) =>
          ((v, bkt), xs.map(_._2._2).max)
        }
    }.toMap
  }

  private def run(edges: Seq[(String, String)], hops: Int, m: Int) = {
    import spark.implicits._
    HyperBall.ballRegisters(edges.toDF("src", "dst"), hops, m)
      .collect()
      .map(r => ((r.getString(0), r.getLong(1)), r.getLong(2))).toMap
  }

  describe("HyperBall.ballRegisters") {

    val graph = Seq(
      ("a", "b"), ("b", "c"), ("c", "d"), // chain: radius matters
      ("a", "c"), // shortcut
      ("d", "a"), // back edge closes a cycle
      ("a", "b"), // duplicate: harmless
      ("b", "b")) // self-loop: drops

    it("matches the driver-local BFS + sketch simulation — including " +
        "past the CutEvery lineage-cut boundary") {
      for (hops <- Seq(0, 1, 2, 3); m <- Seq(16, 64)) {
        run(graph, hops, m) shouldBe simulate(graph, hops, m)
      }
      run(graph, 7, 64) shouldBe simulate(graph, 7, 64) // cut path
    }

    it("matches the simulation on seeded random multigraphs") {
      val rnd = new scala.util.Random(37)
      for (_ <- 1 to 2) {
        val n = 8 + rnd.nextInt(8)
        val edges = (1 to 40).map(_ =>
          (s"n${rnd.nextInt(n)}", s"n${rnd.nextInt(n)}"))
        run(edges, 2, 64) shouldBe simulate(edges, 2, 64)
      }
    }

    it("is monotone in hops (registers only ever grow)") {
      val r1 = run(graph, 1, 64)
      val r2 = run(graph, 2, 64)
      for (((id, bkt), rho) <- r1)
        r2((id, bkt)) should be >= rho
    }
  }

  describe("HyperBall.estimates and harmonicCentralities") {

    it("estimates small balls in the linear-counting regime") {
      import spark.implicits._
      // a -> 6 leaves: ball(a,1) has 7 members, each leaf ball is 1
      val star = (1 to 6).map(i => ("hub", s"leaf$i"))
      val regs = HyperBall.ballRegisters(star.toDF("src", "dst"), 1, 64)
      val est = HyperBall.estimates(regs, 64)
        .collect().map(r => (r.getString(0), r.getDouble(1))).toMap
      est("hub") shouldBe 7.0 +- 2.0
      est("leaf1") shouldBe 1.0 +- 0.5
    }

    it("gives the hub of an out-star its exact-graph harmonic rank " +
        "and unreachable leaves exactly zero") {
      import spark.implicits._
      val star = (1 to 10).map(i => ("hub", s"leaf$i"))
      val h = HyperBall.harmonicCentralities(star.toDF("src", "dst"),
          maxHops = 2, m = 64)
        .collect().map(r => (r.getString(0), r.getDouble(1))).toMap
      // exact H(hub) = 10 (ten nodes at distance 1); HLL tolerance
      h("hub") shouldBe 10.0 +- 3.0
      // a leaf's ball never grows: every per-hop delta is exactly 0
      h("leaf3") shouldBe 0.0
    }

    it("harmonicCentralities past the LazyHops per-hop-cut boundary " +
        "equals the value derived from independent per-hop registers") {
      import spark.implicits._
      import org.apache.spark.sql.functions.{col, greatest, lit}
      val df = Seq(("a", "b"), ("b", "c"), ("c", "d"), ("a", "c"),
        ("d", "a")).toDF("src", "dst")
      // est_0..est_3 from four INDEPENDENT ballRegisters calls (each
      // simulation-pinned above); harmonic(maxHops = 3) — the cut
      // path, 3 > LazyHops — must combine to the same values.
      // Tolerance, not bit-equality: the expected side sums 2^-rho in
      // sparse-row shuffle order, the packed path in bucket order —
      // the registers are identical, the FP sum order is not.
      val perHop = (0 to 3).map(t =>
        HyperBall.estimates(HyperBall.ballRegisters(df, t, 64), 64)
          .withColumnRenamed("est", s"est_$t"))
      val joined = perHop.reduce(_.join(_, Seq("id")))
      val h = (1 to 3).map(t =>
        greatest(col(s"est_$t") - col(s"est_${t - 1}"), lit(0.0)) / t)
        .reduce(_ + _)
      val expected = joined.select(col("id"), h.as("harmonic"))
        .collect().map(r => (r.getString(0), r.getDouble(1))).toMap
      val got = HyperBall.harmonicCentralities(df, maxHops = 3, m = 64)
        .collect().map(r => (r.getString(0), r.getDouble(1))).toMap
      got.keySet shouldBe expected.keySet
      for ((id, v) <- got) v shouldBe expected(id) +- 1e-9
    }

    it("estimateCol on packed registers equals the sparse-table " +
        "estimator to 1e-9 on a seeded random graph") {
      import spark.implicits._
      import org.apache.spark.sql.functions.col
      val rnd = new scala.util.Random(91)
      val edges = (1 to 60).map(_ =>
        (s"n${rnd.nextInt(20)}", s"n${rnd.nextInt(20)}"))
      val df = edges.toDF("src", "dst")
      // sparse lane: explode-format registers -> grouped estimator
      val sparse = HyperBall.estimates(
          HyperBall.ballRegisters(df, 2, 64), 64)
        .collect().map(r => (r.getString(0), r.getDouble(1))).toMap
      // packed lane: rebuild the packed vectors from the sparse rows
      // (array fill), then the per-row expression
      val packed = HyperBall.ballRegisters(df, 2, 64)
        .groupBy(col("id"))
        .agg(org.apache.spark.sql.functions.map_from_arrays(
          org.apache.spark.sql.functions.collect_list(col("bucket")),
          org.apache.spark.sql.functions.collect_list(col("max_rho")))
          .as("mm"))
        .select(col("id"), org.apache.spark.sql.functions.transform(
          org.apache.spark.sql.functions.sequence(
            org.apache.spark.sql.functions.lit(0),
            org.apache.spark.sql.functions.lit(63)),
          i => org.apache.spark.sql.functions.coalesce(
            org.apache.spark.sql.functions.element_at(
              col("mm"), i.cast("long")),
            org.apache.spark.sql.functions.lit(0L)).cast("byte"))
          .as("regs"))
        .select(col("id"), HyperBall.estimateCol(col("regs"), 64).as("est"))
        .collect().map(r => (r.getString(0), r.getDouble(1))).toMap
      packed.keySet shouldBe sparse.keySet
      for ((id, v) <- packed) v shouldBe sparse(id) +- 1e-9
    }

    it("effectiveDiameter finds the quantile hop on a path graph") {
      import spark.implicits._
      // a -> b -> c -> d: pairs-within-t totals are 4, 7, 9, 10;
      // q=0.8 targets 8, first reached at t=2 (margin 1 on each side
      // covers the small-range HLL error)
      val path = Seq(("a", "b"), ("b", "c"), ("c", "d"))
      HyperBall.effectiveDiameter(path.toDF("src", "dst"),
        maxHops = 3, q = 0.8, m = 64) shouldBe 2
      // the full quantile is the true diameter
      HyperBall.effectiveDiameter(path.toDF("src", "dst"),
        maxHops = 5, q = 1.0, m = 64) shouldBe 3
    }

    it("closenessCentralities gives an out-star hub ~1.0 and leaves 0") {
      import spark.implicits._
      val star = (1 to 10).map(i => ("hub", s"leaf$i"))
      val c = HyperBall.closenessCentralities(star.toDF("src", "dst"),
          maxHops = 2, m = 64)
        .collect().map(r => (r.getString(0), r.getDouble(1))).toMap
      // exact: 10 reachable, all at distance 1 -> closeness 1.0
      c("hub") shouldBe 1.0 +- 0.15
      c("leaf7") shouldBe 0.0 // reaches nothing: exactly 0
    }

    it("effectiveDiameter survives a checkpointed seed joined under " +
        "sort-merge (the InferFiltersFromConstraints lambda regression)") {
      // The round-14 graph probe crashed here: effectiveDiameter cuts
      // the SEED frame, and the first hop's rename+equi-join then hit
      // [INTERNAL_ERROR_ATTRIBUTE_NOT_FOUND] — localCheckpoint keeps
      // alias constraints (LogicalRDD.originConstraints), and a
      // LambdaFunction inside one made constraint inference emit a
      // filter referencing the other join side. Long ids + forced SMJ
      // reproduce the probe's plan shape; seedRegs/estimateCol are
      // lambda-free now, so this must run clean.
      import spark.implicits._
      val rnd = new scala.util.Random(7)
      val edges = (1 to 2000).map(_ =>
        (rnd.nextInt(300).toLong, rnd.nextInt(300).toLong))
      val key = "spark.sql.autoBroadcastJoinThreshold"
      val prev = spark.conf.get(key)
      try {
        spark.conf.set(key, "-1")
        val d = HyperBall.effectiveDiameter(
          edges.toDF("src", "dst"), maxHops = 3, m = 64)
        d should (be >= 1 and be <= 3)
      } finally spark.conf.set(key, prev)
    }

    it("run-to-stability stops at the register fixed point and equals " +
        "the fixed-horizon run (r16: the HyperANF stop rule)") {
      import spark.implicits._
      // path a->b->c->d: registers stabilize after hop 3 (the true
      // diameter); the stability run under a generous cap must return
      // exactly what a sufficient fixed run returns, for every q
      val path = Seq(("a", "b"), ("b", "c"), ("c", "d"))
      for (q <- Seq(0.8, 0.9, 1.0))
        HyperBall.effectiveDiameter(path.toDF("src", "dst"),
          maxHops = 32, q = q, m = 64, toStability = true) shouldBe
          HyperBall.effectiveDiameter(path.toDF("src", "dst"),
            maxHops = 5, q = q, m = 64)
      // random digraph: stability ≡ fixed horizon (cap ample for both)
      val rnd = new scala.util.Random(11)
      val edges = (1 to 600).map(_ =>
        (rnd.nextInt(120).toString, rnd.nextInt(120).toString))
      HyperBall.effectiveDiameter(edges.toDF("src", "dst"),
        maxHops = 32, m = 64, toStability = true) shouldBe
        HyperBall.effectiveDiameter(edges.toDF("src", "dst"),
          maxHops = 20, m = 64)
      // a cap SMALLER than the diameter still respects the cap
      HyperBall.effectiveDiameter(path.toDF("src", "dst"),
        maxHops = 1, q = 1.0, m = 64, toStability = true) shouldBe 1
    }

    it("effectiveDiameter is 0 on an empty / self-loop-only edge frame") {
      import spark.implicits._
      HyperBall.effectiveDiameter(
        Seq.empty[(String, String)].toDF("src", "dst"),
        maxHops = 2, m = 64) shouldBe 0
      HyperBall.effectiveDiameter(Seq(("a", "a")).toDF("src", "dst"),
        maxHops = 2, m = 64) shouldBe 0
    }
  }
}
