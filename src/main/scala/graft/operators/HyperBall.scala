package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.sketch.Hll

/** HyperBall (Boldi & Vigna, 2013): the approximate neighborhood
  * function — per node, an [[graft.sketch.Hll]] sketch of its
  * out-ball of radius t — computed by iterated register max-merge
  * along edges. This is the ONLY way centralities (harmonic,
  * closeness) are computable on a web-scale graph: exact per-node
  * BFS is O(n·m), while each HyperBall hop is one shuffle over
  * (node, bucket) rows — n·m_regs state, the same mergeable-integer-
  * register discipline as the q63 HLL gate, so shards combine by
  * groupBy max and the register table is hash-exact and
  * engine-independent.
  *
  * Recurrence: `B(v, 0) = {v}`;
  * `B(v, t) = B(v, t-1) ∪ union of B(u, t-1) over edges v -> u`,
  * each ball carried as its sparse HLL register table and the union
  * as element-wise max. The floating-point size estimates and the
  * derived harmonic centrality are consumer-side ([[estimates]],
  * [[harmonicCentralities]]) and spec-checked against exact BFS —
  * the gate checks the integer registers.
  *
  * Scale posture: per hop, ONE equi-join of the edge list against the
  * register table (shuffle on the join key) + one (id, bucket)-keyed
  * hash aggregation with map-side partials; register rows per node
  * are bounded by min(m, |ball|), so state is at most n·m rows. The
  * deduped edge list persists across hops; runs of at most
  * [[PageRank.CutEvery]] hops stay fully lazy (the small-graph fast
  * path — regs feeds both the neighbor join and the union, and
  * ReuseExchange dedupes the doubled subtrees inside one action),
  * longer runs cut the register frame EVERY hop (interior laziness
  * re-executes the multiplied plan — PageRank's lineage-policy
  * scaladoc; the round-14 probe measured the segment policy at
  * 48.6 s for 4 hops on the 1M-edge graph). `checkpointDir` switches
  * the cuts to reliable checkpoints for preemptible clusters.
  */
object HyperBall {

  /** Longest hop run that stays fully lazy. TWO, not PageRank's four:
    * every per-hop estimate frame re-shuffles the register recurrence
    * up to its hop (the (id, bucket) hop partitioning cannot serve the
    * (id)-keyed estimate aggregation), so interior laziness multiplies
    * real register shuffles per hop — the round-14 probe measured the
    * lazy policy at 48.6 s for harmonicCentralities(maxHops = 4) on
    * the 1M-edge graph. The q176 gate (hops = 2) keeps the lazy fast
    * path. */
  val LazyHops = 2

  /** Deduped, self-loop-free edge list + its endpoint set. */
  private def prep(edges: DataFrame): (DataFrame, DataFrame) = {
    val e = edges.select(col("src"), col("dst"))
      .filter(col("src") =!= col("dst"))
      .distinct()
    val nodes = e.select(col("src").as("id"))
      .unionByName(e.select(col("dst").as("id")))
      .distinct()
    (e, nodes)
  }

  /** Each node's singleton sketch — hop-0 registers. */
  private def seedRegs(nodes: DataFrame, m: Int): DataFrame = {
    val (bucket, rho) = Hll.bucketRho(col("id").cast("string"), m)
    nodes.select(col("id"), bucket.as("bucket"), rho.as("max_rho"))
  }

  /** One max-merge round: every node absorbs its out-neighbors'
    * registers. The single place the recurrence lives — the q176 gate
    * and the FP consumers all run THIS step. */
  private def hop(e: DataFrame, regs: DataFrame): DataFrame = {
    val fromNbrs = e.join(regs.withColumnRenamed("id", "dst"),
        Seq("dst"))
      .select(col("src").as("id"), col("bucket"), col("max_rho"))
    regs.unionByName(fromNbrs)
      .groupBy(col("id"), col("bucket"))
      .agg(max(col("max_rho")).as("max_rho"))
  }

  /** Sparse per-node ball registers (id, bucket, max_rho) after
    * `hops` max-merge rounds over a directed edge frame (`src`,
    * `dst`). Self-loops drop, duplicate edges are harmless (max is
    * idempotent) but deduped anyway to shrink the join's left side.
    * Every endpoint appears (its own singleton sketch at minimum).
    * Lineage policy: runs of at most [[LazyHops]] hops stay
    * fully lazy; longer runs persist the edge list and cut every hop
    * (the final hop's cut leaves the result self-contained). */
  def ballRegisters(edges: DataFrame, hops: Int = 2,
      m: Int = 64, checkpointDir: Option[String] = None): DataFrame = {
    import graft.util.Checkpoints.cut
    require(hops >= 0, s"hops must be >= 0, got $hops")
    val doCut = hops > LazyHops
    val (e0, nodes) = prep(edges)
    val e = if (doCut) e0.persist() else e0
    try {
      var regs = seedRegs(nodes, m)
      for (_ <- 1 to hops) {
        regs = hop(e, regs)
        // regs feeds both the neighbor join and the union, so interior
        // laziness multiplies the plan 2x per hop — cut-engaged runs
        // cut every hop (PageRank's lineage-policy scaladoc)
        if (doCut) regs = cut(regs, checkpointDir)
      }
      regs
    } finally if (doCut) e.unpersist()
  }

  /** Per-node HLL size estimate from a [[ballRegisters]] frame — the
    * standard estimator with linear-counting small-range correction,
    * as ONE grouped aggregation (no driver collect; the FP math is
    * per-group scalar arithmetic on two integer sums). */
  def estimates(regs: DataFrame, m: Int = 64): DataFrame = {
    val alpha =
      if (m == 16) 0.673 else if (m == 32) 0.697
      else if (m == 64) 0.709 else 0.7213 / (1.0 + 1.079 / m)
    val agg = regs.groupBy(col("id"))
      .agg(count(lit(1)).as("hit"),
        sum(pow(lit(2.0), -col("max_rho"))).as("s"))
    agg.select(col("id"),
      {
        val zeros = lit(m.toDouble) - col("hit")
        val raw = lit(alpha * m * m) / (col("s") + zeros)
        when(raw <= lit(2.5 * m) && zeros > 0,
          lit(m.toDouble) * log(lit(m.toDouble) / zeros))
          .otherwise(raw).as("est")
      })
  }

  /** Runs the hop recurrence once, hands `finish` the per-hop
    * estimate frames (est_0 .. est_maxHops, each (id, est_t)), and
    * applies the segment lineage policy around whatever single frame
    * it builds — the shared engine under [[harmonicCentralities]] and
    * [[closenessCentralities]]. Short runs (maxHops at most
    * [[LazyHops]]) stay fully lazy; longer runs persist the
    * edge list, cut registers each hop, and finish with ONE job
    * that materializes every per-hop estimate while the edge cache is
    * live, so the returned frame is self-contained. */
  private def withPerHopEstimates(edges: DataFrame, maxHops: Int,
      m: Int, checkpointDir: Option[String])(
      finish: Vector[DataFrame] => DataFrame): DataFrame = {
    import graft.util.Checkpoints.cut
    require(maxHops >= 1, s"maxHops must be >= 1, got $maxHops")
    val doCut = maxHops > LazyHops
    val (e0, nodes) = prep(edges)
    val e = if (doCut) e0.persist() else e0
    try {
      var regs = seedRegs(nodes, m)
      var perHop = Vector(estimates(regs, m)
        .withColumnRenamed("est", "est_0"))
      for (t <- 1 to maxHops) {
        regs = hop(e, regs)
        if (doCut) regs = cut(regs, checkpointDir)
        perHop = perHop :+ estimates(regs, m)
          .withColumnRenamed("est", s"est_$t")
      }
      val out0 = finish(perHop)
      if (doCut) cut(out0, checkpointDir) else out0
    } finally if (doCut) e.unpersist()
  }

  /** Approximate harmonic centrality H(v) = Σ_{u≠v} 1/d(v,u) over out-
    * distances, truncated at `maxHops`:
    * `H(v) ≈ Σ_t (N̂(v,t) − N̂(v,t−1)) / t` with N̂ the per-hop HLL
    * estimates; hop frames join back on id — maxHops is small by
    * construction (the effective diameter). FP output; rankings are
    * what it's for. Lineage policy = [[withPerHopEstimates]]. */
  def harmonicCentralities(edges: DataFrame, maxHops: Int = 4,
      m: Int = 64, checkpointDir: Option[String] = None): DataFrame =
    withPerHopEstimates(edges, maxHops, m, checkpointDir) { perHop =>
      val joined = perHop.reduce(_.join(_, Seq("id")))
      val h = (1 to maxHops).map(t =>
        greatest(col(s"est_$t") - col(s"est_${t - 1}"), lit(0.0)) / t)
        .reduce(_ + _)
      joined.select(col("id"), h.as("harmonic"))
    }

  /** Approximate closeness centrality on the reachable set (Lin's
    * formulation, the one that stays meaningful on disconnected
    * directed graphs): `C(v) = (r(v) - 1) / totdist(v)` with `r` the
    * ball size at `maxHops` and `totdist = Σ_t t·Δ_t` the estimated
    * sum of out-distances. 1.0 = everything reachable is adjacent;
    * 0 for nodes that reach nothing. Same engine and lineage policy
    * as [[harmonicCentralities]]. */
  def closenessCentralities(edges: DataFrame, maxHops: Int = 4,
      m: Int = 64, checkpointDir: Option[String] = None): DataFrame =
    withPerHopEstimates(edges, maxHops, m, checkpointDir) { perHop =>
      val joined = perHop.reduce(_.join(_, Seq("id")))
      val totDist = (1 to maxHops).map(t =>
        greatest(col(s"est_$t") - col(s"est_${t - 1}"), lit(0.0)) * t)
        .reduce(_ + _)
      val reach = greatest(col(s"est_$maxHops") - lit(1.0), lit(0.0))
      joined.select(col("id"),
        when(totDist > 0, reach / totDist).otherwise(lit(0.0))
          .as("closeness"))
    }

  /** Effective diameter at quantile `q` (HyperANF's headline number):
    * the smallest hop count t such that the estimated number of
    * reachable pairs within t is >= q * (pairs reachable within
    * `maxHops`). Runs the register recurrence once; each hop
    * contributes ONE scalar (the global sum of per-node ball
    * estimates), so the driver holds maxHops+1 doubles — never node
    * data. Returns maxHops if the quantile isn't reached (graph wider
    * than the horizon); 0 for an empty/self-loop-only edge frame. */
  def effectiveDiameter(edges: DataFrame, maxHops: Int = 8,
      q: Double = 0.9, m: Int = 64,
      checkpointDir: Option[String] = None): Int = {
    import graft.util.Checkpoints.cut
    require(maxHops >= 1, s"maxHops must be >= 1, got $maxHops")
    require(q > 0 && q <= 1, s"q must be in (0, 1], got $q")
    val (e0, nodes) = prep(edges)
    val e = e0.persist()
    val ts = try {
      // Per-hop cut here (not the segment policy): an ACTION runs
      // every hop, and cross-job plans don't share shuffles — uncut,
      // hop t's total() would re-execute all t-1 previous rounds.
      var regs = cut(seedRegs(nodes, m), checkpointDir)
      def total(): Double = estimates(regs, m)
        .agg(coalesce(sum(col("est")), lit(0.0)))
        .collect()(0).getDouble(0) // 1 scalar; 0.0 on an empty graph
      val totals = Array.newBuilder[Double]
      totals += total()
      for (_ <- 1 to maxHops) {
        regs = cut(hop(e, regs), checkpointDir)
        totals += total()
      }
      totals.result()
    } finally e.unpersist()
    val target = q * ts.last
    ts.indexWhere(_ >= target) match {
      case -1 => maxHops
      case t => t
    }
  }
}
