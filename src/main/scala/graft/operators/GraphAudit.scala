package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Structural link-graph health audit — the two cheapest global
  * signals that separate an organic web graph from a manufactured
  * one, as ONE pass over the edge list:
  *
  *  - **reciprocity**: the fraction of directed edges whose reverse
  *    also exists. Organic link graphs sit well below 1; a link ring
  *    or mutual-exchange scheme pushes it toward 1.
  *  - **out-in degree assortativity** (Newman 2002): the Pearson
  *    correlation of (outdeg(src), indeg(dst)) across edges. Spam
  *    farms are strongly disassortative (many low-out pages all
  *    pointing at one target); organic webs sit near 0.
  *
  * Following the regression-components discipline (q87), the output
  * is the INTEGER sufficient statistics — n_edges, n_reciprocal and
  * the five assortativity sums — so the row is hash-exact and
  * mergeable across shards; the caller derives the two FP ratios:
  * {{{
  *   reciprocity = n_reciprocal / n_edges
  *   r = (n·Σxy − Σx·Σy) /
  *       sqrt(n·Σxx − (Σx)²) / sqrt(n·Σyy − (Σy)²)
  * }}}
  *
  * Scale posture: edge dedup, two degree aggregations, two key-joins
  * to annotate edges, one semi-join for reciprocity, one global sum —
  * every shuffle on an edge-endpoint key with map-side partials.
  * Long-range bound: the degree-product sums must stay below 2⁶³,
  * which holds whenever maxdeg² · |E| < 2⁶³ — GUARDED in-plan
  * (`assert_true` over a decimal-checked 1×1 scalar, the
  * decayedCounts discipline), so a graph past the bound fails loudly
  * instead of wrapping silently; shard + merge the sufficient rows in
  * that regime.
  */
object GraphAudit {

  /** One row: (n_edges, n_reciprocal, sum_x, sum_y, sum_xy, sum_xx,
    * sum_yy) over the deduped, self-loop-free edge list, with
    * x = outdeg(src) and y = indeg(dst) per edge. */
  def linkGraphAudit(edges: DataFrame): DataFrame = {
    val e = edges.select(col("src"), col("dst"))
      .filter(col("src") =!= col("dst"))
      .distinct()
    val outdeg = e.groupBy(col("src")).agg(count(lit(1)).as("x"))
    val indeg = e.groupBy(col("dst")).agg(count(lit(1)).as("y"))
    val annotated = e.join(outdeg, Seq("src")).join(indeg, Seq("dst"))
    val recip = e.join(
        e.select(col("dst").as("src"), col("src").as("dst")),
        Seq("src", "dst"), "left_semi")
      .agg(count(lit(1)).as("n_reciprocal")) // 1x1
    // In-plan overflow guard (the decayedCounts discipline): the sums
    // are bounded by |E| * maxdeg² — check it in DECIMAL(38,0) so the
    // check itself cannot wrap (a decimal overflow NULLs the condition
    // and assert_true raises, which is also the correct outcome: a
    // bound past 10^38 is certainly past 2^63). One 1x1 scalar.
    val dLong = lit(Long.MaxValue).cast("decimal(38,0)")
    def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
    val guard = outdeg.agg(coalesce(max(col("x")), lit(0L)).as("mx"))
      .crossJoin(indeg.agg(coalesce(max(col("y")), lit(0L)).as("my")))
      .crossJoin(e.agg(count(lit(1)).as("ec")))
      .select(when(assert_true(
        dec(col("mx")) * col("mx") * col("ec") <= dLong &&
          dec(col("my")) * col("my") * col("ec") <= dLong &&
          dec(col("mx")) * col("my") * col("ec") <= dLong,
        lit("GraphAudit: assortativity sums would exceed Long range " +
          "— shard the edge set and merge the sufficient rows"))
        .isNull, lit(1L)).as("ok")) // 1x1
    annotated.agg(
        count(lit(1)).as("n_edges"),
        sum(col("x")).as("sum_x"),
        sum(col("y")).as("sum_y"),
        sum(col("x") * col("y")).as("sum_xy"),
        sum(col("x") * col("x")).as("sum_xx"),
        sum(col("y") * col("y")).as("sum_yy"))
      .crossJoin(broadcast(recip))
      .crossJoin(broadcast(guard))
      .select((col("n_edges") * col("ok")).as("n_edges"),
        col("n_reciprocal"), col("sum_x"),
        col("sum_y"), col("sum_xy"), col("sum_xx"), col("sum_yy"))
  }

  /** Log₂-bucketed degree distribution of the directed link graph —
    * the power-law / hub-structure audit read before sizing any
    * neighborhood join (a missing heavy tail means the wedge bounds
    * Σdeg² are loose; a fat one means cap or salt first).
    *
    * One row per (direction, bucket): direction ∈ {out, in}, bucket =
    * number of binary digits of the degree (⌊log₂ d⌋ + 1 — `bin()`
    * exists identically in Spark and DuckDB, so the bucket maths is
    * stated verbatim by the oracle), with node count and the exact
    * min/max degree inside the bucket. Scale: two degree aggregations
    * (map-side partials absorb power-law fan-in) + one 2·buckets-row
    * aggregate — nothing driver-side, no windows. */
  def degreeHistogram(edges: DataFrame): DataFrame = {
    val e = edges.select(col("src"), col("dst"))
      .filter(col("src") =!= col("dst"))
      .distinct()
    def side(key: String, name: String) = e.groupBy(col(key))
      .agg(count(lit(1)).as("degree"))
      .select(lit(name).as("direction"),
        length(bin(col("degree"))).cast("long").as("bucket"),
        col("degree"))
    side("src", "out").unionByName(side("dst", "in"))
      .groupBy(col("direction"), col("bucket"))
      .agg(count(lit(1)).as("n_nodes"),
        min(col("degree")).as("min_degree"),
        max(col("degree")).as("max_degree"))
  }

  /** The two FP ratios off a [[linkGraphAudit]] row — driver-side
    * convenience over the single-row frame. Returns (reciprocity,
    * assortativity); assortativity is None when a variance is zero
    * (regular graphs have no defined correlation). */
  def ratios(audit: DataFrame): (Double, Option[Double]) = {
    val r = audit.collect()(0)
    val n = r.getLong(0).toDouble
    if (n == 0) return (0.0, None)
    val recip = r.getLong(1) / n
    val (sx, sy, sxy, sxx, syy) = (r.getLong(2).toDouble,
      r.getLong(3).toDouble, r.getLong(4).toDouble,
      r.getLong(5).toDouble, r.getLong(6).toDouble)
    val vx = n * sxx - sx * sx
    val vy = n * syy - sy * sy
    val assort =
      if (vx <= 0 || vy <= 0) None
      else Some((n * sxy - sx * sy) / math.sqrt(vx) / math.sqrt(vy))
    (recip, assort)
  }
}
