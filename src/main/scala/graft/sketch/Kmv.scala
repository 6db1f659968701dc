package graft.sketch

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.time.Buckets.intDiv

/** KMV (k-minimum-values) distinct-value sketch — the theta-sketch
  * family's deterministic core (Bar-Yossef et al. 2002; Beyer et al.
  * 2007 "On Synopses for Distinct-Value Estimation"). Where [[Hll]]
  * estimates |A| and unions, KMV registers ALSO support set
  * INTERSECTION and difference estimates (Dasgupta et al. 2016, the
  * DataSketches theta algebra), which HLL registers cannot — the
  * cross-source overlap question ("how much of source A is inside
  * source B?") answered without an exact distinct join.
  *
  * Register = the k smallest distinct 60-bit md5-derived hash values
  * per group. Integer-exact and deterministic (same data ⇒ same
  * registers on any partitioning), and MERGEABLE: registers of a
  * union = re-take-k of the unioned registers, so shard sketches
  * combine associatively — the one-pass 100 TB shape. Estimation
  * consumers ([[distinctEstimates]]) are FP and spec-checked; the
  * register and overlap tables are hash-oracle material.
  */
object Kmv {

  /** 60-bit nonnegative hash of a key (15 md5 hex chars — the repo's
    * simhash convention, stated identically in SQL oracles). */
  def hash60(c: Column): Column =
    conv(substring(md5(c.cast("string")), 1, 15), 16, 10).cast("long")

  /** Register table: per group, the k smallest DISTINCT hash values of
    * `key` — (groupCols..., rk, h), rk ∈ [1, k]. One distinct + one
    * group-partitioned top-k (WindowGroupLimit pushes the limit into
    * the sort, so no group ever materializes more than k rows per
    * task). */
  def registers(df: DataFrame, groupCols: Seq[String], key: Column,
      k: Int): DataFrame = {
    require(k >= 2, s"bad k=$k")
    val g = groupCols.map(col)
    val w = Window.partitionBy(g: _*).orderBy(col("h"))
    // NULL keys hash to NULL — drop them explicitly (a null register
    // would also sort differently across engines: Spark nulls-first,
    // SQL oracles nulls-last).
    df.select(g :+ hash60(key).as("h"): _*)
      .filter(col("h").isNotNull).distinct()
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
  }

  /** Merge shard register tables back to one sketch per group: union
    * then re-take-k. `registers(A ∪ B) ≡ merge(registers(A),
    * registers(B))` — the mergeability law (spec-pinned). */
  def merge(regs: DataFrame, groupCols: Seq[String], k: Int): DataFrame = {
    val g = groupCols.map(col)
    val w = Window.partitionBy(g: _*).orderBy(col("h"))
    regs.select(g :+ col("h"): _*).distinct()
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
  }

  /** Distinct-count estimates from a register table: (groupCols...,
    * n_reg, kth_hash, est_distinct). A group with fewer than k
    * registers is EXACT (est = n_reg); at k registers the classic
    * unbiased estimator `(k − 1) / kth-normalized-hash` applies.
    * `est_distinct` is DOUBLE — an estimation consumer, spec-checked
    * against exact counts, deliberately not hash-gate material. */
  def distinctEstimates(regs: DataFrame, groupCols: Seq[String],
      k: Int): DataFrame = {
    val g = groupCols.map(col)
    val space = math.pow(2.0, 60)
    regs.groupBy(g: _*)
      .agg(count(lit(1)).as("n_reg"), max(col("h")).as("kth_hash"))
      .select(g ++ Seq(col("n_reg"), col("kth_hash"),
        when(col("n_reg") < k, col("n_reg").cast("double"))
          .otherwise(lit((k - 1).toDouble) * space /
            col("kth_hash").cast("double"))
          .as("est_distinct")): _*)
  }

  /** Pairwise overlap of groups' sketches: for every group pair
    * (ga < gb), restrict the unioned registers to the union sketch's
    * own k smallest, and count how those hashes distribute —
    * (ga, gb, n_union_k, n_shared, n_only_a, n_only_b, jaccard_ppm).
    * n_shared / n_union_k is the standard KMV Jaccard estimator, and
    * n_only_a / n_union_k the set-DIFFERENCE fraction (the theta
    * algebra's A∖B — what HLL registers cannot answer); all counts are
    * exact integers over the register table.
    *
    * Scale: this runs on the REGISTER table (≤ |groups|·k rows — the
    * 100 TB corpus entered once, in [[registers]]); the pair expansion
    * is |groups|²·k sketch rows, an audit-sized frame by construction
    * (document sources, shards, snapshot names — not raw keys). */
  def pairwiseOverlap(regs: DataFrame, groupCol: String,
      k: Int): DataFrame = {
    // The register plan (token explode → distinct → top-k window) is
    // referenced from FIVE branches below (groups twice via pairs,
    // both join sides, and the merge); materialize it once — it is
    // ≤ |groups|·k rows by construction, the cheapest possible cut.
    // A NULL group value carries no identity for an overlap audit and
    // the ga < gb pairing would silently drop it (NULL comparisons):
    // exclude it EXPLICITLY — callers who care filter/label upstream.
    val r = graft.util.Checkpoints.materialize(
      regs.select(col(groupCol).as("g"), col("h"))
        .filter(col("g").isNotNull))
    val groups = r.select(col("g")).distinct()
    val pairs = groups.select(col("g").as("ga"))
      .crossJoin(groups.select(col("g").as("gb")))
      .filter(col("ga") < col("gb"))
    val fromA = pairs.join(r, col("g") === col("ga"))
      .select(col("ga"), col("gb"), col("h"), lit(1L).as("in_a"),
        lit(0L).as("in_b"))
    val fromB = pairs.join(r, col("g") === col("gb"))
      .select(col("ga"), col("gb"), col("h"), lit(0L).as("in_a"),
        lit(1L).as("in_b"))
    val merged = fromA.unionByName(fromB)
      .groupBy(col("ga"), col("gb"), col("h"))
      .agg(max(col("in_a")).as("in_a"), max(col("in_b")).as("in_b"))
    val w = Window.partitionBy(col("ga"), col("gb")).orderBy(col("h"))
    merged.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .groupBy(col("ga"), col("gb"))
      .agg(count(lit(1)).as("n_union_k"),
        sum(col("in_a") * col("in_b")).as("n_shared"),
        sum(col("in_a") * (lit(1L) - col("in_b"))).as("n_only_a"),
        sum(col("in_b") * (lit(1L) - col("in_a"))).as("n_only_b"))
      .select(col("ga"), col("gb"), col("n_union_k"), col("n_shared"),
        col("n_only_a"), col("n_only_b"),
        intDiv(col("n_shared") * 1000000L, col("n_union_k"))
          .as("jaccard_ppm"))
  }
}
