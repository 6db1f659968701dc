package graft.sketch

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-min sketch (Cormode & Muthukrishnan 2005) over a key stream,
  * as pure column expressions with md5-derived row hashes — the
  * heavy-hitters / frequency-estimate companion to [[Hll]].
  *
  * The register table (depth, slot) → count is integer-exact and
  * MERGEABLE: sketches of disjoint shards combine by element-wise SUM,
  * which is exactly Spark's partial-aggregating groupBy — so a 100 TB
  * stream sketches in one pass, one (depth×width)-bounded shuffle.
  * Point estimates ([[estimate]]) take the min across depths and are
  * spec-checked against exact frequencies (always an overcount, within
  * εN with probability 1−δ; ε = e/width, δ = e^−depth).
  */
object Cms {

  /** Register table for the stream of `key` values: one row per
    * non-empty (depth, slot), `cnt` = number of stream elements hashing
    * there. Row d's 32-bit hash is the d-th disjoint 8-hex-char window
    * of ONE md5(key) digest (32 hex chars = 4 windows): one hash
    * invocation per stream element instead of `depth` — md5 dominated
    * the register build 4:1 when each depth salted its own digest
    * (r12 finding: q213's register stage was ~3 s/side at sf0.1). */
  def registers(df: DataFrame, key: Column, depth: Int = 4,
      width: Int = 512): DataFrame = {
    require(depth >= 1 && width >= 2, s"bad sketch geometry $depth x $width")
    require(depth <= 4, s"depth=$depth > 4: one md5 digest carries four " +
      "independent 32-bit windows")
    df.select(key.cast("string").as("k"))
      .select(md5(col("k")).as("h"))
      .select(explode(sequence(lit(0), lit(depth - 1))).as("depth"),
        col("h"))
      .select(col("depth"),
        pmod(conv(col("h").substr(col("depth") * 8 + 1, lit(8)),
          16, 10).cast("long"), lit(width.toLong)).as("slot"))
      .groupBy(col("depth"), col("slot"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Equi-join CARDINALITY estimate from two register tables built with
    * the SAME geometry over the two sides' join keys — the classic CMS
    * inner-product estimator (Cormode & Muthukrishnan 2005 §4.2):
    * |A ⋈ B| = Σ_k f_A(k)·f_B(k), estimated per depth as the dot
    * product of that depth's rows and taken as the MIN across depths
    * (each row only ever overcounts). One (depth, slot) equi-join over
    * two (depth×width)-bounded frames — the "will this join blow up"
    * planner probe answered without touching either 100 TB side again.
    * Returns one row: (join_size_est). Exact integers end to end;
    * per-depth dot products are DECIMAL(38,0) sums of long×long
    * products so 2⁶³-adjacent counts cannot wrap. */
  def joinSizeEstimate(regsA: DataFrame, regsB: DataFrame): DataFrame = {
    val a = regsA.select(col("depth"), col("slot"), col("cnt").as("ca"))
    val b = regsB.select(col("depth"), col("slot"), col("cnt").as("cb"))
    // A depth whose slot sets do not overlap has dot product ZERO — it
    // must enter the min as 0, not vanish from it. Stated as ONE LEFT
    // join from A to the broadcast B table: [[registers]] emits EVERY
    // depth for any non-empty input, so each A depth is present and an
    // unmatched slot contributes ca·0 — no second consumption of
    // either register plan (the r11 union-of-depths form re-ran each
    // side's full scan-hash-aggregate just to list depths), no shuffle
    // (B is ≤ depth×width rows). Empty A ⇒ empty aggregate ⇒ the outer
    // coalesce reports 0; empty B ⇒ all-null cb ⇒ every dot is 0.
    a.join(broadcast(b), Seq("depth", "slot"), "left")
      .groupBy(col("depth"))
      .agg(sum(col("ca").cast("decimal(38,0)") *
        coalesce(col("cb"), lit(0L)).cast("decimal(38,0)")).as("dot"))
      .agg(coalesce(min(col("dot")), lit(0).cast("decimal(38,0)"))
        .cast("decimal(38,0)").as("join_size_est"))
  }

  /** Frequency point-estimates for `keys` against a [[registers]]
    * frame: min over depths of the key's slot count. Returns
    * (key, est). Estimates never undercount the true frequency. */
  def estimate(registers: DataFrame, keys: DataFrame, keyCol: String,
      depth: Int = 4, width: Int = 512): DataFrame = {
    val probes = keys
      .select(col(keyCol).cast("string").as("k"))
      .select(col("k"), md5(col("k")).as("h"))
      .select(col("k"),
        explode(sequence(lit(0), lit(depth - 1))).as("depth"), col("h"))
      .select(col("k"), col("depth"),
        pmod(conv(col("h").substr(col("depth") * 8 + 1, lit(8)),
          16, 10).cast("long"), lit(width.toLong)).as("slot"))
    probes.join(registers, Seq("depth", "slot"), "left")
      .groupBy(col("k"))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))
  }
}
