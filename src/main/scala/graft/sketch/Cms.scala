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
    * there. Row d's hash salts the key with `d#`. */
  def registers(df: DataFrame, key: Column, depth: Int = 4,
      width: Int = 512): DataFrame = {
    require(depth >= 1 && width >= 2, s"bad sketch geometry $depth x $width")
    val d = explode(sequence(lit(0), lit(depth - 1)))
    df.select(key.cast("string").as("k"))
      .select(col("k"), d.as("depth"))
      .select(col("depth"),
        pmod(conv(substring(md5(
          concat(col("depth").cast("string"), lit("#"), col("k"))), 1, 8),
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
    // A depth whose slot sets do not overlap has dot product ZERO —
    // it must enter the min as 0, not vanish from it (disjoint key
    // sets would otherwise report the min of the OTHER depths, or an
    // empty frame's NULL). Depths come from EITHER side (an empty A
    // must not empty the depth domain), and the final coalesce covers
    // both sides empty: no data ⇒ estimate 0, never NULL.
    val depths = a.select(col("depth"))
      .unionByName(b.select(col("depth"))).distinct()
    val dots = a.join(b, Seq("depth", "slot"))
      .groupBy(col("depth"))
      .agg(sum(col("ca").cast("decimal(38,0)") *
        col("cb").cast("decimal(38,0)")).as("dot"))
    depths.join(dots, Seq("depth"), "left")
      .agg(coalesce(
        min(coalesce(col("dot"), lit(0).cast("decimal(38,0)"))),
        lit(0).cast("decimal(38,0)"))
        .cast("decimal(38,0)").as("join_size_est"))
  }

  /** Frequency point-estimates for `keys` against a [[registers]]
    * frame: min over depths of the key's slot count. Returns
    * (key, est). Estimates never undercount the true frequency. */
  def estimate(registers: DataFrame, keys: DataFrame, keyCol: String,
      depth: Int = 4, width: Int = 512): DataFrame = {
    val probes = keys
      .select(col(keyCol).cast("string").as("k"))
      .select(col("k"), explode(sequence(lit(0), lit(depth - 1))).as("depth"))
      .select(col("k"), col("depth"),
        pmod(conv(substring(md5(
          concat(col("depth").cast("string"), lit("#"), col("k"))), 1, 8),
          16, 10).cast("long"), lit(width.toLong)).as("slot"))
    probes.join(registers, Seq("depth", "slot"), "left")
      .groupBy(col("k"))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))
  }
}
