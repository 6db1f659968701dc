package graft.sketch

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bloom filter (Bloom 1970) over a key stream, as pure column
  * expressions with md5-derived double hashing — the set-membership
  * companion to [[Hll]] (distinct count) and [[Cms]] (frequency).
  *
  * The register table (the set of SET BIT positions) is integer-exact
  * and MERGEABLE: filters of disjoint shards combine by union-distinct,
  * which is bitwise OR stated relationally — so a 100 TB build is one
  * pass and one m-bounded shuffle, the same partial-aggregating shape
  * as any Spark distinct. Membership is exact-negative / probabilistic-
  * positive; the classic 100 TB use is [[prefilterJoin]]: prune a huge
  * probe side down to rows that MIGHT match a small build side before
  * the real join ships any data.
  *
  * Hash layout (Kirsch & Mitzenmacher 2006 double hashing): two 32-bit
  * halves of md5(key), position_i = (h1 + i·h2) mod m for i < k. All
  * arithmetic stays in nonnegative longs, so Spark and any SQL oracle
  * agree bit-for-bit.
  */
object Bloom {

  private def h32(c: Column, off: Int): Column =
    conv(substring(md5(c.cast("string")), 1 + off, 8), 16, 10).cast("long")

  /** The k bit positions of one key as an array column. */
  def positions(key: Column, m: Int, k: Int): Column = {
    require(m >= 2 && k >= 1, s"bad filter geometry m=$m k=$k")
    val h1 = h32(key, 0)
    val h2 = h32(key, 8)
    transform(sequence(lit(0), lit(k - 1)),
      i => pmod(h1 + i.cast("long") * h2, lit(m.toLong)))
  }

  /** Register table: the distinct set bit positions for the stream of
    * `key` values — one row per set bit (`bit` ∈ [0, m)). Sharded
    * filters merge by `union.distinct` (= bitwise OR). */
  def setBits(df: DataFrame, key: Column, m: Int = 4096,
      k: Int = 4): DataFrame =
    df.select(explode(positions(key, m, k)).as("bit")).distinct()

  /** Keep the probe rows that MIGHT be in the filter: all k of the
    * probe key's positions are set. Exact negatives (a dropped row is
    * definitely absent from the build set); false positives pass at the
    * classic (1 − e^(−kn/m))^k rate and are resolved by whatever exact
    * operation follows. Stated as explode → join → count == k, so the
    * filter side stays a relational frame (broadcastable when small). */
  def filterMaybeContains(probe: DataFrame, bits: DataFrame, key: Column,
      m: Int = 4096, k: Int = 4): DataFrame = {
    // Membership is decided per DISTINCT key — a key probed from many
    // rows must still see exactly k exploded positions, or the
    // count == k test below would reject every repeated key (each
    // occurrence would add k more counted rows).
    val keys = probe.select(key.cast("string").as("__k")).distinct()
    val hits = keys
      .select(col("__k"), explode(positions(col("__k"), m, k)).as("bit"))
      .join(broadcast(bits), Seq("bit"))
      .groupBy(col("__k")).agg(count(lit(1)).as("__nset"))
      .filter(col("__nset") === k)
      .select(col("__k"))
    probe.join(hits, key.cast("string") === col("__k"), "left_semi")
  }

  /** Bloom-prefiltered equi-join — the runtime-filter pattern: build a
    * filter over the small side's join keys, prune the huge probe side
    * to maybe-members (exact negatives make this safe), then run the
    * real join on the survivors. At 100 TB the pruned rows never enter
    * the join's exchange; the filter itself is ≤ m rows, broadcast. */
  def prefilterJoin(big: DataFrame, small: DataFrame, joinCol: String,
      m: Int = 4096, k: Int = 4): DataFrame = {
    val bits = setBits(small, col(joinCol), m, k)
    filterMaybeContains(big, bits, col(joinCol), m, k)
      .join(small, Seq(joinCol))
  }
}
