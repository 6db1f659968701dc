package graft.sketch

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** HyperLogLog distinct-count sketch (Flajolet et al. 2007) built from
  * deterministic md5-derived hashes, as pure column expressions.
  *
  * The REGISTER TABLE (bucket → max rank-of-first-one) is integer-exact
  * and engine-independent — it is what the correctness gate checks, and
  * what a 100 TB pipeline would persist/merge: registers from disjoint
  * shards combine by element-wise max, which is exactly a groupBy(bucket)
  * max — the same one-pass partial-aggregating shape as any Spark agg.
  * The floating-point [[estimate]] is derived from registers driver-side
  * (m rows) and is spec-checked against exact counts instead.
  *
  * Hash layout (m = 2^b buckets over the 32-bit md5-prefix hash):
  * bucket = h mod m (low b bits); the remaining (32−b)-bit field yields
  * rho = leading-zero count + 1 = (33 − b) − bitlength(rest), with
  * rho = 33 − b for rest = 0.
  */
object Hll {

  /** 32-bit stable hash — same math as Dedup.h32 / DuckDB
    * ('0x' || substr(md5(x), 1, 8))::BIGINT. */
  private def h32(c: Column): Column =
    conv(substring(md5(c), 1, 8), 16, 10).cast("long")

  private def bits(m: Int): Int = {
    require(m >= 16 && (m & (m - 1)) == 0, s"m must be a power of two >= 16, got $m")
    Integer.numberOfTrailingZeros(m)
  }

  /** The (bucket, rho) pair for one key — the single-element sketch,
    * exposed for operators that seed per-entity sketches and merge
    * them structurally (e.g. [[graft.operators.HyperBall]]). */
  def bucketRho(key: Column, m: Int): (Column, Column) = {
    val b = bits(m)
    val width = 33 - b // rho for an all-zero rest field, = field bits + 1
    val h = h32(key)
    val rest = shiftright(h, b) // h div m, exact integer shift
    val rho = when(rest === 0, width)
      .otherwise(lit(width) - length(bin(rest)))
    (h.bitwiseAND(lit(m - 1L)), rho.cast("long"))
  }

  /** Per-bucket max rho over the distinct hash stream — only buckets
    * that received at least one value appear (absent bucket ≡ rho 0).
    * One hash aggregation; partials combine by max on every shard. */
  def registers(df: DataFrame, key: Column, m: Int = 256): DataFrame = {
    val (bucket, rho) = bucketRho(key, m)
    df.select(bucket.as("bucket"), rho.as("rho"))
      .groupBy(col("bucket"))
      .agg(max(col("rho")).cast("long").as("max_rho"))
  }

  /** GROUPED register tables: one HLL per value of `groupCols` — the
    * "distinct users per segment" shape. Still ONE hash aggregation
    * (keyed on group × bucket); per-group sketches merge across shards
    * by max exactly like the global form. */
  def registersBy(df: DataFrame, key: Column, groupCols: Seq[String],
      m: Int = 256): DataFrame = {
    val b = bits(m)
    val width = 33 - b
    val h = h32(key)
    val rest = shiftright(h, b)
    val rho = when(rest === 0, width)
      .otherwise(lit(width) - length(bin(rest)))
    df.select(groupCols.map(col) ++ Seq(
        h.bitwiseAND(lit(m - 1L)).as("bucket"), rho.as("rho")): _*)
      .groupBy((groupCols :+ "bucket").map(col): _*)
      .agg(max(col("rho")).cast("long").as("max_rho"))
  }

  /** The HLL cardinality estimate from a [[registers]] frame, with the
    * standard small-range (linear counting) correction. Returns one row
    * (n_buckets_hit, estimate). */
  def estimate(registers: DataFrame, m: Int = 256): DataFrame = {
    bits(m) // validate
    val alpha =
      if (m == 16) 0.673 else if (m == 32) 0.697
      else if (m == 64) 0.709 else 0.7213 / (1.0 + 1.079 / m)
    val agg = registers.agg(
      count(lit(1)).as("hit"),
      sum(pow(lit(2.0), -col("max_rho"))).as("s")).collect()(0)
    val hit = agg.getLong(0)
    val zeros = m - hit // absent buckets contribute 2^0 each
    val sum2 = (if (agg.isNullAt(1)) 0.0 else agg.getDouble(1)) + zeros
    val raw = alpha * m * m / sum2
    val est =
      if (raw <= 2.5 * m && zeros > 0) m * math.log(m.toDouble / zeros)
      else raw
    val spark = registers.sparkSession
    import spark.implicits._
    Seq((hit, est)).toDF("n_buckets_hit", "estimate")
  }
}
