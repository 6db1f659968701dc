package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.time.Buckets.intDiv

/** Z-order (Morton-curve) multi-dimensional layout — the data-skipping
  * clustering a 100 TB table wants when queries filter on MORE than one
  * column (Morton 1966; the technique behind Delta Lake's
  * `OPTIMIZE ZORDER BY` and ClickHouse/Iceberg z-clustering). Sorting
  * by (x, y) makes file-level min/max stats tight on x and useless on
  * y; sorting by the bit-interleaved z-key makes every file a small
  * RECTANGLE in (x, y) space, so a predicate on either dimension (or
  * both) prunes files at the scan.
  *
  * Everything here is pure integer column expressions (codegen'd shift/
  * mask chains — no UDF, no custom Expression needed): bit i of
  * dimension j lands at key position `i·dims + j`.
  */
object Layout {

  /** Min-max scale a non-negative-range numeric column into
    * [0, 2^bits): `((x − lo) · (2^bits − 1)) div max(hi − lo, 1)`,
    * exact integer arithmetic, clamped to the range so out-of-[lo,hi]
    * probes cannot corrupt the key. `bits ≤ 20` keeps the product
    * within long for any 2⁴³-wide domain. */
  def scaleToBits(x: Column, lo: Column, hi: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 20, s"bad bits=$bits")
    val mask = (1L << bits) - 1
    val clamped = least(greatest(x.cast("long"), lo.cast("long")),
      hi.cast("long"))
    intDiv((clamped - lo.cast("long")) * mask,
      greatest(hi.cast("long") - lo.cast("long"), lit(1L)))
  }

  /** Interleave the low `bits` bits of each (already-scaled) dimension
    * into one z-key: bit i of `dims(j)` → key bit `i·dims.length + j`.
    * `bits · dims.length ≤ 62` so the key stays a positive long. */
  def zorderKey(dims: Seq[Column], bits: Int): Column = {
    require(dims.nonEmpty && bits >= 1 && bits * dims.length <= 62,
      s"bad geometry dims=${dims.length} bits=$bits")
    val terms = for {
      j <- dims.indices
      i <- 0 until bits
    } yield shiftleft(
      shiftright(dims(j).cast("long"), i).bitwiseAND(lit(1L)),
      i * dims.length + j)
    terms.reduce(_ + _)
  }

  /** z-key over two RAW columns: scale each into [0, 2^bits) with the
    * given bounds, then interleave. */
  def zorderKey2(x: Column, xLo: Column, xHi: Column,
      y: Column, yLo: Column, yHi: Column, bits: Int): Column =
    zorderKey(Seq(scaleToBits(x, xLo, xHi, bits),
      scaleToBits(y, yLo, yHi, bits)), bits)

  /** Layout audit: bucket rows by the top `prefixBits` bits of their
    * 2-D z-key and report each bucket's bounding rectangle —
    * (z_bucket, n, x_min, x_max, y_min, y_max). Dimension bounds come
    * from ONE stats pass combined as a 1×1 scalar frame (the repo's
    * broadcast scalar-combine idiom), so the whole audit is two scans
    * and one hash aggregate. Tight, non-overlapping rectangles are the
    * proof the layout skips data on BOTH dimensions. */
  def zBucketStats(df: DataFrame, xCol: String, yCol: String,
      bits: Int = 8, prefixBits: Int = 6): DataFrame = {
    require(prefixBits >= 1 && prefixBits <= 2 * bits,
      s"bad prefixBits=$prefixBits for bits=$bits")
    val bounds = df.agg(min(col(xCol)).cast("long").as("__xlo"),
      max(col(xCol)).cast("long").as("__xhi"),
      min(col(yCol)).cast("long").as("__ylo"),
      max(col(yCol)).cast("long").as("__yhi"))
    val z = zorderKey2(col(xCol), col("__xlo"), col("__xhi"),
      col(yCol), col("__ylo"), col("__yhi"), bits)
    df.crossJoin(broadcast(bounds)) // deliberate 1×1 scalar combine
      .select(shiftright(z, 2 * bits - prefixBits).as("z_bucket"),
        col(xCol), col(yCol))
      .groupBy(col("z_bucket"))
      .agg(count(lit(1)).as("n"),
        min(col(xCol)).as("x_min"), max(col(xCol)).as("x_max"),
        min(col(yCol)).as("y_min"), max(col(yCol)).as("y_max"))
  }

  /** Write `df` z-clustered: range-partition on the z-key (so files
    * own contiguous, non-overlapping z-ranges = rectangles), sort
    * within partitions (tight page-level stats too), drop the key.
    * Bounds are sampled by `repartitionByRange` itself — no extra
    * pass. */
  def writeZOrdered(df: DataFrame, path: String, xCol: String,
      yCol: String, xLo: Long, xHi: Long, yLo: Long, yHi: Long,
      bits: Int = 8, numFiles: Int = 32): Unit = {
    val withKey = df.withColumn("__z",
      zorderKey2(col(xCol), lit(xLo), lit(xHi),
        col(yCol), lit(yLo), lit(yHi), bits))
    withKey.repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }
}
