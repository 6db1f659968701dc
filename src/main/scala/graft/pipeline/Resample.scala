package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series GAP-FILL resampling: one row per (key, bucket) over a
  * dense bucket range, carrying the last observed value forward into
  * unobserved buckets — the daily-balance / metric-downsampling shape
  * every warehouse needs next to as-of joins and SCD2 history.
  *
  * Per key the dense range runs from the key's FIRST observation to the
  * corpus-wide last bucket (a key born later has no earlier rows —
  * nothing to carry). The fill is `last(value, ignoreNulls)` over one
  * partitioned sort; the dense range is a `sequence` explode, so the
  * output is exactly Σ(range length) rows — no cross join with a
  * calendar dimension, no driver-side date loop. Carried values are
  * copied bit-for-bit (no arithmetic), so FP payloads stay hash-exact.
  */
object Resample {

  /** Returns (key, bucket, value, is_observed): per key, every bucket
    * of width `bucketMs` from its first observation to the global max,
    * value = last observed at-or-before the bucket (within a bucket,
    * the latest (ms, seq) observation wins). */
  def gapFill(events: DataFrame, keyCol: String, msCol: String,
      valueCol: String, seqCol: String,
      bucketMs: Long = 86400000L): DataFrame = {
    val ev = events.select(col(keyCol).as("key"),
      graft.time.Buckets.floorDiv(msCol, bucketMs).as("bucket"),
      col(msCol).as("__ms"), col(seqCol).as("__seq"),
      col(valueCol).as("value"))
    // latest observation per (key, bucket) — map-side-combining max_by
    val perBucket = ev.groupBy(col("key"), col("bucket"))
      .agg(max_by(col("value"), struct(col("__ms"), col("__seq")))
        .as("obs_value"))
    // dense per-key range: first bucket of the key .. global max bucket
    val maxRow = ev.agg(max(col("bucket"))).head()
    if (maxRow.isNullAt(0)) return perBucket.limit(0)
      .select(col("key"), col("bucket"), col("obs_value").as("value"),
        lit(false).as("is_observed"))
    val maxBucket = maxRow.getLong(0)
    val spans = perBucket.groupBy(col("key"))
      .agg(min(col("bucket")).as("first_bucket"))
      .select(col("key"),
        explode(sequence(col("first_bucket"), lit(maxBucket))).as("bucket"))
    val joined = spans.join(perBucket, Seq("key", "bucket"), "left")
    val fill = Window.partitionBy(col("key")).orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    joined
      .withColumn("value", last(col("obs_value"), ignoreNulls = true)
        .over(fill))
      .select(col("key"), col("bucket"), col("value"),
        col("obs_value").isNotNull.as("is_observed"))
  }
}
