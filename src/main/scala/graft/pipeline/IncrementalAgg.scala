package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Mergeable aggregate STATE for incremental pipelines: compute partial
  * states per shard (day, file batch, stream micro-batch), persist
  * them, and roll new shards into the running total WITHOUT re-reading
  * history — the incremental-ETL discipline behind every "daily stats"
  * table at 100 TB, and the same algebra Spark's own partial
  * aggregation uses inside one job.
  *
  * The state per (key, shard) is {n, sum (decimal-exact), min, max}:
  * each component merges associatively (sum/sum/min/max), so
  * `merge(partials)` over any sharding equals the one-shot aggregate —
  * spec-checked, and the gate states the one-shot form as its oracle.
  * Averages and other ratios derive from merged components at read
  * time; they are NOT state (a stored average cannot merge).
  */
object IncrementalAgg {

  /** Partial states per (groupCols, shardCol) — e.g. per (event_type,
    * day). `valueCol` must be integer-valued (scale first — cents). */
  def partialStates(df: DataFrame, groupCols: Seq[String],
      shardCol: String, valueCol: String): DataFrame =
    df.groupBy((groupCols :+ shardCol).map(col): _*)
      .agg(
        count(lit(1)).as("n"),
        sum(col(valueCol).cast("decimal(38,0)")).as("sum_v"),
        min(col(valueCol)).as("min_v"),
        max(col(valueCol)).as("max_v"))

  /** Roll partial states up to per-key totals: component-wise
    * sum/sum/min/max plus the shard count. Equals the one-shot
    * aggregate over the raw rows, for ANY sharding of the input. */
  def mergeStates(partials: DataFrame, groupCols: Seq[String]): DataFrame =
    partials.groupBy(groupCols.map(col): _*)
      .agg(
        sum(col("n")).as("n"),
        sum(col("sum_v")).cast("decimal(38,0)").as("sum_v"),
        min(col("min_v")).as("min_v"),
        max(col("max_v")).as("max_v"),
        count(lit(1)).as("n_shards"))
}
