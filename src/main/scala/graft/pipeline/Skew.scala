package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pre-shuffle skew audit — the decision report behind "does this join/
  * aggregation key need salting or AQE skew handling". Produces the
  * per-key count distribution's summary in one pass without any global
  * window over keys: quantiles are computed over the (count → #keys)
  * HISTOGRAM, whose size is the number of DISTINCT count values — tiny
  * even when the key space is 10⁹ — so the only window runs over that
  * histogram, never over rows or keys.
  */
object Skew {

  /** One-row report: (n_rows, n_keys, max_cnt, p50_cnt, p90_cnt,
    * p99_cnt, top_key, top_cnt, top_share_ppm). Quantiles are lower
    * discrete quantiles of the per-key count distribution (the q104
    * convention: smallest cnt with cum·10⁶ ≥ q·n_keys); top key ties
    * break toward the smallest key string; top_share_ppm =
    * floor(10⁶ · top_cnt / n_rows). */
  def report(df: DataFrame, keyCol: String): DataFrame = {
    val counts = df.groupBy(col(keyCol).cast("string").as("k"))
      .agg(count(lit(1)).as("cnt"))
    // count histogram: one row per distinct per-key count
    val hist = counts.groupBy(col("cnt"))
      .agg(count(lit(1)).as("n_at"))
    import org.apache.spark.sql.expressions.Window
    val w = Window.orderBy(col("cnt"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = hist.withColumn("cum", sum(col("n_at")).over(w))
    val scalars = counts.agg(
      sum(col("cnt")).as("n_rows"),
      count(lit(1)).as("n_keys"),
      max(col("cnt")).as("max_cnt"),
      // max count, ties toward the SMALLEST key (min_by on (-cnt, k),
      // the q106 top-gram convention)
      min_by(struct(col("k"), col("cnt")),
        struct((-col("cnt")).as("nc"), col("k"))).as("top_raw"))
    def q(ppm: Long) = min(when(
      col("cum") * 1000000L >= lit(ppm) * col("n_keys"), col("cnt")))
    // the histogram window's input is |distinct counts| rows — bounded;
    // the single-partition window is over that tiny frame only
    cum.crossJoin(scalars)
      .agg(
        first(col("n_rows")).as("n_rows"),
        first(col("n_keys")).as("n_keys"),
        first(col("max_cnt")).as("max_cnt"),
        q(500000L).as("p50_cnt"),
        q(900000L).as("p90_cnt"),
        q(990000L).as("p99_cnt"),
        first(col("top_raw")).as("top_raw"))
      .select(col("n_rows"), col("n_keys"), col("max_cnt"),
        col("p50_cnt"), col("p90_cnt"), col("p99_cnt"),
        col("top_raw.k").as("top_key"),
        col("top_raw.cnt").as("top_cnt"),
        {
          import graft.time.Buckets.intDiv
          val M = lit(1000000L)
          (intDiv(col("top_raw.cnt"), col("n_rows")) * M +
            intDiv(pmod(col("top_raw.cnt"), col("n_rows")) * M,
              col("n_rows"))).as("top_share_ppm")
        })
  }
}
