package graft.sketch

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fixed-bin histogram sketch — the quantile/distribution companion to
  * [[Hll]] (distincts) and [[Cms]] (frequencies). The register table
  * (bin → count, plus underflow/overflow bins) is integer-exact and
  * mergeable by element-wise SUM, so shards of a 100 TB column combine
  * with one small groupBy; quantile estimates interpolate inside the
  * histogram driver-side and are spec-bounded by one bin width against
  * the exact percentile.
  */
object Histogram {

  /** Register table over `value`: equi-width bins on [lo, hi), bin i
    * covering [lo + i·w, lo + (i+1)·w). Values below `lo` land in bin
    * −1, at-or-above `hi` in bin `nbins` — the sketch never drops data
    * (the tails are what profiling is usually FOR). */
  def registers(df: DataFrame, value: Column, lo: Double, hi: Double,
      nbins: Int = 64): DataFrame = {
    require(nbins >= 1 && hi > lo, s"bad histogram geometry [$lo,$hi)/$nbins")
    val w = (hi - lo) / nbins
    val bin = when(value < lo, lit(-1L))
      .when(value >= hi, lit(nbins.toLong))
      .otherwise(floor((value - lo) / w).cast("long"))
    df.select(bin.as("bin"))
      .filter(col("bin").isNotNull)
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Interpolated quantile estimates (q ∈ [0, 1]) from a [[registers]]
    * frame. Error ≤ one bin width for in-range quantiles (the spec
    * asserts it); quantiles landing in the unbounded tail bins clamp to
    * lo/hi. Registers are tiny (≤ nbins+2 rows) — driver-side walk. */
  def quantiles(registers: DataFrame, qs: Seq[Double], lo: Double,
      hi: Double, nbins: Int = 64): Seq[(Double, Double)] = {
    val w = (hi - lo) / nbins
    val bins = registers.collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val total = bins.map(_._2).sum.toDouble
    qs.map { q =>
      val target = q * total
      var acc = 0.0
      var ans = hi
      val it = bins.iterator
      var found = false
      while (it.hasNext && !found) {
        val (b, c) = it.next()
        if (acc + c >= target && c > 0) {
          found = true
          ans =
            if (b < 0) lo
            else if (b >= nbins) hi
            else lo + b * w + w * ((target - acc) / c)
        } else acc += c
      }
      (q, ans)
    }
  }
}
