package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Temporal join operators the built-in equi-join can't express directly:
  * AS-OF (latest right row at-or-before each left row) and INTERVAL
  * RANGE containment (points inside windows). Both are planned as
  * single-shuffle hash exchanges — never a BroadcastNestedLoopJoin —
  * because at 100 TB an inequality theta-join is the canonical
  * scale-killer:
  *
  *  - [[asOfJoin]] unions both inputs and resolves the match with ONE
  *    partitioned window (shuffle on the key columns only, both sides
  *    co-partitioned in the same exchange). The naive alternative —
  *    equi-join on key + `l.t >= r.t` filter + argmax — materializes
  *    every (left, earlier-right) pair before pruning: quadratic per
  *    key. The union-window form writes each input row through the
  *    shuffle exactly once.
  *  - [[rangeJoin]] replicates each interval across the fixed-width
  *    time bins it overlaps and equi-joins points on (keys, bin). Each
  *    point lives in exactly one bin, so a qualifying pair matches
  *    exactly once — no post-join dedup. Replication factor is
  *    `interval_len / binWidth + 1`, the knob that trades shuffle
  *    volume against bin selectivity.
  */
object TemporalJoins {

  /** AS-OF join: for every `left` row, the single `right` row with the
    * greatest `rightTime <= leftTime` (strictly `<` when
    * `strict = true`) among rows sharing `keys`; left rows with no such
    * match keep null payload columns (left-outer semantics, same as
    * DuckDB/kdb ASOF LEFT JOIN).
    *
    * Among right rows tied on the same instant, the one greatest by
    * `tieBreak` wins — pass the right side's unique id to make the
    * result deterministic when timestamps can collide.
    *
    * Payload columns (`right` minus keys minus `rightTime`) are
    * suffixed-free: callers rename beforehand if they collide with left
    * column names (asserted).
    *
    * Plan shape: one Exchange on `keys` + one sort — the same cost as a
    * single co-partitioned join, independent of how many earlier right
    * rows each left row has.
    */
  def asOfJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String,
      tieBreak: Seq[String] = Seq.empty,
      strict: Boolean = false): DataFrame = {
    val payloadCols = right.columns.filterNot(c =>
      keys.contains(c) || c == rightTime).toIndexedSeq
    require(payloadCols.nonEmpty, "right side has no payload columns")
    val collide = payloadCols.toSet.intersect(left.columns.toSet)
    require(collide.isEmpty, s"payload columns collide with left: $collide")
    val reserved = Set("__t", "__side", "__p", "__m")
    require(!(left.columns ++ right.columns).exists(reserved),
      s"column names $reserved are reserved by asOfJoin")

    // Right rows must sort BEFORE left rows at an equal instant for
    // inclusive (>=) semantics, AFTER them for strict (<): the window's
    // running `last` then sees exactly the admissible right rows.
    val (rightSide, leftSide) = if (strict) (2, 1) else (0, 1)
    val keyCols = keys.map(col)
    val r = right.select(keyCols ++ Seq(
      col(rightTime).as("__t"), lit(rightSide).as("__side"),
      struct(payloadCols.map(col): _*).as("__p")): _*)
    val l2 = left
      .withColumn("__t", col(leftTime))
      .withColumn("__side", lit(leftSide))
    val unioned = l2.unionByName(r, allowMissingColumns = true)

    // Order ties within the right side by tieBreak ASCENDING so the
    // running `last` keeps the greatest.
    val ord: Seq[Column] = Seq(col("__t"), col("__side")) ++
      tieBreak.map(c => col("__p").getField(c))
    val w = Window.partitionBy(keyCols: _*).orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = unioned.withColumn("__m", last(col("__p"), ignoreNulls = true).over(w))
    matched.filter(col("__side") === leftSide)
      .select(left.columns.map(col).toIndexedSeq ++
        payloadCols.map(c => col("__m").getField(c).as(c)): _*)
  }

  /** Interval RANGE join: inner-join every `intervals` row with every
    * `points` row sharing `keys` and satisfying
    * `lo <= pt < hi` (half-open; time columns are integral epoch
    * values). Planned as an EQUI-join on (keys, bin): each interval is
    * exploded over the `binWidth`-wide bins it overlaps, each point
    * belongs to exactly one bin — so the match set is exact and
    * duplicate-free by construction, and Spark plans a hash join, not a
    * nested loop.
    *
    * `binWidth` should be on the order of the typical interval length:
    * much smaller replicates intervals needlessly; much larger makes
    * bins unselective (more post-filter work per match). With an empty
    * `keys` this is a pure range join — the bin IS the join key, which
    * is exactly how a 100 TB range join must be planned (a theta-only
    * join would broadcast-nested-loop).
    */
  def rangeJoin(intervals: DataFrame, points: DataFrame, keys: Seq[String],
      lo: String, hi: String, pt: String, binWidth: Long): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val collide = intervals.columns.toSet
      .intersect(points.columns.toSet) -- keys
    require(collide.isEmpty, s"non-key columns collide: $collide")
    // bins floor(lo/w) .. floor((hi-1)/w); empty intervals match nothing
    val iv = intervals.withColumn("__bin",
      explode_outer(when(col(hi) > col(lo),
        sequence(floor(col(lo) / binWidth), floor((col(hi) - 1) / binWidth)))))
      .filter(col("__bin").isNotNull)
    val p = points.withColumn("__bin", floor(col(pt) / binWidth))
    iv.join(p, keys :+ "__bin")
      .filter(col(pt) >= col(lo) && col(pt) < col(hi))
      .drop("__bin")
  }

  /** INTERVAL × INTERVAL overlap join — half-open semantics: (a, b)
    * matches iff `a.lo < b.hi && b.lo < a.hi` (and both intervals are
    * non-empty). Same fixed-width-bin planning as [[rangeJoin]] (a
    * theta-only overlap join is a BroadcastNestedLoop at scale), plus
    * the CANONICAL-BIN trick for exactness without a distinct: both
    * sides explode their covered bins, but a pair is EMITTED only in
    * the bin containing `max(a.lo, b.lo)` — the overlap's first
    * instant lies in exactly one bin, so every true pair appears
    * exactly once and no dedup pass runs over the match stream.
    *
    * Left/right columns must not collide outside `keys` (rename
    * upstream); each side needs its own id among its columns if the
    * caller wants to tell rows apart downstream. */
  def intervalOverlapJoin(left: DataFrame, right: DataFrame,
      keys: Seq[String], loL: String, hiL: String,
      loR: String, hiR: String, binWidth: Long): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val collide = left.columns.toSet
      .intersect(right.columns.toSet) -- keys
    require(collide.isEmpty, s"non-key columns collide: $collide")
    def binned(df: DataFrame, lo: String, hi: String): DataFrame =
      df.withColumn("__bin",
        explode_outer(when(col(hi) > col(lo),
          sequence(floor(col(lo) / binWidth),
            floor((col(hi) - 1) / binWidth)))))
        .filter(col("__bin").isNotNull)
    binned(left, loL, hiL)
      .join(binned(right, loR, hiR), keys :+ "__bin")
      .filter(col(loL) < col(hiR) && col(loR) < col(hiL) &&
        // canonical bin: emit where the overlap starts
        col("__bin") === floor(greatest(col(loL), col(loR)) / binWidth))
      .drop("__bin")
  }
}
