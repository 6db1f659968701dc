package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** 2-D skyline (Pareto frontier, Börzsönyi et al. 2001): the points not
  * dominated on two maximize-dimensions — p dominates q when p ≥ q in
  * both and > in at least one.
  *
  * In 2-D the skyline is a running-max sweep over x-descending order,
  * NOT a self-join — the O(n²) dominance test never materializes. The
  * sweep is distributed as a classic two-pass PREFIX SCAN (the same
  * shape as [[LinkOps.seqIds]]' sort + zipWithIndex): per-x max-y hash
  * aggregation, range-sort by x descending, per-partition local running
  * max, then a driver-side cumulative max over the P partition summaries
  * (P values, not rows) seeds pass two. No global single-partition
  * window anywhere; the sort is a standard range-partitioned exchange.
  */
object Pareto {

  /** Distinct skyline points of (x, y), both maximized. Columns must be
    * integer-valued (cast rationals to a fixed scale first — FP ties
    * are not deterministic). Returns (x, y) skyline points. */
  def skyline2(df: DataFrame, x: Column, y: Column): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    // per-x best y: after this, x values are unique (no tie handling
    // needed in the sweep) and the sweep input is |distinct x| rows
    val best = df.groupBy(x.cast("long").as("x"))
      .agg(max(y.cast("long")).as("y"))
      .as[(Long, Long)]
    val sorted = best.rdd.sortBy(_._1, ascending = false)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nParts = sorted.getNumPartitions
    // pass 1: each partition's max y (P scalars to the driver)
    val partMax = sorted.mapPartitionsWithIndex { (i, it) =>
      var m = Long.MinValue
      it.foreach(p => m = math.max(m, p._2))
      Iterator((i, m))
    }.collect().toMap
    // prefix(i) = max y over all partitions BEFORE i (= all greater x)
    val prefix = Array.fill(nParts)(Long.MinValue)
    var run = Long.MinValue
    (0 until nParts).foreach { i =>
      prefix(i) = run
      run = math.max(run, partMax.getOrElse(i, Long.MinValue))
    }
    // pass 2: local sweep seeded with the cross-partition prefix max
    val kept = sorted.mapPartitionsWithIndex { (i, it) =>
      var m = prefix(i)
      it.flatMap { case (xx, yy) =>
        val keep = yy > m
        m = math.max(m, yy)
        if (keep) Iterator((xx, yy)) else Iterator.empty
      }
    }
    // materialize the (small) frontier, then drop the sorted cache —
    // the standard cache-hygiene pattern (Checkpoints.materialize)
    val out = graft.util.Checkpoints.materialize(kept.toDF("x", "y"))
    sorted.unpersist(false)
    out
  }
}
