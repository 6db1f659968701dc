package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Train-ready shard output — the pipeline's last mile: write packed
  * sequences ([[PipelineOps.packSequences]]-shaped frames) as a
  * stratum-partitioned parquet layout whose files are CO-LOCATED by
  * (stratum, bin) and accompanied by a manifest table, so a training
  * job can map shards to workers without listing or scanning data
  * files. The repartition-before-partitionBy is the same discipline as
  * the IVF index writer: without it every task fans out across every
  * stratum directory (tasks × strata tiny files + as many output
  * committers).
  */
object ShardWriter {

  /** Write `packed` (must carry `strataCol` and `binCol`) under
    * `outDir/data` partitioned by stratum, plus `outDir/manifest` with
    * one row per stratum: (stratum, n_bins, n_rows, n_toks — summed
    * from `tokCol` when present). Returns the manifest as read back
    * from disk. */
  def writeShards(packed: DataFrame, outDir: String,
      strataCol: String = "lang", binCol: String = "bin",
      tokCol: String = "n_tokens"): DataFrame = {
    packed
      .repartition(col(strataCol), col(binCol))
      .sortWithinPartitions(col(strataCol), col(binCol))
      .write.partitionBy(strataCol).mode("overwrite")
      .parquet(s"$outDir/data")
    // manifest aggregates the files JUST WRITTEN, not `packed` — the
    // upstream lineage (pack/dedup/mixture chains) would otherwise
    // recompute in full a second time
    val written = packed.sparkSession.read.parquet(s"$outDir/data")
    val toks: org.apache.spark.sql.Column =
      if (written.columns.contains(tokCol)) sum(col(tokCol))
      else lit(null).cast("long")
    written.groupBy(col(strataCol).as("stratum"))
      .agg(countDistinct(col(binCol)).as("n_bins"),
        count(lit(1)).as("n_rows"),
        toks.as("n_toks"))
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$outDir/manifest")
    packed.sparkSession.read.parquet(s"$outDir/manifest")
  }

  /** Read one stratum's shards back (partition-pruned scan). */
  def readStratum(spark: SparkSession, outDir: String, stratum: String,
      strataCol: String = "lang"): DataFrame =
    spark.read.parquet(s"$outDir/data")
      .filter(col(strataCol) === stratum)
}
