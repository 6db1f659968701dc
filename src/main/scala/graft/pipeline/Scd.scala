package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension type 2 (SCD2) history: compress a keyed
  * event stream into VALIDITY INTERVALS — one row per state change,
  * `[valid_from, valid_to)`, open row (`valid_to` NULL) = current —
  * and roll new batches into an existing history incrementally.
  *
  * The warehouse upsert pattern, restated append-only: [[build]] is
  * change-detection (lag) + interval assembly (lead) over one
  * partitioned sort per key; [[applyBatch]] reworks ONLY the keys the
  * batch touches (closed history passes through untouched, so the
  * incremental cost scales with the batch, not the dimension). The
  * algebra is spec-checked: applyBatch(build(old), new) == build(old ∪
  * new) whenever the batch is not retro-dated (no update older than
  * its key's current `valid_from` — the standard SCD2 contract; late
  * data needs a rebuild of the affected keys).
  *
  * Columns: key, state, valid_from, valid_to, is_current, plus an
  * internal `seq` tie-break retained for deterministic re-application.
  */
object Scd {

  private def segments(events: DataFrame): DataFrame = {
    val byKey = Window.partitionBy(col("key"))
      .orderBy(col("ts"), col("seq"))
    val changes = events
      .withColumn("__prev", lag(col("state"), 1).over(byKey))
      .filter(col("__prev").isNull || col("__prev") =!= col("state"))
      .drop("__prev")
    val ord = Window.partitionBy(col("key"))
      .orderBy(col("ts"), col("seq"))
    changes
      .withColumn("valid_to", lead(col("ts"), 1).over(ord))
      .select(col("key"), col("state"), col("ts").as("valid_from"),
        col("valid_to"), col("valid_to").isNull.as("is_current"),
        col("seq"))
  }

  /** Build the SCD2 history from scratch: consecutive equal states
    * collapse into one interval; `seqCol` breaks same-timestamp ties
    * deterministically. */
  def build(events: DataFrame, keyCol: String, stateCol: String,
      tsCol: String, seqCol: String): DataFrame =
    segments(events.select(col(keyCol).as("key"),
      col(stateCol).as("state"), col(tsCol).as("ts"),
      col(seqCol).as("seq")))

  /** Roll one update batch into an existing history. Keys absent from
    * the batch pass through untouched; for touched keys, the OPEN row
    * re-enters change detection with the batch (so a batch whose first
    * state equals the current one extends the open interval instead of
    * splitting it) and closed rows pass through. Requires batch rows
    * not older than their key's open `valid_from`. */
  def applyBatch(dim: DataFrame, updates: DataFrame, keyCol: String,
      stateCol: String, tsCol: String, seqCol: String): DataFrame = {
    val up = updates.select(col(keyCol).as("key"),
      col(stateCol).as("state"), col(tsCol).as("ts"),
      col(seqCol).as("seq"))
    val touched = up.select(col("key")).distinct()
    val untouched = dim.join(touched, Seq("key"), "left_anti")
    val closedTouched = dim.join(touched, Seq("key"), "left_semi")
      .filter(!col("is_current"))
    val openAsEvents = dim.join(touched, Seq("key"), "left_semi")
      .filter(col("is_current"))
      .select(col("key"), col("state"), col("valid_from").as("ts"),
        col("seq"))
    val rebuilt = segments(openAsEvents.unionByName(up))
    untouched.unionByName(closedTouched).unionByName(rebuilt)
  }
}
