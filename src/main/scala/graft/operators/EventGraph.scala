package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Deterministic findings-shaped view over the driver's `events` table, used
  * by the correctness-gate queries so the snapshot operators can be
  * oracle-checked in DuckDB on the same parquet.
  *
  * Mapping (pure integer arithmetic + CASE, so the DuckDB oracle states the
  * identical expressions):
  *   subject    = 'n' || (user_id % 50)
  *   target     = 'n' || ((user_id * 7 + event_id) % 60)   -- n50..n59 are
  *                never subjects ⇒ genuine boundary nodes (J4)
  *   link_state = CASE event_id % 4 → unused | to_target | to_subject | bidirectional
  *   epoch_ms   = epoch ms of ts;  sample_seq = event_id (tie-break)
  *   sub_id     = event_id % 3  (multi-link sub-ID, A1/unifyToMany)
  *   value      = event value (rides along as a link attribute payload)
  */
object EventGraph {
  def linkSamples(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    ev.select(
      concat(lit("n"), (col("user_id") % 50).cast("string")).as("subject"),
      concat(lit("n"), ((col("user_id") * 7 + col("event_id")) % 60).cast("string")).as("target"),
      when(col("event_id") % 4 === 0, "unused")
        .when(col("event_id") % 4 === 1, "to_target")
        .when(col("event_id") % 4 === 2, "to_subject")
        .otherwise("bidirectional").as("link_state"),
      Tables.epochMs(ev, "ts").as("epoch_ms"),
      col("event_id").as("sample_seq"),
      (col("event_id") % 3).as("sub_id"),
      col("value"))
  }

  /** The samples re-shaped as canonical findings (one finding per event,
    * one link each) so the full Weave/GetSnapshot pipeline runs on them. */
  def findings(spark: SparkSession, dir: String): DataFrame =
    linkSamples(spark, dir).select(
      col("subject"),
      col("epoch_ms"),
      col("sample_seq").as("finding_seq"),
      lit(null).cast("map<string,string>").as("node_attrs"),
      array(struct(
        col("target"),
        col("link_state"),
        map(lit("v"), col("value").cast("string")).as("link_attrs"))).as("links"))

  /** The same mapping as a DuckDB SQL fragment (CTE body). */
  val oracleCte: String =
    """SELECT 'n' || CAST(user_id % 50 AS VARCHAR) AS subject,
      |       'n' || CAST((user_id * 7 + event_id) % 60 AS VARCHAR) AS target,
      |       CASE event_id % 4 WHEN 0 THEN 'unused' WHEN 1 THEN 'to_target'
      |            WHEN 2 THEN 'to_subject' ELSE 'bidirectional' END AS link_state,
      |       epoch_ms(ts) AS epoch_ms,
      |       event_id AS sample_seq,
      |       event_id % 3 AS sub_id,
      |       value
      |FROM events""".stripMargin
}
