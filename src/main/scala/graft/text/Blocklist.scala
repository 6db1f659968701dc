package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Phrase-blocklist matching at corpus scale — the "drop every doc
  * containing any of these phrases" stage every curation pipeline
  * runs (unsafe phrases, spam templates, license boilerplate).
  *
  * The naive shape is docs × phrases with a contains() per pair —
  * quadratic and unshippable. Here each phrase elects ONE anchor
  * token (its longest token, ties lexicographically smallest — the
  * most selective deterministic choice available without corpus
  * stats), candidates come from an equi-join of the doc's DISTINCT
  * tokens against the broadcast anchor table, and the full
  * token-sequence containment check runs on candidates only. Cost is
  * linear in (docs containing an anchor) × (phrases per anchor) —
  * the contaminationCounts discipline, never all-pairs. Tokenization
  * ([[TextOps.tokens]]) is shared by both sides, so matching is
  * whole-word and punctuation/case-insensitive by construction.
  */
object Blocklist {

  /** (idCol, phraseIdCol) pairs: every blocklist phrase whose full
    * token sequence appears (whole-word, in order) in the doc.
    * `phrases`: (phraseIdCol, phraseCol); empty-token phrases drop.
    * The phrase table broadcasts (blocklists are small by nature);
    * candidates join back to the normalized doc text by id, so the
    * exploded token frame never carries document bodies. */
  def matches(docs: DataFrame, phrases: DataFrame,
      idCol: String = "doc_id", textCol: String = "text",
      phraseIdCol: String = "phrase_id",
      phraseCol: String = "phrase"): DataFrame = {
    val p0 = phrases
      .select(col(phraseIdCol),
        TextOps.tokens(col(phraseCol)).as("ptoks"))
      .filter(size(col("ptoks")) > 0)
      .select(col(phraseIdCol), concat_ws(" ", col("ptoks")).as("pnorm"),
        explode(col("ptoks")).as("anchor"))
    val w = Window.partitionBy(col(phraseIdCol))
      .orderBy(length(col("anchor")).desc, col("anchor").asc)
    val anchors = p0.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("anchor"), col(phraseIdCol), col("pnorm"))
    val norm = docs.select(col(idCol),
      concat(lit(" "), concat_ws(" ", TextOps.tokens(col(textCol))),
        lit(" ")).as("dnorm"))
    val candidates = docs
      .select(col(idCol),
        explode(array_distinct(TextOps.tokens(col(textCol))))
          .as("anchor"))
      .join(broadcast(anchors), Seq("anchor"))
      .select(col(idCol), col(phraseIdCol), col("pnorm"))
    candidates.join(norm, Seq(idCol))
      .filter(col("dnorm")
        .contains(concat(lit(" "), col("pnorm"), lit(" "))))
      .select(col(idCol), col(phraseIdCol))
  }

  /** Docs with no blocklist hit — the keep side, as an anti-join
    * against [[matches]]. */
  def filterClean(docs: DataFrame, phrases: DataFrame,
      idCol: String = "doc_id", textCol: String = "text",
      phraseIdCol: String = "phrase_id",
      phraseCol: String = "phrase"): DataFrame =
    docs.join(
      matches(docs, phrases, idCol, textCol, phraseIdCol, phraseCol)
        .select(col(idCol)).distinct(),
      Seq(idCol), "left_anti")
}
