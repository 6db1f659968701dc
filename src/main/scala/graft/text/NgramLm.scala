package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Count-based n-gram LM quality signals — the CCNet/KenLM "score every
  * document against a corpus LM and filter the tail" stage, reduced to
  * its INTEGER sufficient statistics so the gate is exact: per doc, how
  * many of its word bigrams exist in the corpus model at all, how many
  * are RARE (corpus count below a floor), and the summed corpus counts.
  * Downstream ranks by rare-bigram ratio (or feeds the counts into a
  * real smoothed LM); no floating point is emitted here.
  *
  * Scale shape: the model is the corpus's (bigram, count) table —
  * vocab²-bounded, far smaller than the corpus — and the per-doc join
  * runs bigram-keyed (AQE broadcasts the model when it fits). Two
  * aggregations, no windows.
  */
object NgramLm {

  /** Corpus bigram model: (gram, cnt) over [[TextOps.tokens]] word
    * bigrams (non-distinct — true frequencies). */
  def bigramCounts(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.select(TextOps.tokens(col(textCol)).as("t"))
      .filter(size(col("t")) >= 2)
      .select(explode(transform(sequence(lit(0), size(col("t")) - 2),
        i => concat_ws(" ", element_at(col("t"), i + 1),
          element_at(col("t"), i + 2)))).as("gram"))
      .groupBy(col("gram")).agg(count(lit(1)).as("cnt"))

  /** Per-doc LM components against `model` (a [[bigramCounts]] frame):
    * (doc_id, n_bigrams, n_rare, sum_cnt) where `n_rare` counts doc
    * bigram OCCURRENCES whose corpus count is below `rareBelow` (a
    * bigram absent from the model — possible when scoring new docs
    * against an old model — counts as rare with cnt 0), and `sum_cnt`
    * sums the corpus counts over all occurrences. Docs with no bigram
    * (< 2 tokens) report (0, 0, 0). */
  def docComponents(docs: DataFrame, model: DataFrame,
      rareBelow: Long = 3L, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val base = docs.select(col(idCol).as("doc_id"),
      TextOps.tokens(col(textCol)).as("t"))
    val grams = base.filter(size(col("t")) >= 2)
      .select(col("doc_id"),
        explode(transform(sequence(lit(0), size(col("t")) - 2),
          i => concat_ws(" ", element_at(col("t"), i + 1),
            element_at(col("t"), i + 2)))).as("gram"))
    val scored = grams.join(model, Seq("gram"), "left")
      .withColumn("cnt", coalesce(col("cnt"), lit(0L)))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        sum(when(col("cnt") < rareBelow, 1L).otherwise(0L)).as("n_rare"),
        sum(col("cnt")).as("sum_cnt"))
    base.select(col("doc_id"))
      .join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("n_rare"), lit(0L)).as("n_rare"),
        coalesce(col("sum_cnt"), lit(0L)).as("sum_cnt"))
  }
}
