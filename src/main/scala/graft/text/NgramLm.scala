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
      // codegen'd all-shingles (r16): ≡ the concat_ws∘element_at HOF
      // for non-null tokens under the size ≥ 2 guard
      .select(explode(
        graft.functions.TextExpressions.allWordShingles(col("t"), 2))
        .as("gram"))
      .groupBy(col("gram")).agg(count(lit(1)).as("cnt"))

  /** CCNet head/middle/tail perplexity buckets (Wenzek et al. 2020
    * §4.3): split each language's documents into three quality tiers
    * by their LM score, here the integer-scaled rare-bigram ratio
    * r = n_rare·10⁶ div n_bigrams from [[docComponents]] (lower =
    * more fluent = head — the exact-integer stand-in for KenLM
    * perplexity, same ordering role). Thresholds are per-language
    * EXACT discrete tercile quantiles ([[graft.pipeline.Stats
    * .exactQuantiles]] at 333333/666667 ppm — broadcastable, one row
    * per language); docs with no bigram (< 2 tokens) score the maximal
    * r = 10⁶ (no fluency evidence → tail, CCNet's conservative
    * choice). Returns (doc_id, lang, r, bucket ∈ head|middle|tail).
    * Every value is an integer or a string — oracle-hashable (q129).
    *
    * Scale shape: components are two bigram-keyed aggregations
    * ([[docComponents]]); the quantile pass is one partitioned sort
    * per language over the per-DOC frame (corpus-row-bounded, not
    * token-bounded); the threshold table joins broadcast. */
  def perplexityBuckets(docs: DataFrame, model: DataFrame,
      rareBelow: Long = 3L, idCol: String = "doc_id",
      textCol: String = "text", langCol: String = "lang"): DataFrame = {
    val comp = docComponents(docs, model, rareBelow, idCol, textCol)
      .join(docs.select(col(idCol).as("doc_id"),
        col(langCol).as("lang")), Seq("doc_id"))
      .withColumn("r", when(col("n_bigrams") === 0, lit(1000000L))
        .otherwise(graft.time.Buckets.intDiv(
          col("n_rare") * 1000000L, col("n_bigrams"))))
    val qs = graft.pipeline.Stats.exactQuantiles(
      comp, Seq("lang"), col("r"), Seq(333333L, 666667L))
    comp.join(broadcast(qs), Seq("lang"))
      .select(col("doc_id"), col("lang"), col("r"),
        when(col("r") <= col("p_333333"), lit("head"))
          .when(col("r") <= col("p_666667"), lit("middle"))
          .otherwise(lit("tail")).as("bucket"))
  }

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
        explode(graft.functions.TextExpressions
          .allWordShingles(col("t"), 2)).as("gram"))
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
