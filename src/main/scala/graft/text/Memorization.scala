package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Memorization-risk auditing: mine the word n-grams a corpus repeats
  * across many documents (Lee et al. 2022, "Deduplicating Training
  * Data Makes Language Models Better" — repeated substrings are what a
  * model memorizes verbatim; Carlini et al. 2022 ties extraction risk
  * to duplication count). [[graft.text.Decontaminate]] asks "does the
  * corpus overlap a BENCHMARK"; this asks "does the corpus overlap
  * ITSELF", with no second frame.
  *
  * Scale shape: one scan, one explode, ONE hash aggregate keyed on the
  * gram (map-side partial combine; `n_docs` via distinct per-doc grams
  * so a doc repeating a phrase internally counts once). No self-join,
  * no corpus × corpus structure — hot grams (boilerplate in millions
  * of docs) cost one combiner cell per map task, not a pair blowup.
  * Tokenization reuses [[TextOps.tokens]] so the oracle tokenizes
  * identically.
  */
object Memorization {

  /** (doc_id, gram) with multiplicity — every n-gram occurrence. */
  private def gramOccurrences(docs: DataFrame, n: Int, idCol: String,
      textCol: String): DataFrame = {
    val toks = TextOps.tokens(col(textCol))
    // NOT spread: A/B at sf0.1 (r16) — the added exchange cost more
    // than the 1-wide tokenize+gram map it parallelized (q205 0.74 →
    // 0.89 s); the gram volume here is doc-linear, unlike the shingle
    // self-join substrates where spreadAmplified won
    docs.select(col(idCol).as("doc_id"), toks.as("t"))
      .filter(size(col("t")) >= n)
      // codegen'd all-shingles (r16): occurrence-true grams; identical
      // to the interpreted transform∘sequence HOF under the size ≥ n
      // guard (spec-pinned, PipelineOpsSpec).
      .select(col("doc_id"), explode(
        graft.functions.TextExpressions.allWordShingles(col("t"), n))
        .as("gram"))
  }

  /** Corpus-repeated n-grams: every gram appearing in ≥ `minDocs`
    * DISTINCT documents, with (gram, n_docs, n_occurrences) — the
    * candidate list for memorization spot checks and for cross-doc
    * boilerplate policy. Integer-exact, deterministic (a threshold
    * filter, not a top-k, so no tie-break enters the result). */
  def repeatedNgrams(docs: DataFrame, n: Int, minDocs: Int = 2,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(n >= 1 && minDocs >= 1, s"bad params n=$n minDocs=$minDocs")
    // Two-stage instead of count_distinct: the (gram, doc) pre-agg
    // combines map-side (in-doc repeats collapse before any shuffle)
    // and avoids the Expand node a distinct-count plans — at 100× the
    // single-stage form spent its time shuffling duplicate
    // (gram, doc) pairs through the expand.
    gramOccurrences(docs, n, idCol, textCol)
      .groupBy(col("gram"), col("doc_id"))
      .agg(count(lit(1)).as("__n_in_doc"))
      .groupBy(col("gram"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("__n_in_doc")).as("n_occurrences"))
      .filter(col("n_docs") >= minDocs)
  }

  /** Per-document memorization exposure: how much of each doc is made
    * of corpus-repeated material — (doc_id, n_grams, n_repeated), where
    * `n_repeated` counts the doc's DISTINCT grams that ≥ `minDocs`
    * docs share. High n_repeated/n_grams marks a doc as mostly
    * boilerplate/template mass (dedup or downweight candidates).
    * Two passes over the gram stream (one to build the repeated set,
    * one to score docs); the join is gram-keyed equi — each doc gram
    * matches at most one repeated-set row, so fan-out is linear. */
  def exposure(docs: DataFrame, n: Int, minDocs: Int = 2,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    // ONE tokenize+explode scan: the distinct (gram, doc) stream is
    // materialized and reused by all three consumers below (the
    // repeated set only needs DISTINCT doc counts, so it derives from
    // the same frame — no separate repeatedNgrams pass).
    val perDoc = graft.util.Checkpoints.materialize(
      gramOccurrences(docs, n, idCol, textCol).distinct())
    val repeated = perDoc.groupBy(col("gram"))
      .agg(count(lit(1)).as("__nd"))
      .filter(col("__nd") >= minDocs).select(col("gram"))
    perDoc.join(repeated, Seq("gram"), "left_semi")
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_repeated"))
      .join(perDoc.groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_grams")), Seq("doc_id"), "right")
      .select(col("doc_id"), col("n_grams"),
        coalesce(col("n_repeated"), lit(0L)).as("n_repeated"))
  }
}
