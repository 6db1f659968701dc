package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination: flag training documents that share any
  * word n-gram with an evaluation/benchmark set (the GPT-3 appendix-C /
  * PaLM "13-gram overlap" procedure, parameterized n).
  *
  * Scale shape: the benchmark side is tiny relative to the corpus, so
  * its distinct-gram projection BROADCASTS and the corpus side is one
  * scan + explode + broadcast-hash semi-join — the corpus is never
  * shuffled on grams and no corpus × corpus structure exists. Gram
  * generation reuses [[TextOps.tokens]]' normalization so engine and
  * oracle tokenize identically.
  */
object Decontaminate {

  /** Distinct word n-grams per doc: (doc_id, gram). */
  private[graft] def grams(docs: DataFrame, n: Int, idCol: String,
      textCol: String): DataFrame = {
    val toks = TextOps.tokens(col(textCol))
    docs.select(col(idCol).as("doc_id"), toks.as("t"))
      .filter(size(col("t")) >= n)
      .select(col("doc_id"), explode(array_distinct(
        transform(sequence(lit(0), size(col("t")) - n),
          i => array_join(slice(col("t"), i + 1, lit(n)), " ")))).as("gram"))
  }

  /** Contaminated-doc report: for every corpus doc sharing ≥1 word
    * n-gram with any benchmark doc, (doc_id, n_shared_grams) — the
    * count of DISTINCT overlapping grams. Docs present in both frames
    * are the caller's concern (a real pipeline drops benchmark rows
    * from the corpus first, or wants exactly that self-hit to locate
    * verbatim leaks). Downstream: anti-join the corpus against this
    * frame's doc_ids to decontaminate. */
  def overlapReport(corpus: DataFrame, bench: DataFrame, n: Int = 8,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val benchGrams = broadcast(
      grams(bench, n, idCol, textCol).select(col("gram")).distinct())
    grams(corpus, n, idCol, textCol)
      .join(benchGrams, Seq("gram"), "left_semi")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shared_grams"))
  }

  /** The corpus minus contaminated docs — one anti-join against the
    * flagged ids. */
  def decontaminate(corpus: DataFrame, bench: DataFrame, n: Int = 8,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    corpus.join(overlapReport(corpus, bench, n, idCol, textCol)
        .select(col("doc_id").as(idCol)),
      Seq(idCol), "left_anti")
}
