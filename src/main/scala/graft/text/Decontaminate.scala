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
    // codegen'd WordShingles (r16) replaces the interpreted
    // array_distinct∘transform HOF: with the size ≥ n guard and
    // non-empty tokens the distinct gram SET is identical (the
    // expression's short-shingle/empty-string edge cases only arise
    // below the guard), and consumers treat grams as an unordered set.
    docs.select(col(idCol).as("doc_id"), toks.as("t"))
      .filter(size(col("t")) >= n)
      .select(col("doc_id"), explode(
        graft.functions.TextExpressions.wordShingles(col("t"), n))
        .as("gram"))
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

  /** [[overlapReport]] with a Bloom-filter prefilter on the corpus
    * gram stream — the shape for when the benchmark union is too big
    * to broadcast as STRINGS but its bit filter is not (a 100 M-gram
    * eval union is gigabytes of text yet one 256 MB filter). The
    * corpus side sheds non-matching grams against the broadcast bits
    * BEFORE the exact verify join ships anything; Bloom negatives are
    * exact, false positives are removed by the verify, so the result
    * is IDENTICAL to [[overlapReport]] (same oracle). The verify join
    * runs as a plain shuffled equi-join on the survivors — deliberately
    * not broadcast, matching the premise that the bench gram table is
    * large. */
  def overlapReportBloom(corpus: DataFrame, bench: DataFrame, n: Int = 8,
      m: Int = 1 << 16, kHash: Int = 4, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    import graft.sketch.Bloom
    val benchGrams = grams(bench, n, idCol, textCol)
      .select(col("gram")).distinct()
    val bits = Bloom.setBits(benchGrams, col("gram"), m, kHash)
    Bloom.filterMaybeContains(
        grams(corpus, n, idCol, textCol), bits, col("gram"), m, kHash)
      .join(benchGrams, Seq("gram"), "left_semi")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shared_grams"))
  }

  /** [[overlapReport]] against MANY benchmarks at once — `benches`
    * carries a name column; returns (doc_id, bench, n_shared_grams)
    * per contaminated (corpus doc, benchmark) pair. One pass over the
    * corpus grams for ALL benchmarks (the release-audit shape: eval
    * suites arrive as one union, not N separate scans of 100 TB);
    * benchmark grams broadcast, inner-join fan-out bounded by the
    * number of benchmarks sharing a gram. */
  def overlapReportByBench(corpus: DataFrame, benches: DataFrame,
      n: Int = 8, benchCol: String = "bench", idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val toks = TextOps.tokens(col(textCol))
    val bg = broadcast(benches
      .select(col(benchCol).as("bench"), toks.as("t"))
      .filter(size(col("t")) >= n)
      .select(col("bench"), explode(
        graft.functions.TextExpressions.wordShingles(col("t"), n))
        .as("gram"))
      .distinct())
    grams(corpus, n, idCol, textCol)
      .join(bg, Seq("gram"))
      .groupBy(col("doc_id"), col("bench"))
      .agg(count(lit(1)).as("n_shared_grams"))
  }

  /** Per-benchmark release summary over [[overlapReportByBench]]:
    * (bench, n_docs_flagged, n_hits, flagged_ppm of the corpus) — the
    * table a data card publishes per eval suite. Corpus size enters as
    * a 1×1 scalar combine; ppm integral. */
  def contaminationSummary(corpus: DataFrame, benches: DataFrame,
      n: Int = 8, benchCol: String = "bench", idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    import graft.time.Buckets.intDiv
    val per = overlapReportByBench(corpus, benches, n, benchCol,
      idCol, textCol)
    val total = corpus.agg(count(lit(1)).as("__n_corpus"))
    per.groupBy(col("bench"))
      .agg(count(lit(1)).as("n_docs_flagged"),
        sum(col("n_shared_grams")).as("n_hits"))
      .crossJoin(broadcast(total)) // deliberate 1×1 scalar combine
      .select(col("bench"), col("n_docs_flagged"), col("n_hits"),
        intDiv(col("n_docs_flagged") * 1000000L,
          greatest(col("__n_corpus"), lit(1L))).as("flagged_ppm"))
  }
}
