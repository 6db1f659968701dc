package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Okapi BM25 keyword scoring over the corpus (Robertson & Zaragoza
  * 2009, "The Probabilistic Relevance Framework: BM25 and Beyond") —
  * the retrieval stage of keyword-targeted corpus curation: score every
  * document against a small term set (topic seeds, quality probes,
  * decontamination keywords) and keep/inspect the top scorers.
  *
  * score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))
  * with idf(t) = ln(1 + (N − df + ½)/(df + ½)) and the standard
  * k1 = 1.2, b = 0.75.
  *
  * Determinism split (the q92 PMI / tfidf discipline): ln() differs in
  * the last ulp across libm implementations, so the HASH-GATED surface
  * is [[components]] — the per-(doc, term) integer-exact pieces with
  * the two fractional factors cleared to exact ppm — while the real
  * [[scores]]/[[topK]] (doubles, with the log) are spec-checked.
  *
  * Scale shape: the term filter runs BEFORE the tf aggregation, so the
  * per-(doc, term) frame is |matching tokens|, not the corpus; df is a
  * |terms|-row broadcast; N/total-tokens is a 1×1 scalar-summary
  * combine. No shuffle carries anything wider than (doc, term, count).
  */
object Bm25 {

  val K1 = 1.2
  val B = 0.75

  /** Per-(doc, term) frame carrying every BM25 ingredient: tf, df, dl,
    * n_docs, t_toks (corpus totals). Internal composition point. */
  private def enriched(docs: DataFrame, terms: Seq[String],
      idCol: String, textCol: String): DataFrame = {
    val toks = docs.select(col(idCol).cast("long").as("doc_id"),
        explode(TextOps.tokens(col(textCol))).as("term"))
      .filter(col("term").isin(terms: _*))
    val tf = toks.groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val dl = docs.select(col(idCol).cast("long").as("doc_id"),
      TextOps.tokenCount(col(textCol)).cast("long").as("dl"))
    // corpus scalars: 1×1 scalar-summary combine, not a data cross join
    val scal = docs.agg(count(lit(1)).as("n_docs"),
      coalesce(sum(TextOps.tokenCount(col(textCol)).cast("long")), lit(0L))
        .as("t_toks"))
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    tf.join(dl, Seq("doc_id"))
      .join(broadcast(df), Seq("term"))
      .crossJoin(scal)
  }

  /** Integer-exact BM25 components per (doc, term) — the oracle-hashed
    * surface. With k1 = 1.2, b = 0.75 the two fractional factors clear
    * to pure integer ratios (multiply through by 10·T):
    *
    *  - `stf_ppm`  = ⌊10⁶ · 22·tf·T / (10·tf·T + 3·T + 9·dl·N)⌋ — the
    *    saturated, length-normalized tf factor ×(k1+1), in ppm;
    *  - `idf_ratio_ppm` = ⌊10⁶ · (2N − 2df + 1) / (2df + 1)⌋ — the
    *    idf ratio BEFORE the log (ln stays consumer-side, as in the
    *    PMI gate), in ppm.
    *
    * Products run in DECIMAL(38,0), exact far past 100 TB corpus
    * sizes. Returns (doc_id, term, tf, df, dl, stf_ppm,
    * idf_ratio_ppm). */
  def components(docs: DataFrame, terms: Seq[String],
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    import graft.time.Buckets.intDiv
    def d(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
    val e = enriched(docs, terms, idCol, textCol)
    val stfNum = d(lit(22000000L)) * d(col("tf")) * d(col("t_toks"))
    val stfDen = d(lit(10L)) * d(col("tf")) * d(col("t_toks")) +
      d(lit(3L)) * d(col("t_toks")) +
      d(lit(9L)) * d(col("dl")) * d(col("n_docs"))
    val idfNum = d(lit(1000000L)) *
      (d(lit(2L)) * d(col("n_docs")) - d(lit(2L)) * d(col("df")) +
        d(lit(1L)))
    val idfDen = d(lit(2L)) * d(col("df")) + d(lit(1L))
    e.select(col("doc_id"), col("term"), col("tf"), col("df"), col("dl"),
      intDiv(stfNum, stfDen).as("stf_ppm"),
      intDiv(idfNum, idfDen).as("idf_ratio_ppm"))
  }

  /** Full double-precision BM25 per document (spec-checked; the ln
    * keeps it off the hash gate). Only documents matching ≥ 1 term
    * appear. Returns (doc_id, score). */
  def scores(docs: DataFrame, terms: Seq[String],
      idCol: String = "doc_id", textCol: String = "text",
      k1: Double = K1, b: Double = B): DataFrame = {
    val e = enriched(docs, terms, idCol, textCol)
    val avgdl = col("t_toks").cast("double") / col("n_docs").cast("double")
    val idf = log(lit(1.0d) +
      (col("n_docs").cast("double") - col("df").cast("double") + lit(0.5d)) /
        (col("df").cast("double") + lit(0.5d)))
    val stf = col("tf").cast("double") * lit(k1 + 1.0d) /
      (col("tf").cast("double") +
        lit(k1) * (lit(1.0d - b) + lit(b) * col("dl").cast("double") / avgdl))
    e.select(col("doc_id"), (idf * stf).as("s"))
      .groupBy(col("doc_id"))
      .agg(sum(col("s")).as("score"))
  }

  /** Top-k documents by BM25 score (ties → lowest doc_id). */
  def topK(docs: DataFrame, terms: Seq[String], k: Int = 10,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    scores(docs, terms, idCol, textCol)
      .withColumn("rank", row_number().over(
        Window.orderBy(desc("score"), asc("doc_id"))))
      .filter(col("rank") <= k)
  }
}
