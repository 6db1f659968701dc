package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Document-level token CO-OCCURRENCE counts with exact PMI components
  * — the statistics feeding collocation mining and embedding/word2vec
  * corpus prep. PMI itself is log((n_ab·N)/(n_a·n_b)); logs are FP and
  * not bit-reproducible, so the operator emits the EXACT integer
  * components (n_ab, n_a, n_b — document frequencies, plus N from the
  * caller) and leaves the division/log to the consumer — the same
  * exact-components discipline as TF-IDF (spec) and the regression
  * gate (q87).
  *
  * Scale guards, in order:
  *  - only tokens inside the [minDf, maxDf] document-frequency band
  *    pair up. The upper bound is the critical one: stopwords co-occur
  *    with everything, and a doc with T band-tokens emits C(T,2) pairs —
  *    capping df caps T and keeps the self-join linear-ish;
  *  - pairs below `minPairCount` are dropped after one hash
  *    aggregation (the long pair tail never leaves the first shuffle).
  */
object Cooccur {

  /** (t1 < t2, n_ab, n_a, n_b) over distinct per-doc tokens. */
  def pmiComponents(docs: DataFrame, minDf: Long, maxDf: Long,
      minPairCount: Long = 2, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val toks = docs.select(col(idCol).as("id"),
        explode(array_distinct(TextOps.tokens(col(textCol)))).as("token"))
      .filter(col("token") =!= "")
    // document frequency via a partition-only window (one shuffle on
    // token), band filter before any pairing
    val band = toks.withColumn("df",
        count(lit(1)).over(Window.partitionBy(col("token"))))
      .filter(col("df") >= minDf && col("df") <= maxDf)
    val pairs = band.as("a").join(band.as("b"),
        col("a.id") === col("b.id") && col("a.token") < col("b.token"))
      .groupBy(col("a.token").as("t1"), col("b.token").as("t2"))
      .agg(count(lit(1)).as("n_ab"),
        // every row of one (t1,t2) group carries the same dfs
        first(col("a.df")).as("n_a"), first(col("b.df")).as("n_b"))
      .filter(col("n_ab") >= minPairCount)
    pairs.select(col("t1"), col("t2"), col("n_ab"),
      col("n_a").cast("long").as("n_a"), col("n_b").cast("long").as("n_b"))
  }
}
