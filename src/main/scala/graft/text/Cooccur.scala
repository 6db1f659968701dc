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

  /** [[pmiComponents]] with corpus-RELATIVE bands: the df band and pair
    * floor are fractions of the document count, computed INSIDE the
    * plan as a 1×1 scalar summary (ceil/floor to match the absolute
    * form exactly) — one lazy job, no driver-side `docs.count()`.
    * Thresholds relative to corpus size make the operator
    * scale-invariant: the same fractions hold at sf0.01 and 100 TB. */
  def pmiComponentsFrac(docs: DataFrame, minDfFrac: Double,
      maxDfFrac: Double, minPairFrac: Double, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val thr = docs.agg(
      ceil(count(lit(1)) * minDfFrac).cast("long").as("min_df"),
      floor(count(lit(1)) * maxDfFrac).cast("long").as("max_df"),
      ceil(count(lit(1)) * minPairFrac).cast("long").as("min_pair"))
    val toks = docs.select(col(idCol).as("id"),
        explode(array_distinct(TextOps.tokens(col(textCol)))).as("token"))
      .filter(col("token") =!= "")
    val band = toks.withColumn("df",
        count(lit(1)).over(Window.partitionBy(col("token"))))
      .crossJoin(thr) // 1×1 scalar combine, not a data cross join
      .filter(col("df") >= col("min_df") && col("df") <= col("max_df"))
      .drop("min_df", "max_df", "min_pair")
    val pairs = band.as("a").join(band.as("b"),
        col("a.id") === col("b.id") && col("a.token") < col("b.token"))
      .groupBy(col("a.token").as("t1"), col("b.token").as("t2"))
      .agg(count(lit(1)).as("n_ab"),
        first(col("a.df")).as("n_a"), first(col("b.df")).as("n_b"))
      .crossJoin(thr.select(col("min_pair")))
      .filter(col("n_ab") >= col("min_pair"))
    pairs.select(col("t1"), col("t2"), col("n_ab"),
      col("n_a").cast("long").as("n_a"), col("n_b").cast("long").as("n_b"))
  }
}
