package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
  * "Data Selection for Language Models via Importance Resampling"):
  * score every raw document by how target-like its hashed n-gram
  * feature distribution is, then Gumbel-top-k resample proportionally
  * to the importance weight. The standard recipe for carving a
  * high-quality pre-training subset out of a web-scale crawl given a
  * small trusted target corpus (e.g. Wikipedia+books).
  *
  * Decomposition here mirrors the CCNet/q120 discipline — everything
  * the DISTRIBUTED engine must get right is integer-exact and
  * oracle-hashable, floating point enters only in the final per-doc
  * scoring fold:
  *
  *  - features = word bigrams hashed into `numBuckets` buckets via the
  *    first 8 md5 hex chars (md5 is bit-identical across engines, so
  *    the oracle states the same bucketing verbatim — the same
  *    cross-engine trick as q119's hash draws);
  *  - [[model]] = per-bucket occurrence counts over a corpus (the
  *    "hashed n-gram LM" of the paper, bucket-bounded ≪ corpus);
  *  - [[components]] = the per-(doc, bucket) join of a document's
  *    occurrence counts against BOTH models — the complete integer
  *    sufficient statistic for the importance weight;
  *  - [[logWeights]] = log ŵ(x) = Σ_b n_x[b]·(log p̂_t[b] − log p̂_r[b])
  *    with add-α smoothing (float, engine-side, spec-checked);
  *  - [[resample]] = deterministic Gumbel top-k: sampling without
  *    replacement ∝ ŵ is exactly "order by log ŵ + Gumbel(0,1) desc,
  *    take k" (Vieira 2014), with the uniforms drawn from seeded md5
  *    hashes so the draw is reproducible under any partitioning.
  *
  * Scale shape: models are `numBuckets`-bounded (broadcastable at any
  * corpus size); the per-doc join is bucket-keyed; resample is one
  * TakeOrdered. No windows, no UDFs, corpus never shuffled on anything
  * wider than (doc, bucket).
  */
object Dsir {

  /** Hashed feature bucket in [0, numBuckets): first 8 md5 hex chars as
    * a BIGINT, mod buckets. Cross-engine exact (DuckDB:
    * ('0x' || substr(md5(gram), 1, 8))::BIGINT % numBuckets). */
  def featureBucket(gram: Column, numBuckets: Int): Column =
    conv(substring(md5(gram), 1, 8), 16, 10).cast("long") % numBuckets

  /** One row per bigram OCCURRENCE: (doc_id, bucket). The token array
    * is PROJECTED to a column before the gram lambda references it —
    * an inlined tokens() subtree inside the HOF would re-run the
    * tokenizing split per element_at (HOFs are CodegenFallback,
    * excluded from subexpression elimination — the [[TextOps
    * .predictedLang]] lesson). */
  def features(docs: DataFrame, numBuckets: Int,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs.select(col(idCol).as("doc_id"),
        TextOps.tokens(col(textCol)).as("t"))
      .filter(size(col("t")) >= 2)
      // codegen'd all-shingles (r16): ≡ the concat_ws∘element_at HOF
      // for non-null tokens under the size ≥ 2 guard
      .select(col("doc_id"),
        explode(graft.functions.TextExpressions
          .allWordShingles(col("t"), 2)).as("gram"))
      .select(col("doc_id"),
        featureBucket(col("gram"), numBuckets).as("bucket"))

  /** Hashed n-gram model of a corpus: (bucket, cnt) occurrence counts.
    * Bucket-bounded — at most `numBuckets` rows regardless of corpus
    * size, so it broadcasts. */
  def model(docs: DataFrame, numBuckets: Int,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    features(docs, numBuckets, idCol, textCol)
      .groupBy(col("bucket")).agg(count(lit(1)).as("cnt"))

  /** Integer sufficient statistics for the importance weight: one row
    * per (doc, bucket) the document touches — (doc_id, bucket, n_occ,
    * t_cnt, r_cnt) where n_occ is the document's occurrence count in
    * that bucket and t_cnt / r_cnt are the target / raw model counts
    * (0 where the model lacks the bucket). Docs with < 2 tokens emit no
    * rows (they carry no evidence either way — [[logWeights]] treats
    * them as log ŵ = 0). */
  def components(docs: DataFrame, targetModel: DataFrame,
      rawModel: DataFrame, numBuckets: Int,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val dc = features(docs, numBuckets, idCol, textCol)
      .groupBy(col("doc_id"), col("bucket"))
      .agg(count(lit(1)).as("n_occ"))
    dc.join(targetModel.select(col("bucket"), col("cnt").as("t_cnt")),
        Seq("bucket"), "left")
      .join(rawModel.select(col("bucket"), col("cnt").as("r_cnt")),
        Seq("bucket"), "left")
      .select(col("doc_id"), col("bucket"), col("n_occ"),
        coalesce(col("t_cnt"), lit(0L)).as("t_cnt"),
        coalesce(col("r_cnt"), lit(0L)).as("r_cnt"))
  }

  /** [[components]] for the SELF-curation shape — the target corpus is
    * a subset of `docs` selected by `targetPred` (a predicate over the
    * id column, e.g. a trusted-source flag): the corpus is tokenized
    * and hashed ONCE (persisted), and the per-doc counts, target model
    * and raw model all derive from that single pass instead of three
    * full explode+md5 scans. Result is identical to
    * components(docs, model(docs.filter(targetPred)), model(docs));
    * materialized before returning so the feature cache releases
    * eagerly. */
  def componentsSelf(docs: DataFrame, targetPred: Column, numBuckets: Int,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val feats = features(docs, numBuckets, idCol, textCol).persist()
    val dc = feats.groupBy(col("doc_id"), col("bucket"))
      .agg(count(lit(1)).as("n_occ"))
    val tm = feats.filter(targetPred)
      .groupBy(col("bucket")).agg(count(lit(1)).as("t_cnt"))
    val rm = feats.groupBy(col("bucket")).agg(count(lit(1)).as("r_cnt"))
    graft.util.Checkpoints.materialize(
      dc.join(tm, Seq("bucket"), "left")
        .join(rm, Seq("bucket"), "left")
        .select(col("doc_id"), col("bucket"), col("n_occ"),
          coalesce(col("t_cnt"), lit(0L)).as("t_cnt"),
          coalesce(col("r_cnt"), lit(0L)).as("r_cnt")),
      unpersistAfter = Seq(feats))
  }

  /** Per-doc log importance weight over a [[components]] frame:
    * log ŵ = Σ_b n_occ[b] · (log(t_cnt[b]+α) − log(T+αB)
    *                        − log(r_cnt[b]+α) + log(R+αB))
    * with add-α smoothing; T and R are the models' total occurrence
    * masses, combined in as 1×1 scalar frames (tiny-side cross — the
    * q83/q92 pattern, no eager driver action). Returns (doc_id, log_w).
    * Docs absent from `components` are absent here; [[resample]]
    * coalesces them to 0. */
  def logWeights(components: DataFrame, targetModel: DataFrame,
      rawModel: DataFrame, numBuckets: Int,
      alpha: Double = 0.5): DataFrame = {
    require(alpha > 0, s"alpha must be > 0 for smoothing, got $alpha")
    val tTot = targetModel.agg(
      coalesce(sum(col("cnt")), lit(0L)).as("t_total"))
    val rTot = rawModel.agg(
      coalesce(sum(col("cnt")), lit(0L)).as("r_total"))
    val aB = alpha * numBuckets
    components.crossJoin(tTot).crossJoin(rTot)
      .groupBy(col("doc_id"))
      .agg(sum(col("n_occ").cast("double") *
        (log(col("t_cnt").cast("double") + alpha) -
          log(col("t_total").cast("double") + aB) -
          log(col("r_cnt").cast("double") + alpha) +
          log(col("r_total").cast("double") + aB))).as("log_w"))
  }

  /** Deterministic Gumbel top-k resample: keep the k docs maximizing
    * log ŵ + g where g = −ln(−ln(u)) and u ∈ (0,1) is a seeded md5 hash
    * of the doc id — equivalent to sampling k docs without replacement
    * with probability ∝ ŵ (Gumbel-max trick), reproducible under any
    * partitioning. One distributed TakeOrdered, no global sort
    * materialized. Returns (doc_id, log_w, key) for the k keepers. */
  def resample(docs: DataFrame, weights: DataFrame, k: Int,
      seed: String = "dsir", idCol: String = "doc_id"): DataFrame = {
    val u = (conv(substring(md5(concat_ws("\u0000", lit(seed),
        col(idCol).cast("string"))), 1, 8), 16, 10).cast("double") + 1.0d) /
      4294967297.0d // (2^32 + 1): u ∈ (0, 1), never 0 or 1 exactly
    docs.select(col(idCol).as("doc_id"))
      .join(weights, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("log_w"), lit(0.0d)).as("log_w"))
      .withColumn("key", col("log_w") + -log(-log(u)))
      .orderBy(col("key").desc, col("doc_id"))
      .limit(k)
  }
}
