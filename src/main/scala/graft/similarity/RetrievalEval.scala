package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.time.Buckets.intDiv

/** Exact retrieval-quality metrics for a ranked result table against a
  * relevance (qrels) table — the evaluation lane every RAG / semantic
  * index deployment runs next to its ANN search (MRR, precision@k,
  * recall@k; Voorhees 1999 for MRR as the TREC standard). All gate
  * metrics are exact scaled integers (micro = ×10⁻⁶ via truncating
  * division); nDCG — inherently float via the log discount — is the
  * spec-checked FP consumer, not hash-gate material.
  *
  * Scale shape: results are (qid, nid, rank) — |Q|·k rows; qrels are
  * (qid, nid). Everything is ONE equi-join on (qid, nid) plus
  * per-qid hash aggregates: no corpus-sized structure, no window over
  * anything bigger than the result table itself.
  */
object RetrievalEval {

  /** Per-query metrics: (qid, n_rel_topk, n_rel_total, first_rel_rank
    * — 0 when no relevant doc made top-k, rr_micro = ⌊10⁶ /
    * first_rel_rank⌋, precision_ppm over k, recall_ppm over the
    * query's total relevant count). Queries with results but NO qrels
    * row report zeros (n_rel_total = 0 ⇒ recall 0 by convention). */
  def perQuery(results: DataFrame, rels: DataFrame, k: Int): DataFrame = {
    require(k >= 1, s"bad k=$k")
    val r = results.select(col("qid"), col("nid"), col("rank"))
      .filter(col("rank") <= k)
    // Defensive distinct: a duplicated qrels row would multiply the
    // left join below and double-count hits.
    val q = rels.select(col("qid"), col("nid")).distinct()
      .withColumn("__rel", lit(1L))
    val relTotals = q.groupBy(col("qid"))
      .agg(count(lit(1)).as("n_rel_total"))
    val hits = r.join(q, Seq("qid", "nid"), "left")
      .groupBy(col("qid"))
      .agg(sum(coalesce(col("__rel"), lit(0L))).as("n_rel_topk"),
        min(when(col("__rel").isNotNull, col("rank"))).as("__first"))
    hits.join(relTotals, Seq("qid"), "left")
      .select(col("qid"), col("n_rel_topk"),
        coalesce(col("n_rel_total"), lit(0L)).as("n_rel_total"),
        coalesce(col("__first"), lit(0L)).as("first_rel_rank"),
        when(col("__first").isNotNull, intDiv(lit(1000000L), col("__first")))
          .otherwise(lit(0L)).as("rr_micro"),
        intDiv(col("n_rel_topk") * 1000000L, lit(k.toLong))
          .as("precision_ppm"),
        when(coalesce(col("n_rel_total"), lit(0L)) > 0L,
          intDiv(col("n_rel_topk") * 1000000L, col("n_rel_total")))
          .otherwise(lit(0L)).as("recall_ppm"))
  }

  /** The SCALE lane of the eval's RESULTS side: rank with
    * [[Similarity.ivfTopK]]'s probe-pruned search instead of the brute
    * O(Q·N) scan and feed the same [[perQuery]] metrics. The brute
    * lane is the exact audit (linear in the collection by
    * construction — the r14 100× sweep measured it at 246 s); this
    * lane's cost follows the `nprobe` probed-list size, not the
    * corpus, and its metrics equal the brute lane's whenever the
    * probed lists contain the true top-k (spec-pinned on clustered
    * data — SimilaritySpec). */
  def perQueryIvf(embeddings: DataFrame, rels: DataFrame, k: Int,
      nprobe: Int = 2, centroidStride: Int = 50,
      idCol: String = "vec_id", vecCol: String = "embedding",
      maxQueryId: Long = Long.MaxValue): DataFrame =
    perQuery(Similarity.ivfTopK(embeddings, k, nprobe, centroidStride,
      idCol, vecCol, maxQueryId), rels, k)

  /** One-row rollup of [[perQuery]]: exact integer means (truncating)
    * of rr/precision/recall micros plus query and hit counts — the
    * number an index release publishes as "MRR@k". An EMPTY perQuery
    * frame yields the well-defined zero row (0 queries, 0 hits, all
    * means 0), never NULL metrics — sums coalesce to 0 and the
    * divisor floors at 1, the zero convention used elsewhere here. */
  def summary(per: DataFrame): DataFrame =
    per.agg(count(lit(1)).as("n_queries"),
      coalesce(sum(col("n_rel_topk")), lit(0L)).as("n_hits"),
      intDiv(coalesce(sum(col("rr_micro")), lit(0L)),
        greatest(count(lit(1)), lit(1L))).as("mean_rr_micro"),
      intDiv(coalesce(sum(col("precision_ppm")), lit(0L)),
        greatest(count(lit(1)), lit(1L))).as("mean_precision_ppm"),
      intDiv(coalesce(sum(col("recall_ppm")), lit(0L)),
        greatest(count(lit(1)), lit(1L))).as("mean_recall_ppm"))

  /** nDCG@k per query — the graded-relevance metric, FP by nature
    * (log₂ discount): DCG = Σ rel_i / log₂(rank_i + 1) over the top-k,
    * IDCG = the same sum over min(k, n_rel_total) perfect ranks.
    * Spec-checked consumer; binary relevance (rel_i = 1 when the
    * (qid, nid) pair is in qrels). */
  def ndcg(results: DataFrame, rels: DataFrame, k: Int): DataFrame = {
    val r = results.select(col("qid"), col("nid"), col("rank"))
      .filter(col("rank") <= k)
    // Same defensive distinct as perQuery — duplicated qrels rows would
    // double a hit's discount AND inflate IDCG's relevant count.
    val q = rels.select(col("qid"), col("nid")).distinct()
      .withColumn("__rel", lit(1))
    val dcg = r.join(q, Seq("qid", "nid"), "left")
      .groupBy(col("qid"))
      .agg(sum(when(col("__rel").isNotNull,
        lit(1.0) / log2(col("rank") + 1)).otherwise(lit(0.0))).as("dcg"))
    val idcg = q.groupBy(col("qid"))
      .agg(count(lit(1)).as("n_rel"))
      .select(col("qid"), aggregate(
        sequence(lit(1L), least(col("n_rel"), lit(k.toLong))),
        lit(0.0),
        (acc, i) => acc + lit(1.0) / log2(i.cast("double") + 1))
        .as("idcg"))
    dcg.join(idcg, Seq("qid"), "left")
      .select(col("qid"), col("dcg"),
        coalesce(col("idcg"), lit(0.0)).as("idcg"),
        when(coalesce(col("idcg"), lit(0.0)) > 0.0,
          col("dcg") / col("idcg")).otherwise(lit(0.0)).as("ndcg"))
  }
}
