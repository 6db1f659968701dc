package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Rank fusion for hybrid retrieval (Cormack et al. 2009, "Reciprocal
  * Rank Fusion outperforms Condorcet and individual Rank Learning
  * Methods"): merge several rankers' top-k lists — BM25 beside vector
  * search is the canonical pair — into one ranking that needs no score
  * calibration between systems, only their RANKS.
  *
  * RRF(d) = Σ_rankers 1/(k0 + rank_r(d)); stated integer-exactly as
  * Σ ⌊10⁶/(k0 + rank)⌋ ppm so the result is engine-independent (no FP
  * sums over ranker order) and oracle-hashable. One union + one
  * hash aggregation + one per-query rank window — nothing wider than
  * (qid, doc, rank) shuffles, candidates only (each ranker's top-k,
  * never the corpus). */
object Fusion {

  /** Fuse rankings (each: qid, nid, rank — 1-based, as every topK here
    * emits) into (qid, nid, rrf_ppm, rank). Docs missing from a ranker
    * contribute nothing for it (the standard convention). `k0` damps
    * rank-1 dominance; 60 is the paper's constant. Output rank ties →
    * lowest nid. */
  def rrfFuse(rankings: Seq[DataFrame], k0: Int = 60): DataFrame = {
    require(rankings.nonEmpty, "rrfFuse needs at least one ranking")
    import org.apache.spark.sql.expressions.Window
    val all = rankings.map(_.select(col("qid"), col("nid"),
      col("rank").cast("long").as("rank"))).reduce(_.unionByName(_))
    all.select(col("qid"), col("nid"),
        graft.time.Buckets.intDiv(lit(1000000L),
          lit(k0.toLong) + col("rank")).as("part"))
      .groupBy(col("qid"), col("nid"))
      .agg(sum(col("part")).as("rrf_ppm"))
      .withColumn("rank", row_number().over(
          Window.partitionBy(col("qid"))
            .orderBy(desc("rrf_ppm"), asc("nid")))
        .cast("long"))
  }
}
