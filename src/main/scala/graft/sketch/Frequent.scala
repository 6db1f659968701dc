package graft.sketch

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.text.TextOps

/** Exact heavy hitters at stream scale: a [[Cms]] candidate pass
  * followed by an exact count of the candidates only.
  *
  * The classic two-pass trick (Cormode & Hadjieleftheriou 2008 survey):
  * CMS estimates NEVER undercount, so `est ≥ threshold` yields a
  * SUPERSET of the true frequent items — a few sketch collisions, never
  * a miss. The exact pass then counts only that candidate set via a
  * broadcast semi-join, so the expensive full-fidelity aggregation runs
  * over a tiny fraction of the key space. Output is EXACT (the
  * correctness gate hash-matches a plain GROUP BY ... HAVING oracle);
  * the sketch only bounds the work.
  *
  * At 100 TB: pass 1 shuffles ≤ depth×width register rows; pass 2
  * shuffles only rows whose key survives the broadcast candidate
  * filter. A direct groupBy over all keys would shuffle the full key
  * space — the usual vocabulary long tail — to find the handful of
  * frequent ones.
  */
object Frequent {

  /** Exact keys with frequency ≥ `minFreq` in the stream of `key`
    * values, CMS-pruned as above. Returns (key, freq), exact. */
  def frequentKeys(df: DataFrame, key: Column, minFreq: Long,
      depth: Int = 4, width: Int = 512): DataFrame = {
    val stream = df.select(key.cast("string").as("k"))
    val regs = Cms.registers(stream, col("k"), depth, width)
    val candidates = Cms.estimate(regs, stream.distinct(), "k", depth, width)
      .filter(col("est") >= minFreq)
      .select(col("k"))
    // No broadcast() hint: with a low minFreq or heavy collision rate
    // (width is finite) the CMS candidate SUPERSET can be large; let
    // AQE pick broadcast vs shuffle from the candidates' actual size.
    stream
      .join(candidates, Seq("k"), "left_semi")
      .groupBy(col("k"))
      .agg(count(lit(1)).as("freq"))
      .filter(col("freq") >= minFreq)
  }

  /** Exact frequent TOKENS by document frequency: tokens appearing in
    * ≥ `minDocFreq` distinct documents — the vocabulary heavy-hitter
    * shape (stopword discovery, boilerplate tokens, contamination
    * markers). One distinct over (doc, token), then [[frequentKeys]]. */
  def frequentTokens(docs: DataFrame, minDocFreq: Long,
      idCol: String = "doc_id", textCol: String = "text",
      depth: Int = 4, width: Int = 512): DataFrame =
    frequentKeys(
      // array_distinct makes (doc, token) pairs unique with no shuffle
      docs.select(col(idCol).as("id"),
          explode(array_distinct(TextOps.tokens(col(textCol)))).as("token"))
        .filter(col("token") =!= ""),
      col("token"), minDocFreq, depth, width)
      .select(col("k").as("token"), col("freq").as("doc_freq"))
}
