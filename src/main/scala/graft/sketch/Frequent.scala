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
    val spark = df.sparkSession
    import spark.implicits._
    frequentKeys(df, key, Seq(minFreq).toDF("min_freq"), depth, width)
  }

  /** As above, with the threshold supplied as a 1×1 DataFrame with a
    * single `min_freq` column — lets a caller derive the threshold
    * from the data ("tokens in ≥5% of docs") INSIDE the plan, so the
    * whole query stays one lazy job with no driver-side count().
    * The two uses below are 1×1 scalar-summary combines, not data
    * cross joins (the Mixture.applyPlan pattern). */
  def frequentKeys(df: DataFrame, key: Column, minFreq: DataFrame,
      depth: Int, width: Int): DataFrame = {
    val stream = df.select(key.cast("string").as("k"))
    val regs = Cms.registers(stream, col("k"), depth, width)
    val candidates = Cms.estimate(regs, stream.distinct(), "k", depth, width)
      .crossJoin(minFreq)
      .filter(col("est") >= col("min_freq"))
      .select(col("k"))
    // No broadcast() hint: with a low minFreq or heavy collision rate
    // (width is finite) the CMS candidate SUPERSET can be large; let
    // AQE pick broadcast vs shuffle from the candidates' actual size.
    stream
      .join(candidates, Seq("k"), "left_semi")
      .groupBy(col("k"))
      .agg(count(lit(1)).as("freq"))
      .crossJoin(minFreq)
      .filter(col("freq") >= col("min_freq"))
      .drop("min_freq")
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

  /** Tokens in at least `minDocFrac` of ALL documents — the relative
    * form of [[frequentTokens]]. The corpus-count threshold is folded
    * into the plan as a 1×1 scalar summary, so the whole query is one
    * lazy job (no driver-side `docs.count()`). */
  def frequentTokensFrac(docs: DataFrame, minDocFrac: Double,
      idCol: String = "doc_id", textCol: String = "text",
      depth: Int = 4, width: Int = 512): DataFrame =
    frequentKeys(
      docs.select(col(idCol).as("id"),
          explode(array_distinct(TextOps.tokens(col(textCol)))).as("token"))
        .filter(col("token") =!= ""),
      col("token"),
      docs.agg(ceil(count(lit(1)) * minDocFrac).cast("long")
        .as("min_freq")),
      depth, width)
      .select(col("k").as("token"), col("freq").as("doc_freq"))
}
