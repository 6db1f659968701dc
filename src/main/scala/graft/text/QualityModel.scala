package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Model-based quality filtering at scale — the "apply a learned quality
  * classifier to every document" pipeline stage (the fasttext-filter
  * shape from GPT-3/CCNet), restricted to an INTEGER linear model so the
  * keep/drop decision is exact on every engine and partitioning: integer
  * features, integer weights, and a per-token threshold compared by
  * cross-multiplication — no floating point anywhere in the decision.
  *
  * Scoring is one stateless projection (codegen expressions only), so it
  * composes with scan pruning and survives any re-partitioning at 100 TB.
  */
object QualityModel {

  /** Feature names, fixed order: token count, distinct-token count,
    * stopword hits, digit characters, text length. */
  val FeatureNames: Seq[String] =
    Seq("f_tok", "f_uniq", "f_stop", "f_digit", "f_chars")

  /** Unaliased feature expressions by name. */
  private def rawFeatures(text: Column): Map[String, Column] = {
    val toks = TextOps.tokens(text)
    Map(
      "f_tok" -> size(toks).cast("long"),
      "f_uniq" -> size(array_distinct(toks)).cast("long"),
      "f_stop" -> size(filter(toks, t =>
        t.isin(TextOps.enStopwords.map(x => x: Any): _*))).cast("long"),
      "f_digit" -> (length(text) -
        length(regexp_replace(text, "[0-9]", ""))).cast("long"),
      "f_chars" -> length(text).cast("long"))
  }

  /** Integer feature columns per document. */
  def featureColumns(text: Column): Seq[Column] = {
    val raw = rawFeatures(text)
    FeatureNames.map(n => raw(n).as(n))
  }

  /** The linear score as a single column expression — for composing
    * into arbitrary (incl. streaming) frames without the [[features]]
    * projection. */
  def scoreColumn(text: Column, weights: Map[String, Long],
      bias: Long = 0L): Column = {
    val unknown = weights.keySet -- FeatureNames.toSet
    require(unknown.isEmpty, s"unknown feature weights: $unknown")
    val raw = rawFeatures(text)
    weights.foldLeft(lit(bias): Column) { case (acc, (k, w)) =>
      acc + raw(k) * lit(w)
    }
  }

  /** The keep decision as a single column expression (see
    * [[scoreLinear]] for the semantics). */
  def keepColumn(text: Column, weights: Map[String, Long],
      bias: Long = 0L, thresholdPpm: Long = 0L): Column =
    scoreColumn(text, weights, bias) * 1000000L >=
      lit(thresholdPpm) * greatest(rawFeatures(text)("f_tok"), lit(1L))

  /** (doc_id, f_tok, f_uniq, f_stop, f_digit, f_chars). */
  def features(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    docs.select(col(idCol).as("doc_id") +: featureColumns(col(textCol)): _*)

  /** Linear score + keep decision: score = bias + Σ w_f · f, and
    * keep ⇔ score · 10⁶ ≥ thresholdPpm · max(f_tok, 1) — i.e. the
    * per-token normalized score clears the threshold, decided entirely
    * in integers. Unknown weight keys are rejected eagerly. Returns
    * (doc_id, score, keep). */
  def scoreLinear(docs: DataFrame, weights: Map[String, Long],
      bias: Long = 0L, thresholdPpm: Long = 0L,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val unknown = weights.keySet -- FeatureNames.toSet
    require(unknown.isEmpty, s"unknown feature weights: $unknown")
    val f = features(docs, idCol, textCol)
    val score = weights.foldLeft(lit(bias): Column) { case (acc, (k, w)) =>
      acc + col(k) * lit(w)
    }
    f.select(col("doc_id"), score.as("score"),
        col("f_tok").as("f_tok"))
      .select(col("doc_id"), col("score"),
        (col("score") * 1000000L >=
          lit(thresholdPpm) * greatest(col("f_tok"), lit(1L))).as("keep"))
  }
}
