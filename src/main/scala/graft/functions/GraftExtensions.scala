package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions registration so graft's custom expressions are
  * callable from SQL:
  *
  *   spark.sql.extensions=graft.functions.GraftExtensions
  *   SELECT vector_dot(a, b) FROM ...
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("vector_dot"),
      GraftExtensions.vectorDotInfo,
      GraftExtensions.vectorDotBuilder))
    ext.injectFunction((
      FunctionIdentifier("nfc_normalize"),
      GraftExtensions.nfcInfo,
      GraftExtensions.nfcBuilder))
    ext.injectFunction((
      FunctionIdentifier("simhash60"),
      GraftExtensions.simhashInfo,
      GraftExtensions.simhashBuilder))
    ext.injectFunction((
      FunctionIdentifier("word_shingles"),
      GraftExtensions.shinglesInfo,
      GraftExtensions.shinglesBuilder))
    ext.injectFunction((
      FunctionIdentifier("predict_lang"),
      GraftExtensions.predictLangInfo,
      GraftExtensions.predictLangBuilder))
    ext.injectFunction((
      FunctionIdentifier("pii_redact"),
      GraftExtensions.piiRedactInfo,
      GraftExtensions.piiRedactBuilder))
    ext.injectFunction((
      FunctionIdentifier("collect_capped"),
      GraftExtensions.collectCappedInfo,
      GraftExtensions.collectCappedBuilder))
    // top-1-per-group window → max_by/min_by hash aggregation
    ext.injectOptimizerRule(_ => graft.plans.TopOneWindowToMaxBy)
  }
}

object GraftExtensions {
  private[functions] val vectorDotInfo =
    new ExpressionInfo(classOf[VectorDot].getName, "vector_dot")
  private[functions] val vectorDotBuilder: Seq[Expression] => Expression =
    children => {
      require(children.length == 2, "vector_dot requires exactly 2 arguments")
      VectorDot(children.head, children(1))
    }

  private[functions] val nfcInfo =
    new ExpressionInfo(classOf[NfcNormalize].getName, "nfc_normalize")
  private[functions] val nfcBuilder: Seq[Expression] => Expression =
    children => {
      require(children.length == 1, "nfc_normalize requires exactly 1 argument")
      NfcNormalize(children.head)
    }

  private[functions] val simhashInfo =
    new ExpressionInfo(classOf[SimHash60].getName, "simhash60")
  private[functions] val simhashBuilder: Seq[Expression] => Expression =
    children => {
      require(children.length == 1, "simhash60 requires exactly 1 argument")
      SimHash60(children.head)
    }

  private[functions] val predictLangInfo =
    new ExpressionInfo(classOf[PredictLang].getName, "predict_lang")
  private[functions] val predictLangBuilder: Seq[Expression] => Expression =
    children => {
      require(children.length == 1, "predict_lang requires exactly 1 argument")
      PredictLang(children.head)
    }

  private[functions] val shinglesInfo =
    new ExpressionInfo(classOf[WordShingles].getName, "word_shingles")
  private[functions] val shinglesBuilder: Seq[Expression] => Expression =
    children => {
      require(children.length == 2,
        "word_shingles requires (tokens, k) arguments")
      val k = children(1) match {
        case org.apache.spark.sql.catalyst.expressions.Literal(v, _)
            if v != null => v.toString.toInt
        case other => throw new IllegalArgumentException(
          s"word_shingles k must be an integer literal, got $other")
      }
      WordShingles(children.head, k)
    }

  private[functions] val piiRedactInfo = new ExpressionInfo(
    classOf[org.apache.spark.sql.catalyst.expressions.RegExpReplace]
      .getName, "pii_redact")
  /** `pii_redact(text)` — [[graft.text.Pii.redact]]'s chained
    * email→IP→phone replacement as a SQL-callable composition of the
    * native codegen RegExpReplace. */
  private[functions] val piiRedactBuilder: Seq[Expression] => Expression =
    children => {
      require(children.length == 1, "pii_redact requires exactly 1 argument")
      import org.apache.spark.sql.catalyst.expressions.{Literal, RegExpReplace}
      def rep(e: Expression, re: String, r: String): Expression =
        new RegExpReplace(e, Literal(re), Literal(r))
      rep(rep(rep(children.head,
        graft.text.Pii.EmailRe, "<EMAIL>"),
        graft.text.Pii.Ipv4Re, "<IP>"),
        graft.text.Pii.PhoneRe, "<PHONE>")
    }

  private[functions] val collectCappedInfo =
    new ExpressionInfo(classOf[CollectCapped].getName, "collect_capped")
  /** `collect_capped(e, cap)` — bounded-memory grouped collection:
    * array_agg(e) when the group has ≤ cap non-null elements, else
    * NULL; partial buffers never hold more than cap elements. */
  private[functions] val collectCappedBuilder: Seq[Expression] => Expression =
    children => {
      require(children.length == 2,
        "collect_capped requires (expr, cap) arguments")
      val cap = children(1) match {
        case org.apache.spark.sql.catalyst.expressions.Literal(v, _)
            if v != null => v.toString.toInt
        case other => throw new IllegalArgumentException(
          s"collect_capped cap must be an integer literal, got $other")
      }
      CollectCapped(children.head, cap).toAggregateExpression()
    }

  /** Register into an already-built session (config-based extensions
    * only apply at build time). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    org.apache.spark.sql.graftshim.Shim.registerFunction(
      spark, "vector_dot", vectorDotInfo, vectorDotBuilder)
    org.apache.spark.sql.graftshim.Shim.registerFunction(
      spark, "nfc_normalize", nfcInfo, nfcBuilder)
    org.apache.spark.sql.graftshim.Shim.registerFunction(
      spark, "simhash60", simhashInfo, simhashBuilder)
    org.apache.spark.sql.graftshim.Shim.registerFunction(
      spark, "word_shingles", shinglesInfo, shinglesBuilder)
    org.apache.spark.sql.graftshim.Shim.registerFunction(
      spark, "predict_lang", predictLangInfo, predictLangBuilder)
    org.apache.spark.sql.graftshim.Shim.registerFunction(
      spark, "pii_redact", piiRedactInfo, piiRedactBuilder)
    org.apache.spark.sql.graftshim.Shim.registerFunction(
      spark, "collect_capped", collectCappedInfo, collectCappedBuilder)
    if (!spark.experimental.extraOptimizations
        .contains(graft.plans.TopOneWindowToMaxBy))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+
          graft.plans.TopOneWindowToMaxBy
  }
}
