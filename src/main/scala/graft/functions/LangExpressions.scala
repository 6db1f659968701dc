package graft.functions

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.graftshim.Shim.AbstractDataType

/** Static helper for [[PredictLang]] — one tokenizing pass per document
  * in a tight JIT loop, called from generated code.
  *
  * Semantics are EXACTLY `TextOps.predictedLang`'s column form (which
  * the DuckDB oracle states with list_filter marker counts):
  * tokens = maximal [a-z0-9]+ runs of lower(text); score(lang) = number
  * of tokens equal to one of the lang's markers; result = CJK char
  * present → "zh", all scores 0 → "und", else argmax by
  * (score desc, lang asc). The column-expression argmax fold references
  * each accumulator three times per level, and conditional branches are
  * excluded from codegen common-subexpression elimination — so its
  * marker-count subtrees get RE-EVALUATED per reference (measured ~12×
  * this one-pass form on the documents corpus). */
object LangIdUtil {
  import graft.text.TextOps.langMarkers
  private val langs: Array[String] = langMarkers.keys.toArray.sorted
  // a marker can belong to SEVERAL languages ("la", "un" are both es
  // and fr) — map each token to every owning language index
  private val markerToLangs: java.util.HashMap[String, Array[Int]] = {
    val m = new java.util.HashMap[String, Array[Int]]()
    langs.zipWithIndex.foreach { case (l, i) =>
      langMarkers(l).foreach { tok =>
        val prev = m.get(tok)
        m.put(tok, if (prev == null) Array(i) else prev :+ i)
      }
    }
    m
  }
  private val und = UTF8String.fromString("und")
  private val zh = UTF8String.fromString("zh")
  private val langU: Array[UTF8String] = langs.map(UTF8String.fromString)

  def predict(s: UTF8String): UTF8String = {
    val str = s.toString
    val n = str.length
    val counts = new Array[Int](langs.length)
    val sb = new java.lang.StringBuilder(16)
    var i = 0
    while (i < n) {
      val c = str.charAt(i)
      if (c >= 0x4e00 && c <= 0x9fff) return zh
      val lc = Character.toLowerCase(c)
      if ((lc >= 'a' && lc <= 'z') || (lc >= '0' && lc <= '9')) {
        sb.append(lc)
      } else if (sb.length > 0) {
        val idx = markerToLangs.get(sb.toString)
        if (idx != null) { var k = 0; while (k < idx.length) { counts(idx(k)) += 1; k += 1 } }
        sb.setLength(0)
      }
      i += 1
    }
    if (sb.length > 0) {
      val idx = markerToLangs.get(sb.toString)
      if (idx != null) { var k = 0; while (k < idx.length) { counts(idx(k)) += 1; k += 1 } }
    }
    var best = 0
    var bi = -1
    var j = 0
    while (j < counts.length) {
      if (counts(j) > best) { best = counts(j); bi = j }
      j += 1
    }
    if (bi < 0) und else langU(bi)
  }
}

/** Marker-count language ID as a native codegen Catalyst expression —
  * the hot-loop twin of `TextOps.predictedLang` (kept as the
  * column-form parity oracle; LangIdSpec compares them row-for-row). */
case class PredictLang(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override val nullIntolerant: Boolean = true
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = "predict_lang"

  override protected def nullSafeEval(input: Any): Any =
    LangIdUtil.predict(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.LangIdUtil.predict($c)")

  override protected def withNewChildInternal(newChild: Expression): PredictLang =
    copy(child = newChild)
}
