package graft.functions

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.graftshim.Shim.AbstractDataType
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused single-pass twins of the chained-regexp HTML operators in
  * [[graft.text.Html]] — hand-rolled scanners the generated code calls
  * statically, replacing ~11 `regexp_replace` passes (each a full
  * automaton run PLUS a full string copy per document) with one walk.
  * The r14 100× artifact measured the chained class as the dominant
  * per-doc CPU of the web-prep gates (q144 154 s at 100×, q132/q166
  * same family); the scanners exist purely for that constant factor —
  * the SEMANTICS are pinned to the chained form byte-for-byte, because
  * the DuckDB oracles state the chained passes verbatim.
  *
  * Byte-parity is subtle and deliberate. The chained form is a
  * SEQUENCE of global passes (script blocks → style blocks → comments
  * → tags → entities in table order → whitespace collapse + trim),
  * and pass N runs on pass N-1's output, so pass order is observable:
  *  - a `<style>` whose only closer sits inside an EARLIER-removed
  *    script span is unterminated after the script pass (`<style>`
  *    `<script></style>X</script>Y` extracts "Y", not "X Y") — the
  *    scanner therefore resolves spans in pass priority: script spans
  *    first on raw text, style spans skipping script spans, comment
  *    spans skipping both;
  *  - a generic tag's `>` must be sought in BLOCK-STRIPPED text (its
  *    span may swallow whole removed blocks);
  *  - replacements glue with a ' ' between, so no pattern (every
  *    opener/closer/entity literal is space-free) can match across a
  *    removed span — which is what makes the single pass exact;
  *  - entity literals all start with '&' and differ at their second
  *    character, and only the LAST pass (&amp;) emits a '&', so
  *    positional first-match equals the sequential passes.
  * HtmlSpec pins fused == chained on the adversarial corpus AND on
  * randomized fragment soup; the q132/q144/q166 gates pin it against
  * DuckDB's chained SQL on real data.
  */
object HtmlUtil {

  /** The literal character class of [[graft.text.Html.WsRe]]. */
  private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\r' || c == '\n' || c == '\f' ||
      c == '\u000B' || c == '\u0085' || c == '\u00A0' || c == '\u1680' ||
      (c >= '\u2000' && c <= '\u200A') || c == '\u2028' ||
      c == '\u2029' || c == '\u202F' || c == '\u205F' || c == '\u3000'


  /** `[ \t\r\n]` — the explicit class the anchor/href patterns use. */
  private def isTagWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\r' || c == '\n'

  private def isWordChar(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
      (c >= '0' && c <= '9') || c == '_'

  /** Case-insensitive ASCII region match against a lowercase literal. */
  private def matchesIC(s: String, pos: Int, lit: String): Boolean = {
    if (pos + lit.length > s.length) return false
    var i = 0
    while (i < lit.length) {
      val c = s.charAt(pos + i)
      val lc = if (c >= 'A' && c <= 'Z') (c + 32).toChar else c
      if (lc != lit.charAt(i)) return false
      i += 1
    }
    true
  }

  /** First hole (sorted, disjoint) containing `p`, else -1 (index). */
  private def holeAt(holes: ArrayBuffer[Int], p: Int): Int = {
    // holes is flat [s0,e0,s1,e1,...]; binary search on starts
    var lo = 0
    var hi = holes.length / 2 - 1
    while (lo <= hi) {
      val mid = (lo + hi) >>> 1
      if (holes(2 * mid) <= p && p < holes(2 * mid + 1)) return mid
      else if (p < holes(2 * mid)) hi = mid - 1
      else lo = mid + 1
    }
    -1
  }

  /** Left-to-right non-greedy block spans: open literal (with `\b`
    * when the regex has one) to the FIRST closer, both sought outside
    * the given holes — exactly the pass-N-sees-pass-N-1's-output
    * semantics of the chained form. Returns flat [s,e,...] pairs. */
  private def findSpans(s: String, openLit: String, closeLit: String,
      wordBoundary: Boolean, holes: ArrayBuffer[Int]): ArrayBuffer[Int] = {
    val out = ArrayBuffer.empty[Int]
    val n = s.length
    var pos = 0
    while (pos < n) {
      if (s.charAt(pos) == '<' && holeAt(holes, pos) < 0 &&
          matchesIC(s, pos, openLit) &&
          (!wordBoundary || pos + openLit.length >= n ||
            !isWordChar(s.charAt(pos + openLit.length)))) {
        var q = pos + openLit.length
        var closeAt = -1
        while (q < n && closeAt < 0) {
          val h = holeAt(holes, q)
          if (h >= 0) q = holes(2 * h + 1)
          else if (matchesIC(s, q, closeLit)) closeAt = q
          else q += 1
        }
        if (closeAt >= 0) {
          out += pos
          out += closeAt + closeLit.length
          pos = closeAt + closeLit.length
        } else {
          // no closer anywhere outside holes => no further spans of
          // this kind can match either (their closer would be here)
          return out
        }
      } else pos += 1
    }
    out
  }

  /** Effective removed spans for [[extractText]]: script on raw text,
    * style skipping script, comments skipping both; nested spans
    * folded into their container (overlaps are always containment —
    * openers are skipped inside holes and closers sought outside
    * them). Flat sorted disjoint [s,e,...]. */
  private def removedSpans(s: String): ArrayBuffer[Int] = {
    val script = findSpans(s, "<script", "</script>", true,
      ArrayBuffer.empty)
    val style = findSpans(s, "<style", "</style>", true, script)
    val both = merge(script, style)
    val comment = findSpans(s, "<!--", "-->", false, both)
    merge(both, comment)
  }

  /** Merge two flat sorted span lists, dropping contained spans. */
  private def merge(a: ArrayBuffer[Int], b: ArrayBuffer[Int])
      : ArrayBuffer[Int] = {
    val out = ArrayBuffer.empty[Int]
    var i = 0
    var j = 0
    var curEnd = -1
    while (i < a.length || j < b.length) {
      val takeA = j >= b.length || (i < a.length && a(i) <= b(j))
      val (st, en) = if (takeA) { val r = (a(i), a(i + 1)); i += 2; r }
        else { val r = (b(j), b(j + 1)); j += 2; r }
      if (st >= curEnd) { out += st; out += en; curEnd = en }
    }
    out
  }

  /** Entity table of [[graft.text.Html.Entities]] as parallel arrays
    * (order preserved; second characters are pairwise distinct, which
    * is what licenses positional matching). */
  private val EntityLits =
    Array("&lt;", "&gt;", "&quot;", "&#39;", "&nbsp;", "&amp;")
  private val EntityReps = Array('<', '>', '"', '\'', ' ', '&')

  /** Entity index matching at `pos` bounded by `until`, else -1. */
  private def entityAt(s: String, pos: Int, until: Int): Int = {
    var e = 0
    while (e < EntityLits.length) {
      val lit = EntityLits(e)
      if (pos + lit.length <= until && s.startsWith(lit, pos)) return e
      e += 1
    }
    -1
  }

  /** Fused [[graft.text.Html.extractText]]: strip script/style/comment
    * blocks and tags, decode entities, collapse whitespace, trim — one
    * walk, byte-identical to the chained passes. */
  def extractText(in: UTF8String): UTF8String = {
    val s = in.toString
    val n = s.length
    val spans = removedSpans(s)
    val sb = new java.lang.StringBuilder(math.min(n, 1 << 16))
    var pending = false
    def emitWs(): Unit = if (sb.length > 0) pending = true
    def emitChar(c: Char): Unit = {
      if (pending) { sb.append(' '); pending = false }
      sb.append(c)
    }
    var pos = 0
    var si = 0 // next span index (into flat pairs)
    while (pos < n) {
      if (2 * si < spans.length && pos == spans(2 * si)) {
        emitWs(); pos = spans(2 * si + 1); si += 1
      } else {
        val c = s.charAt(pos)
        if (c == '<') {
          // generic tag: first '>' in BLOCK-STRIPPED text (skip spans)
          var q = pos + 1
          var sj = si
          var close = -1
          while (q < n && close < 0) {
            if (2 * sj < spans.length && q == spans(2 * sj)) {
              q = spans(2 * sj + 1); sj += 1
            } else if (s.charAt(q) == '>') close = q
            else q += 1
          }
          if (close >= 0) { emitWs(); pos = close + 1; si = sj }
          else { emitChar('<'); pos += 1 }
        } else if (c == '&') {
          val e = entityAt(s, pos, n)
          if (e >= 0) {
            val rep = EntityReps(e)
            if (rep == ' ') emitWs() else emitChar(rep)
            pos += EntityLits(e).length
          } else { emitChar('&'); pos += 1 }
        } else if (isWs(c)) { emitWs(); pos += 1 }
        else { emitChar(c); pos += 1 }
      }
    }
    UTF8String.fromString(sb.toString)
  }

  /** Block-tag names of [[graft.text.Html.BlockTagRe]] — prefix-free,
    * so at most one name matches with a trailing word boundary. */
  private val BlockNames = Array("p", "div", "section", "article",
    "main", "header", "footer", "nav", "aside", "ul", "ol", "li",
    "h1", "h2", "h3", "h4", "h5", "h6", "table", "tr", "td", "br")

  /** End index (exclusive) of a block tag starting at `pos`, or -1:
    * `<`, optional `/`, a name (case-insensitive) with `\b`, then
    * `[^>]*>`. */
  private def blockTagEnd(s: String, pos: Int): Int = {
    val n = s.length
    if (pos >= n || s.charAt(pos) != '<') return -1
    var p = pos + 1
    if (p < n && s.charAt(p) == '/') p += 1
    var name: String = null
    var b = 0
    while (b < BlockNames.length && name == null) {
      val cand = BlockNames(b)
      if (matchesIC(s, p, cand) &&
          (p + cand.length >= n || !isWordChar(s.charAt(p + cand.length))))
        name = cand
      b += 1
    }
    if (name == null) return -1
    var q = p + name.length
    while (q < n && s.charAt(q) != '>') q += 1
    if (q < n) q + 1 else -1
  }

  /** Collapsed-and-trimmed CODE POINT length of s[from, until) under
    * [[graft.text.Html.WsRe]] — the anchor-text weight. */
  private def collapsedLen(s: String, from: Int, until: Int): Int = {
    var cnt = 0
    var pending = false
    var i = from
    while (i < until) {
      val cp = s.codePointAt(i)
      val cc = Character.charCount(cp)
      if (cc == 1 && isWs(s.charAt(i))) { if (cnt > 0) pending = true }
      else {
        if (pending) { cnt += 1; pending = false }
        cnt += 1
      }
      i += cc
    }
    cnt
  }

  /** Anchor element match at `pos` bounded by `until` (the segment):
    * `<a` + one `[ \t\r\n]` + `[^>]*>` + `[^<]*` + `</a[ \t\r\n]*>`.
    * Returns (innerStart, innerEnd, matchEnd) packed, or null. */
  private def anchorAt(s: String, pos: Int, until: Int): Array[Int] = {
    if (pos + 3 > until) return null
    if (s.charAt(pos) != '<') return null
    val a = s.charAt(pos + 1)
    if (a != 'a' && a != 'A') return null
    if (!isTagWs(s.charAt(pos + 2))) return null
    var q = pos + 3
    while (q < until && s.charAt(q) != '>') q += 1
    if (q >= until) return null
    val innerStart = q + 1
    var k = innerStart
    while (k < until && s.charAt(k) != '<') k += 1
    if (k >= until) return null
    val innerEnd = k
    // `</a[ \t\r\n]*>`
    if (k + 3 > until) return null
    if (s.charAt(k + 1) != '/') return null
    val c2 = s.charAt(k + 2)
    if (c2 != 'a' && c2 != 'A') return null
    var m = k + 3
    while (m < until && isTagWs(s.charAt(m))) m += 1
    if (m >= until || s.charAt(m) != '>') return null
    Array(innerStart, innerEnd, m + 1)
  }

  private val NullRow: InternalRow =
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](null, null, null))

  /** Null-tolerant entry the generated code calls: the chained column
    * form yields struct(NULL, NULL, NULL) — a non-null struct — for
    * NULL html (struct() is not null-propagating), so the fused twin
    * must too. */
  def mainContentOrNull(in: UTF8String, minChars: Int,
      maxLinkDenom: Int): InternalRow =
    if (in == null) NullRow else mainContent(in, minChars, maxLinkDenom)

  /** Fused [[graft.text.Html.mainContent]]: split at block tags, clean
    * each segment (tag strip + entities + whitespace collapse + trim),
    * weigh its anchor text, keep long low-link-density blocks — one
    * walk + one anchor sub-scan per segment, byte-identical to the
    * chained split/transform/filter column form. */
  def mainContent(in: UTF8String, minChars: Int,
      maxLinkDenom: Int): InternalRow = {
    val s = in.toString
    val n = s.length
    val content = new java.lang.StringBuilder(math.min(n, 1 << 16))
    var nBlocks = 0L
    var nKept = 0L
    var segStart = 0
    // iterate segments split at block tags (left-to-right, like
    // String.split with limit -1: trailing empty segments exist but
    // never pass the non-empty filter, so they need no special case)
    var scan = 0
    while (segStart <= n) {
      // find next block tag from `scan`
      var cutStart = -1
      var cutEnd = -1
      var p = scan
      while (p < n && cutStart < 0) {
        if (s.charAt(p) == '<') {
          val e = blockTagEnd(s, p)
          if (e >= 0) { cutStart = p; cutEnd = e } else p += 1
        } else p += 1
      }
      val segEnd = if (cutStart >= 0) cutStart else n
      processSegment(s, segStart, segEnd, minChars, maxLinkDenom,
        content) match {
        case 0 => ()
        case 1 => nBlocks += 1
        case _ => nBlocks += 1; nKept += 1
      }
      if (cutStart < 0) {
        segStart = n + 1 // done
      } else {
        segStart = cutEnd
        scan = cutEnd
      }
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](UTF8String.fromString(content.toString),
        nBlocks, nKept))
  }

  /** Clean + weigh one segment; appends kept text to `content`.
    * Returns 0 = empty, 1 = scored only, 2 = kept. */
  private def processSegment(s: String, from: Int, until: Int,
      minChars: Int, maxLinkDenom: Int,
      content: java.lang.StringBuilder): Int = {
    if (from >= until) return 0
    // anchor pass (independent of the clean pass, like the chained
    // regexp_extract_all: a failed anchor open inside a stripped
    // generic tag still lets a LATER anchor in that tag's span match)
    var anchorChars = 0
    var ap = from
    while (ap < until) {
      if (s.charAt(ap) == '<') {
        val m = anchorAt(s, ap, until)
        if (m != null) {
          anchorChars += collapsedLen(s, m(0), m(1))
          ap = m(2)
        } else ap += 1
      } else ap += 1
    }
    // clean pass: tag strip + entities + ws collapse + trim
    val sb = new java.lang.StringBuilder(math.min(until - from, 4096))
    var pending = false
    def emitWs(): Unit = if (sb.length > 0) pending = true
    def emitChar(c: Char): Unit = {
      if (pending) { sb.append(' '); pending = false }
      sb.append(c)
    }
    var pos = from
    while (pos < until) {
      val c = s.charAt(pos)
      if (c == '<') {
        var q = pos + 1
        while (q < until && s.charAt(q) != '>') q += 1
        if (q < until) { emitWs(); pos = q + 1 }
        else { emitChar('<'); pos += 1 }
      } else if (c == '&') {
        val e = entityAt(s, pos, until)
        if (e >= 0) {
          val rep = EntityReps(e)
          if (rep == ' ') emitWs() else emitChar(rep)
          pos += EntityLits(e).length
        } else { emitChar('&'); pos += 1 }
      } else if (isWs(c)) { emitWs(); pos += 1 }
      else { emitChar(c); pos += 1 }
    }
    if (sb.length == 0) return 0
    val txtLen = sb.codePointCount(0, sb.length)
    if (txtLen >= minChars && anchorChars * maxLinkDenom <= txtLen) {
      if (content.length > 0) content.append(' ')
      content.append(sb)
      2
    } else 1
  }
}

/** Fused WARC→WET text extraction as a native Catalyst expression —
  * one static call per row into a JIT-compiled scanner instead of ~11
  * chained regexp passes (SURVEY §7.3 preference order; the r14 100×
  * artifact named this chain the cpu-dense class's hot loop). Inside
  * whole-stage codegen like every expression here; byte-parity with
  * the chained form is HtmlSpec-pinned and oracle-checked (q132/q144
  * state the chained passes verbatim in DuckDB SQL). */
case class HtmlExtractText(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override val nullIntolerant: Boolean = true
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = "html_extract_text"

  override protected def nullSafeEval(input: Any): Any =
    HtmlUtil.extractText(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HtmlUtil.extractText($c)")

  override protected def withNewChildInternal(
      newChild: Expression): HtmlExtractText = copy(child = newChild)
}

/** Fused main-content extraction (Arc90 link-density scoring) — the
  * single-walk twin of the chained split/transform/filter form, with
  * identical output including the struct-of-NULLs-for-NULL-html
  * convention. */
case class HtmlMainContent(child: Expression, minChars: Int,
    maxLinkDenom: Int) extends UnaryExpression with ExpectsInputTypes {

  // analysis-time type contract (ADVICE r15): a non-string child is an
  // AnalysisException, not a runtime ClassCastException; NULL handling
  // stays the custom mainContentOrNull path (struct of NULLs), so the
  // expression itself is never null
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def nullable: Boolean = false
  override def dataType: DataType = StructType(Seq(
    StructField("content", StringType, nullable = true),
    StructField("n_blocks", LongType, nullable = true),
    StructField("n_kept", LongType, nullable = true)))
  override def prettyName: String = "html_main_content"

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    HtmlUtil.mainContentOrNull(
      if (v == null) null else v.asInstanceOf[UTF8String],
      minChars, maxLinkDenom)
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val row = classOf[InternalRow].getName
    val resultCode =
      code"""${childGen.code}
        $row ${ev.value} = graft.functions.HtmlUtil.mainContentOrNull(
          ${childGen.isNull} ? null : ${childGen.value},
          $minChars, $maxLinkDenom);"""
    ev.copy(code = resultCode, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(
      newChild: Expression): HtmlMainContent = copy(child = newChild)
}

object HtmlExpressions {
  /** Column API for the fused extractor. */
  def htmlExtractText(html: Column): Column =
    Shim.column(HtmlExtractText(Shim.expression(html)))

  /** Column API for the fused main-content scorer. */
  def htmlMainContent(html: Column, minChars: Int,
      maxLinkDenom: Int): Column =
    Shim.column(HtmlMainContent(Shim.expression(html), minChars,
      maxLinkDenom))
}
