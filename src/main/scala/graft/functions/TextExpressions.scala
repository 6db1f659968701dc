package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.graftshim.Shim.AbstractDataType

/** Static helper the generated code calls (a Scala object compiles to a
  * class with static forwarders, so `graft.functions.NfcUtil.nfc(x)` is
  * plain Java from codegen's point of view). */
object NfcUtil {
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    // Fast path: NFC-normalizing pure ASCII is the identity; skip the
    // String round-trip for the common case.
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}

/** Unicode NFC normalization as a native Catalyst expression.
  *
  * Spark has no built-in unicode-normalization function; a Scala UDF
  * would break whole-stage codegen around it (SURVEY §7.3 preference
  * order: compose > Expression > UDF). The expression stays inside the
  * codegen span — one static call per row, no iterator boundary — so
  * the downstream lower/regexp stages of text normalization fuse into
  * the same generated method. DuckDB states the identical operation as
  * `nfc_normalize(text)`. */
case class NfcNormalize(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override val nullIntolerant: Boolean = true
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  override protected def nullSafeEval(input: Any): Any =
    NfcUtil.nfc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NfcUtil.nfc($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

/** Static helper for [[SimHash60]] — one tight JIT-compiled loop per
  * document, called from generated code. */
object SimHashUtil {
  /** 60-bit SimHash over a token array. Bit-for-bit the same math the
    * DuckDB oracle states per token —
    * `conv(substring(md5(tok),1,15),16,10)` == the top 60 bits of the
    * first 8 digest bytes (16 hex nibbles big-endian, last nibble
    * dropped) — then a per-bit majority vote over token OCCURRENCES
    * (null elements count toward n but contribute no bits, matching the
    * null-propagating column form). */
  def simhash60(arr: org.apache.spark.sql.catalyst.util.ArrayData): Long = {
    val n = arr.numElements()
    val counts = new Array[Int](60)
    val md = java.security.MessageDigest.getInstance("MD5")
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        md.reset()
        val digest = md.digest(arr.getUTF8String(i).getBytes)
        var h = 0L
        var j = 0
        while (j < 8) { h = (h << 8) | (digest(j) & 0xffL); j += 1 }
        h = h >>> 4 // first 15 hex digits
        var b = 0
        while (b < 60) {
          if (((h >>> b) & 1L) != 0L) counts(b) += 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 60) {
      if (counts(b) * 2 > n) out |= (1L << b)
      b += 1
    }
    out
  }
}

/** 60-bit SimHash fingerprint as a native Catalyst expression.
  *
  * The column-expression form (transform + aggregate + zip_with over a
  * 60-element count array) is semantically identical but runs in the
  * HOF INTERPRETER — Spark does not codegen higher-order lambdas — at
  * roughly 60 array allocations per token. This expression is one
  * static call per row into a JIT-compiled loop, and it stays inside
  * whole-stage codegen. Oracle parity is pinned by DedupSpec-style gate
  * q24/q29 (the DuckDB SQL states the md5 formula the helper
  * reproduces). */
case class SimHash60(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override val nullIntolerant: Boolean = true
  override def inputTypes: Seq[AbstractDataType] =
    Seq(org.apache.spark.sql.types.ArrayType(StringType))
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def prettyName: String = "simhash60"

  override protected def nullSafeEval(input: Any): Any =
    SimHashUtil.simhash60(
      input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHashUtil.simhash60($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash60 =
    copy(child = newChild)
}

/** Static helper for [[WordShingles]]. */
object ShinglesUtil {
  /** Distinct word k-gram shingles of a token array, first-occurrence
    * order — the same result as the HOF form
    * `array_distinct(transform(sequence(0, greatest(n-k, 0)),
    *   i -> array_join(slice(toks, i+1, k), ' ')))`
    * including its edge cases: fewer than k tokens yield ONE short
    * shingle of the available tokens; an empty array yields an empty
    * string (excluded here — every consumer filters it anyway); null
    * tokens are skipped by the join. */
  def shingles(arr: org.apache.spark.sql.catalyst.util.ArrayData,
      k: Int): org.apache.spark.sql.catalyst.util.ArrayData = {
    val n = arr.numElements()
    val m = math.max(n - k, 0) + 1
    val seen = new java.util.LinkedHashSet[UTF8String]()
    val sep = UTF8String.fromString(" ")
    var i = 0
    while (i < m) {
      val end = math.min(i + k, n)
      val parts = new Array[UTF8String](end - i)
      var j = i
      while (j < end) {
        parts(j - i) = if (arr.isNullAt(j)) null else arr.getUTF8String(j)
        j += 1
      }
      val sh = UTF8String.concatWs(sep, parts: _*)
      if (sh != null && sh.numBytes() > 0) seen.add(sh)
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      seen.toArray().asInstanceOf[Array[Any]])
  }
}

/** Static helper for [[AllWordShingles]]. */
object AllShinglesUtil {
  /** EVERY word k-gram shingle of a token array in POSITION ORDER —
    * duplicates and empty strings kept, so element i is exactly
    * `array_join(slice(toks, i+1, k), ' ')` for i in 0..max(n−k, 0)
    * and positions survive `posexplode`. Edge cases mirror the HOF
    * form verbatim: fewer than k tokens yield ONE short shingle of
    * the available tokens; an empty array yields `[""]`; null tokens
    * are skipped by the join. The non-distinct positioned twin of
    * [[ShinglesUtil.shingles]]. */
  def allShingles(arr: org.apache.spark.sql.catalyst.util.ArrayData,
      k: Int): org.apache.spark.sql.catalyst.util.ArrayData = {
    val n = arr.numElements()
    val m = math.max(n - k, 0) + 1
    val out = new Array[Any](m)
    val sep = UTF8String.fromString(" ")
    var i = 0
    while (i < m) {
      val end = math.min(i + k, n)
      val parts = new Array[UTF8String](end - i)
      var j = i
      while (j < end) {
        parts(j - i) = if (arr.isNullAt(j)) null else arr.getUTF8String(j)
        j += 1
      }
      out(i) = UTF8String.concatWs(sep, parts: _*)
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

/** Every word k-gram shingle (non-distinct, position order) as a native
  * Catalyst expression — the generator input for POSITIONED shingles
  * (span dedup) and for occurrence-true gram counting (repetition
  * stats, n-gram LMs, memorization audits). The HOF form
  * `transform(sequence(0, greatest(n−k, 0)), i → array_join(slice(
  * toks, i+1, k), ' '))` runs in the interpreter (Spark does not
  * codegen higher-order lambdas) and allocates slice/join
  * intermediates per position; this is one static call per row into a
  * JIT loop. Exactness vs the HOF form is spec-pinned (TextOpsSpec). */
case class AllWordShingles(child: Expression, k: Int)
    extends UnaryExpression with ExpectsInputTypes {

  override val nullIntolerant: Boolean = true
  override def inputTypes: Seq[AbstractDataType] =
    Seq(org.apache.spark.sql.types.ArrayType(StringType))
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(StringType, containsNull = false)
  override def prettyName: String = "all_word_shingles"

  override protected def nullSafeEval(input: Any): Any =
    AllShinglesUtil.allShingles(
      input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.AllShinglesUtil.allShingles($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): AllWordShingles =
    copy(child = newChild)
}

/** Distinct word k-gram shingles as a native Catalyst expression.
  *
  * The HOF form (sequence → transform → slice → array_join →
  * array_distinct) is the hot inner loop of EVERY shingle consumer
  * (n-gram Jaccard, MinHash, LSH banding, contamination, bigram
  * coverage) and runs in the interpreter — Spark does not codegen
  * higher-order lambdas, and each token allocates slice/join
  * intermediates. This is one static call per row into a JIT loop that
  * also deduplicates in place. */
case class WordShingles(child: Expression, k: Int)
    extends UnaryExpression with ExpectsInputTypes {

  override val nullIntolerant: Boolean = true
  override def inputTypes: Seq[AbstractDataType] =
    Seq(org.apache.spark.sql.types.ArrayType(StringType))
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_shingles"

  override protected def nullSafeEval(input: Any): Any =
    ShinglesUtil.shingles(
      input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.ShinglesUtil.shingles($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}

/** Static helper for [[AsciiTokens]]. */
object TokensUtil {
  private def isTok(b: Byte): Boolean =
    (b >= 'a' && b <= 'z') || (b >= '0' && b <= '9')

  /** `filter(split(lower(text), "[^a-z0-9]+"), t => t =!= "")` as ONE
    * byte walk. Exactness: the lowercase step is the same
    * `UTF8String.toLowerCase` the `lower()` expression calls; after
    * it, the kept content is exactly the maximal `[a-z0-9]` BYTE runs
    * — every UTF-8 lead/continuation byte is ≥ 0x80 and never in the
    * class, so byte scanning cannot split or join a multi-byte
    * character differently than the regex does (non-ASCII characters
    * are separators in both forms, INCLUDING ones whose lowercase
    * maps into ASCII, e.g. Kelvin K → k, which the lowercase step has
    * already rewritten before either form splits). Leading/trailing/
    * empty fields the regex split emits are exactly the non-run
    * regions this walk never materializes. */
  def tokens(in: UTF8String): org.apache.spark.sql.catalyst.util.ArrayData = {
    val bytes = in.toLowerCase.getBytes
    val n = bytes.length
    val out = new java.util.ArrayList[Any]()
    var i = 0
    while (i < n) {
      if (isTok(bytes(i))) {
        var j = i + 1
        while (j < n && isTok(bytes(j))) j += 1
        out.add(UTF8String.fromBytes(bytes, i, j - i))
        i = j
      } else i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      out.toArray())
  }
}

/** The corpus tokenizer (lowercase → split on non-alphanumeric → drop
  * empties) as a native Catalyst expression.
  *
  * The chained form pays, PER ROW: a `Pattern.compile` + regex scan
  * inside `UTF8String.split`, a full String round-trip, and an
  * INTERPRETED higher-order `filter` (Spark does not codegen HOF
  * lambdas). This is the shared substrate of every text gate (vocab,
  * PMI, n-gram dedup, sketches, quality, BPE, decontamination) — the
  * r15 drift adjudication measured the whole family moving together
  * on it. One static call per row into a JIT byte walk instead;
  * parity with the chained form is TextOpsSpec-pinned including the
  * unicode-lowercase corners. */
case class AsciiTokens(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override val nullIntolerant: Boolean = true
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(StringType, containsNull = false)
  override def prettyName: String = "ascii_tokens"

  override protected def nullSafeEval(input: Any): Any =
    TokensUtil.tokens(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TokensUtil.tokens($c)")

  override protected def withNewChildInternal(newChild: Expression): AsciiTokens =
    copy(child = newChild)
}

object TextExpressions {
  /** Column API for [[NfcNormalize]]. */
  def nfcNormalize(c: Column): Column =
    Shim.column(NfcNormalize(Shim.expression(c)))

  /** Column API for [[AsciiTokens]]. */
  def asciiTokens(c: Column): Column =
    Shim.column(AsciiTokens(Shim.expression(c)))

  /** Column API for [[SimHash60]] (input: array&lt;string&gt; tokens). */
  def simhash60(tokens: Column): Column =
    Shim.column(SimHash60(Shim.expression(tokens)))

  /** Column API for [[WordShingles]] (input: array&lt;string&gt; tokens). */
  def wordShingles(tokens: Column, k: Int): Column =
    Shim.column(WordShingles(Shim.expression(tokens), k))

  /** Column API for [[AllWordShingles]] (input: array&lt;string&gt;
    * tokens) — every shingle, position order, duplicates kept. */
  def allWordShingles(tokens: Column, k: Int): Column =
    Shim.column(AllWordShingles(Shim.expression(tokens), k))
}
