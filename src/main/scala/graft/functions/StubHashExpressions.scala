package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.graftshim.Shim.AbstractDataType

/** Static helpers for the deterministic media-stub fingerprints
  * ([[graft.multimodal.ImageDedup.stubImageHashesSql]] /
  * [[graft.multimodal.AudioDedup.stubAudioHashesSql]]).
  *
  * The column form states the fingerprint as 5 md5 hex strings sliced
  * by `conv(substring(hex, 2p+1, 2), 16, 10)` per pixel — ~350
  * expression nodes per row, each substring/conv allocating, plus the
  * digest→hex→integer round-trip. These helpers compute the IDENTICAL
  * bits straight from the digest bytes (hex pair p of digest r IS
  * unsigned byte p of digest r) in one JIT loop per row. Equality with
  * the SQL chain is spec-pinned (MediaSpec); the DuckDB oracle keeps
  * stating the md5/substring formula verbatim. */
object StubHashUtil {
  /** The 5 concatenated digests md5(text ++ '0'..'4') — 80 bytes. */
  private def digests(text: UTF8String): Array[Byte] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val t = text.getBytes
    val out = new Array[Byte](80)
    var r = 0
    while (r < 5) {
      md.reset()
      md.update(t)
      md.update(('0' + r).toByte)
      md.digest(out, r * 16, 16)
      r += 1
    }
    out
  }

  /** [aHash64, dHash64] of the md5-expanded pixel stream: aHash bit i
    * iff px(i)·64 > Σpx(0..63) (strict — px > mean with no FP); dHash
    * bit y·8+x iff px(y·9+x) > px(y·9+x+1). Bit 63 lands via bitwise
    * OR — identical to the SQL form's add-last ANSI-safe reduction of
    * disjoint single-bit terms. */
  def imageHashes(text: UTF8String):
      org.apache.spark.sql.catalyst.util.ArrayData = {
    val d = digests(text)
    var sum = 0L
    var i = 0
    while (i < 64) { sum += (d(i) & 0xffL); i += 1 }
    var a = 0L
    i = 0
    while (i < 64) {
      if ((d(i) & 0xffL) * 64 > sum) a |= (1L << i)
      i += 1
    }
    var dh = 0L
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        if ((d(y * 9 + x) & 0xff) > (d(y * 9 + x + 1) & 0xff))
          dh |= (1L << (y * 8 + x))
        x += 1
      }
      y += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      Array[Any](a, dh))
  }

  /** Energy-delta fHash64: bit i iff en(i+1) > en(i) over the same
    * md5-expanded stream (energies 0..64). */
  def audioFhash(text: UTF8String): Long = {
    val d = digests(text)
    var f = 0L
    var i = 0
    while (i < 64) {
      if ((d(i + 1) & 0xff) > (d(i) & 0xff)) f |= (1L << i)
      i += 1
    }
    f
  }
}

/** [aHash64, dHash64] stub image fingerprints as ONE codegen call —
  * see [[StubHashUtil]]. */
case class ImageStubHashes(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override val nullIntolerant: Boolean = true
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(LongType, containsNull = false)
  override def prettyName: String = "image_stub_hashes"

  override protected def nullSafeEval(input: Any): Any =
    StubHashUtil.imageHashes(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.StubHashUtil.imageHashes($c)")

  override protected def withNewChildInternal(newChild: Expression): ImageStubHashes =
    copy(child = newChild)
}

/** Energy-delta fHash64 stub audio fingerprint as ONE codegen call —
  * see [[StubHashUtil]]. */
case class AudioStubFhash(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override val nullIntolerant: Boolean = true
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "audio_stub_fhash"

  override protected def nullSafeEval(input: Any): Any =
    StubHashUtil.audioFhash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.StubHashUtil.audioFhash($c)")

  override protected def withNewChildInternal(newChild: Expression): AudioStubFhash =
    copy(child = newChild)
}

object StubHashExpressions {
  /** Column API for [[ImageStubHashes]]: element 0 = aHash64,
    * element 1 = dHash64. */
  def imageStubHashes(text: Column): Column =
    Shim.column(ImageStubHashes(Shim.expression(text)))

  /** Column API for [[AudioStubFhash]]. */
  def audioStubFhash(text: Column): Column =
    Shim.column(AudioStubFhash(Shim.expression(text)))
}
