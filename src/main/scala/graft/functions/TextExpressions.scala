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

object TextExpressions {
  /** Column API for [[NfcNormalize]]. */
  def nfcNormalize(c: Column): Column =
    Shim.column(NfcNormalize(Shim.expression(c)))
}
