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

  /** Register into an already-built session (config-based extensions
    * only apply at build time). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    org.apache.spark.sql.graftshim.Shim.registerFunction(
      spark, "vector_dot", vectorDotInfo, vectorDotBuilder)
    org.apache.spark.sql.graftshim.Shim.registerFunction(
      spark, "nfc_normalize", nfcInfo, nfcBuilder)
  }
}
