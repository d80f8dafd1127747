package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC canonicalization — curation step zero for web-crawl
  * text: the same logical character arrives both precomposed (é,
  * U+00E9) and decomposed (e + U+0301) in real crawls, so every
  * downstream content hash, shingle set, and exact-dedup digest
  * splits on a distinction no reader can see until the corpus is
  * canonicalized. The JDK's `java.text.Normalizer` IS the Unicode
  * reference implementation of UAX #15; the fast path matters at
  * corpus scale: `isNormalized` is a scan without allocation, and
  * real text is overwhelmingly already NFC, so the common row costs
  * one pass and zero copies. */
object TextNormalizer {
  def nfc(s: String): String =
    if (java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFC)) s
    else java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC)
}

/** Native expression wrapper — per-row, one static call inside
  * whole-stage codegen (the [[HtmlToTextExpr]] shape). */
case class NfcNormalizeExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires STRING, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(
      TextNormalizer.nfc(input.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      "org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.functions.TextNormalizer.nfc($c.toString()))")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TextNormExpressions {
  /** Column wrapper: Unicode NFC canonical form. */
  def nfcNormalize(text: Column): Column =
    ColumnBridge.column(NfcNormalizeExpr(ColumnBridge.expression(text)))
}
