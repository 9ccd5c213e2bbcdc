package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Static helper for generated code: Unicode NFC normalization (canonical
  * decomposition + canonical composition, UAX #15) via the JDK's
  * `java.text.Normalizer` — pure JVM, no ICU dependency. The fast path
  * first asks `isNormalized` (a cheap quick-check scan that is true for
  * virtually every already-clean document) and only then allocates the
  * normalized copy — at corpus scale the common case is a scan, not a
  * rewrite. */
object NfcNorm {
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}

/** Custom Catalyst expression with codegen: Unicode NFC normalization of a
  * string column — the canonical first step of corpus text cleaning
  * (decomposed accents from OCR/PDF extraction, compatibility artifacts)
  * that Spark has no built-in for. Mirrors DuckDB's `nfc_normalize`, which
  * is what the q_text_normalize oracle runs. Registered as
  * `nfc_normalize` by [[graft.GraftExtensions]] for the SQL surface. */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"nfc_normalize requires STRING input, got ${child.dataType.catalogString}")
  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  override protected def nullSafeEval(input: Any): Any =
    NfcNorm.nfc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.NfcNorm.nfc($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalize {
  /** Column-API entry point (via the GraftShim Expression↔Column bridge). */
  def nfc(c: Column): Column =
    org.apache.spark.sql.GraftShim.column(
      NfcNormalize(org.apache.spark.sql.GraftShim.expression(c)))
}
