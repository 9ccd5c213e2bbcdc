package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Static helper for generated code: the engine's shared 60-bit digest
  * (SURVEY.md §2.B round-3 keys) computed directly from the MD5 bytes.
  *
  * Equivalent by construction to the portable SQL form
  * `CAST(conv(substr(md5(s),1,15),16,10) AS BIGINT)` — the first 15 hex
  * characters of an MD5 are the top 60 bits of its first 8 bytes — but in
  * one pass with no hex-string round trip (the built-in chain allocates
  * the 32-char hex string, a 15-char substring, and a decimal string per
  * row; this allocates nothing beyond the digest).
  *
  * Thread safety: `MessageDigest` is not thread-safe and codegen'd rows
  * run on many task threads → one instance per thread.
  */
object Md5P60 {
  private val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  def digest60(s: UTF8String): Long = {
    val d = md.get()
    d.reset()
    val bytes = d.digest(s.getBytes)
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (bytes(i) & 0xffL); i += 1 }
    v >>> 4 // top 60 bits = first 15 hex chars
  }
}

/** Custom Catalyst expression with codegen: 60-bit MD5-prefix digest of a
  * string column. Exists because the portable formulation
  * (`conv(substr(md5,...))`) is the per-row hot path of the fingerprint /
  * simhash / shingle keys — at sf0.1 `q_doc_fingerprint` evaluates it
  * ~1.5 M times — and the built-in chain burns three string allocations
  * per call. Oracle compatibility is unchanged: same value, computed once.
  */
case class Md5Prefix60(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"md5_prefix60 requires STRING input, got ${child.dataType.catalogString}")
  override def dataType: DataType = LongType
  override def prettyName: String = "md5_prefix60"

  override protected def nullSafeEval(input: Any): Any =
    Md5P60.digest60(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.Md5P60.digest60($c)")

  override protected def withNewChildInternal(newChild: Expression): Md5Prefix60 =
    copy(child = newChild)
}

object Md5Prefix60 {
  /** Column-API entry point (via the GraftShim Expression↔Column bridge). */
  def h60(c: Column): Column =
    org.apache.spark.sql.GraftShim.column(
      Md5Prefix60(org.apache.spark.sql.GraftShim.expression(c)))
}
