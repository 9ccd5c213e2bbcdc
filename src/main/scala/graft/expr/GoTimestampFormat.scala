package graft.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType, TimestampType}
import org.apache.spark.unsafe.types.UTF8String

/** Static helper (standalone object → static forwarders, callable from
  * generated Java). Formats epoch-micros like Go's
  * `t.UTC().Format("2006-01-02T15:04:05.999Z")` (reference `main.go:179`):
  * millisecond precision, trailing zeros of the fraction trimmed, the dot
  * dropped entirely when the fraction is zero, literal 'Z' suffix.
  */
object GoTs {
  def formatMicros(micros: Long): UTF8String = {
    val secs = Math.floorDiv(micros, 1000000L)
    val ms = (Math.floorMod(micros, 1000000L) / 1000L).toInt
    val ldt = java.time.LocalDateTime.ofEpochSecond(secs, 0, java.time.ZoneOffset.UTC)
    val base = f"${ldt.getYear}%04d-${ldt.getMonthValue}%02d-${ldt.getDayOfMonth}%02dT${ldt.getHour}%02d:${ldt.getMinute}%02d:${ldt.getSecond}%02d"
    val frac =
      if (ms == 0) ""
      else {
        var s = f".$ms%03d"
        while (s.endsWith("0")) s = s.substring(0, s.length - 1)
        s
      }
    UTF8String.fromString(base + frac + "Z")
  }
}

/** Custom Catalyst expression with codegen: Go `.999`-style timestamp
  * formatting (SURVEY.md §2.B `q_expr_go_ts`, §4.2 item 1). Spark's
  * `date_format` cannot express trailing-zero trimming, so this is one of
  * the few genuinely custom pieces of the engine. Stays inside whole-stage
  * codegen via `defineCodeGen` — one static call per row, no boxing.
  */
case class GoTimestampFormat(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == TimestampType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"go_ts requires TIMESTAMP input, got ${child.dataType.catalogString}")
  override def dataType: DataType = StringType
  override def prettyName: String = "go_ts"

  override protected def nullSafeEval(input: Any): Any =
    GoTs.formatMicros(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.GoTs.formatMicros($c)")

  override protected def withNewChildInternal(newChild: Expression): GoTimestampFormat =
    copy(child = newChild)
}
