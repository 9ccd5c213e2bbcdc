package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Static helper for generated code: k-word shingles of a space-separated
  * text. Semantics identical to the HOF formulation it replaces
  * (`transform(sequence(1, n-k+1), i -> concat_ws(" ", w[i..i+k-1]))` over
  * `split(text, " ")`): java-regex split keeping trailing empties, one
  * space between joined words, and an EMPTY result for texts under k
  * words (never a backwards sequence or an out-of-range index).
  */
object ShingleF {
  def shingles(s: UTF8String, k: Int): ArrayData = {
    val words = s.toString.split(" ", -1)
    if (words.length < k) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](words.length - k + 1)
    var i = 0
    while (i <= words.length - k) {
      val sb = new java.lang.StringBuilder(words(i))
      var j = 1
      while (j < k) { sb.append(' ').append(words(i + j)); j += 1 }
      out(i) = UTF8String.fromString(sb.toString)
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** Custom Catalyst expression with codegen: word k-shingling. Exists
  * because the composable form — `transform` + `sequence` + repeated
  * `element_at`/`concat_ws` — runs as interpreted lambda closures and was
  * the single most expensive stage of the near-dup keys (~4 s per
  * evaluation at sf0.1, evaluated several times per query); the custom
  * expression is one static call inside whole-stage codegen.
  */
case class WordShingles(child: Expression, k: Int) extends UnaryExpression {
  require(k >= 1, s"shingle size must be >= 1, got $k")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"word_shingles requires STRING input, got ${child.dataType.catalogString}")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_shingles"

  override protected def nullSafeEval(input: Any): Any =
    ShingleF.shingles(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.ShingleF.shingles($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}

object WordShingles {
  /** Column-API entry point (via the GraftShim Expression↔Column bridge). */
  def of(c: Column, k: Int): Column =
    org.apache.spark.sql.GraftShim.column(
      WordShingles(org.apache.spark.sql.GraftShim.expression(c), k))
}
