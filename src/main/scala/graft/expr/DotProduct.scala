package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Static helper for generated code: sequential-fold dot product of two
  * float arrays in double — the exact summation order of both the
  * higher-order-function formulation it replaces
  * (`aggregate(zip_with(a, b, _*_), 0.0, _+_)`) and DuckDB's
  * `list_dot_product` over `DOUBLE[]` casts, so every cosine oracle is
  * unchanged bit-for-bit.
  */
object DotF {
  /** Null (boxed) for mismatched lengths or null elements — exactly the
    * HOF form's behavior (zip_with pads the short side with null and the
    * null poisons the fold), so corrupt rows drop out of cosine
    * comparisons instead of yielding a plausible-but-partial product. */
  def dot(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    var i = 0
    var acc = 0.0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    acc
  }
}

/** Custom Catalyst expression with codegen: dot product of two
  * `array<float>` columns. Exists because the composable HOF form runs as
  * interpreted lambda closures allocating an intermediate zipped array per
  * evaluation — the per-pair hot path of the similarity/ANN/near-dup keys
  * evaluates it hundreds of thousands of times per query. One static call,
  * no allocation, stays inside whole-stage codegen.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"dot_f32 requires two ARRAY<FLOAT> inputs, got ${l.catalogString} / ${r.catalogString}")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_f32"
  // may return null for mismatched lengths / null elements even when both
  // input arrays are non-null
  override def nullable: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any =
    DotF.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      java.lang.Double ${ev.value}_r = graft.expr.DotF.dot($a, $b);
      if (${ev.value}_r == null) { ${ev.isNull} = true; }
      else { ${ev.value} = ${ev.value}_r.doubleValue(); }
    """)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

object DotProduct {
  /** Column-API entry point (via the GraftShim Expression↔Column bridge). */
  def dot(a: Column, b: Column): Column =
    org.apache.spark.sql.GraftShim.column(DotProduct(
      org.apache.spark.sql.GraftShim.expression(a),
      org.apache.spark.sql.GraftShim.expression(b)))
}
