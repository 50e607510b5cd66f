package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Dot product of two `ARRAY<DOUBLE>` columns as a native codegen'd
  * expression — replaces the interpreted
  * `aggregate(zip_with(a, b, (x, y) -> x * y), 0.0, (acc, x) -> acc + x)`
  * chain that re-enters the higher-order-function evaluator per element.
  * The cosine kernels (q41/q47/q129/q130/q134/q140) call this three times
  * per pair (dot + two norms), so the interpreted fold dominated the
  * pairwise stages' profile.
  *
  * Semantics exactly mirror the column formulation the DuckDB oracle runs:
  * accumulation is left-to-right in doubles (same IEEE fold order, so
  * results are bit-identical to the HOF chain), a length mismatch yields
  * NULL (zip_with pads with NULL, and a NULL term nulls the sum), and a
  * NULL element anywhere yields NULL.
  */
case class DotProductExpression(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def nullable: Boolean = true

  override protected def nullSafeEval(l: Any, r: Any): Any =
    DotProductExpression.compute(
      l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val boxed = ctx.freshName("dotBoxed")
      s"""
        java.lang.Double $boxed =
          graft.functions.DotProductExpression.compute($a, $b);
        if ($boxed == null) {
          ${ev.isNull} = true;
        } else {
          ${ev.value} = $boxed.doubleValue();
        }
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object DotProductExpression {

  /** Static kernel shared by interpreted eval and generated code. Returns
    * null (boxed) on length mismatch or any null element — the same result
    * the zip_with/aggregate formulation produces.
    */
  def compute(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      s += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    java.lang.Double.valueOf(s)
  }

  /** Column-API entry point; both sides must already be ARRAY<DOUBLE>. */
  def dotProduct(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.GraftSqlShim.column(
      DotProductExpression(
        org.apache.spark.sql.graft.GraftSqlShim.expression(a),
        org.apache.spark.sql.graft.GraftSqlShim.expression(b)))
}
