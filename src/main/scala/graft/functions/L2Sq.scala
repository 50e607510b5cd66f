package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Pairwise squared L2 distance between two ARRAY<DOUBLE> vectors as a
  * codegen'd native kernel — bit-identical to the interpreted
  * `aggregate(zip_with(a, b, (x, y) -> (x-y)*(x-y)), 0.0, (acc, x) -> acc+x)`
  * fold the DuckDB oracles mirror with
  * `list_sum(list_transform(range(1, n+1), i -> (a[i]-b[i])*(a[i]-b[i])))`:
  * the same left-to-right IEEE association, evaluated as a tight loop
  * inside whole-stage codegen instead of re-entering the HOF interpreter
  * per element. Same rationale (and null contract) as the per-centroid
  * fold inside [[NearestCentroidExpression]], whose `sumSq` this shares:
  *   - NULL on either NULL input (the HOF on a NULL array);
  *   - NULL on length mismatch or any NULL element (zip_with pads with
  *     NULL and a NULL term nulls the interpreted sum);
  * so swapping a call site never changes a value, only how it is
  * computed. Used by the distance-heavy audits (q244/q270's corpus×panel
  * scoring above all — guide §1.2 step 2, per-task work).
  */
case class L2SqExpression(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"l2sq requires two ARRAY<DOUBLE>, got ${l.sql}, ${r.sql}")
    }

  override def eval(input: InternalRow): Any = {
    val a = left.eval(input)
    if (a == null) return null
    val b = right.eval(input)
    if (b == null) return null
    NearestCentroidExpression.sumSq(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val l = left.genCode(ctx)
    val r = right.genCode(ctx)
    val boxed = ctx.freshName("l2sq")
    val resultCode =
      code"""
        ${l.code}
        ${r.code}
        boolean ${ev.isNull} = true;
        double ${ev.value} = 0.0;
        if (!${l.isNull} && !${r.isNull}) {
          java.lang.Double $boxed =
            graft.functions.NearestCentroidExpression.sumSq(
              ${l.value}, ${r.value});
          if ($boxed != null) {
            ${ev.isNull} = false;
            ${ev.value} = $boxed.doubleValue();
          }
        }
      """
    ev.copy(code = resultCode)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object L2SqExpression {

  /** Column-API entry: squared L2 distance of two ARRAY<DOUBLE> columns. */
  def l2sq(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.GraftSqlShim.column(
      L2SqExpression(
        org.apache.spark.sql.graft.GraftSqlShim.expression(a),
        org.apache.spark.sql.graft.GraftSqlShim.expression(b)))
}
