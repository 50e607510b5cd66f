package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Element-wise vector difference `a - b` over two ARRAY<DOUBLE> columns
  * as a codegen'd native kernel — value-identical to the interpreted
  * `zip_with(a, b, (x, y) -> x - y)` it replaces on the residual paths
  * of the PQ tier (q135/q204/q244/q270: one residual array per corpus
  * row per pass). Subtraction is element-local, so there is no
  * association order to preserve; the null contract is zip_with's:
  *   - NULL if either input array is NULL;
  *   - output length = max of the input lengths, with positions past the
  *     shorter input NULL (zip_with pads with NULL, and NULL - y = NULL);
  *   - a NULL element on either side yields a NULL element.
  */
case class VecSubExpression(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = true)

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"vec_sub requires two ARRAY<DOUBLE>, got ${l.sql}, ${r.sql}")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    VecSubExpression.compute(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.VecSubExpression.compute($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VecSubExpression {

  /** Static kernel shared by interpreted eval and generated code; inputs
    * must not be null (see class doc for the element contract). */
  def compute(a: ArrayData, b: ArrayData): ArrayData = {
    val na = a.numElements()
    val nb = b.numElements()
    val n = math.max(na, nb)
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      out(i) =
        if (i < na && i < nb && !a.isNullAt(i) && !b.isNullAt(i))
          java.lang.Double.valueOf(a.getDouble(i) - b.getDouble(i))
        else null
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Column-API entry: element-wise `a - b` over ARRAY<DOUBLE>. */
  def vecSub(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.GraftSqlShim.column(
      VecSubExpression(
        org.apache.spark.sql.graft.GraftSqlShim.expression(a),
        org.apache.spark.sql.graft.GraftSqlShim.expression(b)))
}
