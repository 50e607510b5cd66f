package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Count of distinct common elements of two ARRAY<STRING> columns as a
  * codegen'd native kernel — value-identical to
  * `size(array_intersect(a, b))` on the null-free arrays the dedup tier
  * feeds it, WITHOUT materializing the matched-token array (r14 VERDICT
  * "next round" #7: q120's exact PPJoin verification intersects the true
  * string sets per candidate pair; the matched strings themselves are never
  * output, so building, copying, and then `size`-ing an array of 15-char
  * strings per candidate is pure allocation). Contract mirrored from
  * ArrayIntersect:
  *   - NULL if either input is NULL;
  *   - elements are de-duplicated (each distinct common value counts once);
  *   - a NULL element present in both sides counts once (never occurs on
  *     the `array_distinct`-of-substrings inputs, kept for exactness).
  */
case class IntersectCountExpression(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"intersect_count requires two ARRAY<STRING>, got ${l.sql}, ${r.sql}")
    }

  override def eval(input: InternalRow): Any = {
    val a = left.eval(input)
    if (a == null) return null
    val b = right.eval(input)
    if (b == null) return null
    IntersectCountExpression.count(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val l = left.genCode(ctx)
    val r = right.genCode(ctx)
    val resultCode =
      code"""
        ${l.code}
        ${r.code}
        boolean ${ev.isNull} = true;
        int ${ev.value} = 0;
        if (!${l.isNull} && !${r.isNull}) {
          ${ev.isNull} = false;
          ${ev.value} = graft.functions.IntersectCountExpression.count(
            ${l.value}, ${r.value});
        }
      """
    ev.copy(code = resultCode)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "intersect_count"
}

object IntersectCountExpression {

  /** PUBLIC (generated whole-stage code calls it through the companion's
    * static forwarder — a non-public member silently degrades every call
    * site to interpreted eval, the r14 lesson). Builds one hash set over
    * the SMALLER side, probes with the larger, de-duplicating probe hits. */
  def count(a: ArrayData, b: ArrayData): Int = {
    val (small, large) =
      if (a.numElements() <= b.numElements()) (a, b) else (b, a)
    val ns = small.numElements()
    val set = new java.util.HashSet[UTF8String](Math.max(4, ns * 2))
    var smallHasNull = false
    var i = 0
    while (i < ns) {
      if (small.isNullAt(i)) smallHasNull = true
      else set.add(small.getUTF8String(i))
      i += 1
    }
    var n = 0
    var largeNullCounted = false
    val nl = large.numElements()
    var j = 0
    while (j < nl && (!set.isEmpty || (smallHasNull && !largeNullCounted))) {
      if (large.isNullAt(j)) {
        if (smallHasNull && !largeNullCounted) { n += 1; largeNullCounted = true }
      } else if (set.remove(large.getUTF8String(j))) {
        n += 1
      }
      j += 1
    }
    // a null element counts once when present in BOTH sides — handled above;
    // the remove-on-hit makes duplicate large-side values count once.
    n
  }

  /** Column-API entry: |distinct(a) ∩ distinct(b)| for ARRAY<STRING>. */
  def intersectCount(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.GraftSqlShim.column(
      IntersectCountExpression(
        org.apache.spark.sql.graft.GraftSqlShim.expression(a),
        org.apache.spark.sql.graft.GraftSqlShim.expression(b)))
}
