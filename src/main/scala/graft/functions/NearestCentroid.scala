package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType, LongType, StructField, StructType}

/** Nearest-centroid assignment as a native codegen'd kernel — replaces the
  * interpreted `aggregate(cb, (∞, MAXV, null), keep-min-of-(key, cid))`
  * higher-order fold in `Vec.assignAgainst`, which re-enters the HOF
  * evaluator 16 times per row with a 64-element `zip_with`+`aggregate`
  * inside each step. That fold is the single hottest chain in the vector
  * tier: the IVF/k-means family (q43, q84, q130, q150, q159, q176, q179,
  * q180) runs it over the corpus once per Lloyd step plus once per final
  * assignment.
  *
  * Semantics are EXACTLY the interpreted fold's (the DuckDB oracles'
  * `row_number() OVER (ORDER BY d2, cid)` depends on them):
  *   - per-centroid d2 is the left-to-right IEEE sum of (x-y)^2 — same
  *     association as `aggregate(zip_with(...))`, so bit-identical;
  *   - a NULL vector, NULL element, or length mismatch nulls that d2; the
  *     comparison key is then +Infinity, so an all-NULL row ties every
  *     centroid and the LOWEST cid wins (the oracle's tie order) with the
  *     NULL d2 preserved for downstream null-skipping aggregates;
  *   - ties on d2 break toward the lower cid (strict lexicographic min
  *     over (key, cid), first-wins over the cid-ascending codebook);
  *   - an empty codebook yields (Long.MaxValue, NULL), a NULL codebook
  *     column yields NULL — both exactly what the fold's init/accumulator
  *     produce.
  */
case class NearestCentroidExpression(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("cid", LongType, nullable = false),
    StructField("d2", DoubleType, nullable = true)))

  override def nullable: Boolean = right.nullable

  override def eval(input: InternalRow): Any = {
    val cb = right.eval(input)
    if (cb == null) null
    else {
      val v = left.eval(input)
      NearestCentroidExpression.compute(
        if (v == null) null else v.asInstanceOf[ArrayData],
        cb.asInstanceOf[ArrayData])
    }
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val l = left.genCode(ctx)
    val r = right.genCode(ctx)
    val resultCode =
      code"""
        ${l.code}
        ${r.code}
        boolean ${ev.isNull} = ${r.isNull};
        InternalRow ${ev.value} = null;
        if (!${ev.isNull}) {
          ${ev.value} = graft.functions.NearestCentroidExpression.compute(
            ${l.isNull} ? null : ${l.value}, ${r.value});
        }
      """
    ev.copy(code = resultCode)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object NearestCentroidExpression {

  /** Static kernel shared by interpreted eval and generated code. `v` may
    * be null (null vector input); `cb` must not be. Never returns null.
    */
  def compute(v: ArrayData, cb: ArrayData): InternalRow = {
    var bestKey = Double.PositiveInfinity
    var bestCid = Long.MaxValue
    var bestD2: java.lang.Double = null
    val n = cb.numElements()
    var i = 0
    while (i < n) {
      if (!cb.isNullAt(i)) {
        val c = cb.getStruct(i, 2)
        val cid = c.getLong(0)
        val cv = if (c.isNullAt(1)) null else c.getArray(1)
        val d2 = if (v == null || cv == null) null else sumSq(v, cv)
        val key =
          if (d2 == null) Double.PositiveInfinity else d2.doubleValue()
        if (key < bestKey || (key == bestKey && cid < bestCid)) {
          bestKey = key
          bestCid = cid
          bestD2 = d2
        }
      }
      i += 1
    }
    new GenericInternalRow(Array[Any](bestCid, bestD2))
  }

  /** Left-to-right sum of squared differences; null on length mismatch or
    * any null element (zip_with pads the shorter side with NULL and a NULL
    * term nulls the interpreted sum). Shared with [[L2SqExpression]], the
    * pairwise form of the same fold. Public (not private[functions]): the
    * generated whole-stage code calls it through the companion's static
    * forwarder, which scalac only emits for public members — a qualified-
    * private here makes every l2sq call site silently fall back to
    * interpreted eval (janino "method not declared" compile error).
    */
  def sumSq(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val d = a.getDouble(i) - b.getDouble(i)
      s += d * d
      i += 1
    }
    java.lang.Double.valueOf(s)
  }

  /** Column-API entry: `vec` ARRAY<DOUBLE>, `cb` the cid-sorted
    * ARRAY<STRUCT<cid BIGINT, cv ARRAY<DOUBLE>>> codebook row.
    */
  def nearest(vec: Column, cb: Column): Column =
    org.apache.spark.sql.graft.GraftSqlShim.column(
      NearestCentroidExpression(
        org.apache.spark.sql.graft.GraftSqlShim.expression(vec),
        org.apache.spark.sql.graft.GraftSqlShim.expression(cb)))
}
