package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType}
import org.apache.spark.unsafe.types.UTF8String

/** Jaro–Winkler string similarity as a native Catalyst expression WITH
  * codegen — the prefix-boosted edit-affinity kernel record-linkage stacks
  * rank candidate pairs with (Winkler '90). Spark ships `levenshtein` but no
  * Jaro–Winkler; this fills the gap as one tight static Java kernel inlined
  * into whole-stage codegen (no UDF encoder round-trip, no interpreted
  * higher-order chain).
  *
  * Semantics are pinned to the standard definition, empirically verified
  * against DuckDB 1.0's `jaro_winkler_similarity` (so the expression is
  * ORACLE-CHECKABLE, q281):
  *   - either side empty → 0.0;
  *   - match window = max(⌊max(|a|,|b|)/2⌋ − 1, 0), greedy first-available
  *     matching;
  *   - transpositions t = ⌊pairwise mismatches of the matched sequences/2⌋
  *     (INTEGER halves — probed: jaro('abcqqq','bcaqqq') = 17/18, i.e. t=1
  *     from 3 mismatches);
  *   - jaro = (m/|a| + m/|b| + (m−t)/m)/3;
  *   - Winkler boost only when jaro > 0.7: jw = jaro + p·0.1·(1−jaro) with
  *     p = common prefix capped at 4.
  * Comparison is at the UTF-16 unit grain; identical to DuckDB's byte grain
  * on the ASCII corpus the oracle pairing runs on (the q171 precondition,
  * asserted in `Verify`).
  */
case class JaroWinklerExpression(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any =
    JaroWinklerExpression.compute(
      a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.JaroWinklerExpression.compute($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object JaroWinklerExpression {

  /** Static kernel shared by interpreted eval and generated code. */
  def compute(s1: UTF8String, s2: UTF8String): Double = {
    val a = s1.toString
    val b = s2.toString
    val l1 = a.length
    val l2 = b.length
    if (l1 == 0 || l2 == 0) return 0.0
    val window = math.max(math.max(l1, l2) / 2 - 1, 0)
    val matched1 = new Array[Boolean](l1)
    val matched2 = new Array[Boolean](l2)
    var m = 0
    var i = 0
    while (i < l1) {
      val lo = math.max(0, i - window)
      val hi = math.min(l2 - 1, i + window)
      var j = lo
      var found = false
      while (!found && j <= hi) {
        if (!matched2(j) && a.charAt(i) == b.charAt(j)) {
          matched1(i) = true
          matched2(j) = true
          m += 1
          found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    // pairwise mismatches of the matched subsequences, in order
    var mismatches = 0
    var k = 0
    i = 0
    while (i < l1) {
      if (matched1(i)) {
        while (!matched2(k)) k += 1
        if (a.charAt(i) != b.charAt(k)) mismatches += 1
        k += 1
      }
      i += 1
    }
    val t = mismatches / 2
    val jaro = (m.toDouble / l1 + m.toDouble / l2 +
      (m - t).toDouble / m) / 3.0
    if (jaro <= 0.7) return jaro
    var p = 0
    val maxP = math.min(4, math.min(l1, l2))
    while (p < maxP && a.charAt(p) == b.charAt(p)) p += 1
    jaro + p * 0.1 * (1.0 - jaro)
  }

  /** Column-API entry point. */
  def jaroWinkler(x: Column, y: Column): Column =
    org.apache.spark.sql.graft.GraftSqlShim.column(
      JaroWinklerExpression(
        org.apache.spark.sql.graft.GraftSqlShim.expression(x),
        org.apache.spark.sql.graft.GraftSqlShim.expression(y)))
}
