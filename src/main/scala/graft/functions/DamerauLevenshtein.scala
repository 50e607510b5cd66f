package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** Full (unrestricted) Damerau–Levenshtein edit distance as a native
  * Catalyst expression with codegen. Spark ships `levenshtein` but no
  * transposition-aware distance; record-linkage stacks want it because
  * adjacent-character swaps are the dominant human typo class (Damerau '64
  * measured >80%). This fills the gap the way `JaroWinklerExpression` did:
  * one static Java kernel inlined into whole-stage codegen, no UDF encoder
  * round-trip.
  *
  * Variant pinned by probing DuckDB 1.0's independent built-in
  * `damerau_levenshtein` (so the kernel is ORACLE-CHECKABLE, q322):
  * DL("CA","ABC") = 2 — the FULL Lowrance–Wagner '75 alphabet-DP distance,
  * NOT the restricted optimal-string-alignment variant (OSA would read 3
  * because it forbids edits inside a transposed pair). The kernel is the
  * standard (n+2)×(m+2) DP with per-character last-match row index and a
  * last-match column cursor; O(n·m) time, O(n·m) ints of scratch per call
  * (candidate-pair strings are short — part-name vocabulary — so scratch
  * stays in L1/L2).
  *
  * Comparison is at the UTF-16 unit grain; identical to DuckDB's byte
  * grain on the ASCII corpus the oracle pairing runs on (the q281
  * precondition). Probed cases pinned in `DamerauLevenshteinSpec`.
  */
case class DamerauLevenshteinExpression(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType

  override def nullSafeEval(a: Any, b: Any): Any =
    DamerauLevenshteinExpression.compute(
      a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.DamerauLevenshteinExpression.compute($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object DamerauLevenshteinExpression {

  /** Static kernel shared by interpreted eval and generated code.
    * Lowrance–Wagner full DL: `da` maps each character of the alphabet to
    * the last row where it appeared in `a`; `db` tracks the last column in
    * this row where `b`'s character matched. The transposition candidate
    * d(k-1, l-1) + (i-k-1) + 1 + (j-l-1) allows arbitrary edits between
    * the transposed pair — the case OSA forbids.
    */
  def compute(s1: UTF8String, s2: UTF8String): Int = {
    val a = s1.toString
    val b = s2.toString
    val n = a.length
    val m = b.length
    if (n == 0) return m
    if (m == 0) return n
    val inf = n + m
    val w = m + 2
    // d is (n+2) x (m+2) flattened; d(i)(j) = dp(i * w + j)
    val dp = new Array[Int]((n + 2) * w)
    dp(0) = inf
    var i = 0
    while (i <= n) {
      dp((i + 1) * w + 1) = i
      dp((i + 1) * w) = inf
      i += 1
    }
    var j = 0
    while (j <= m) {
      dp(w + j + 1) = j
      dp(j + 1) = inf
      j += 1
    }
    // last row index where each character occurred in a (1-based); ASCII
    // fast path backed by a growable map-free fallback for wide chars.
    val daAscii = new Array[Int](128)
    var daWide: java.util.HashMap[Character, Integer] = null
    def daGet(c: Char): Int =
      if (c < 128) daAscii(c)
      else if (daWide == null) 0
      else { val v = daWide.get(c); if (v == null) 0 else v.intValue() }
    def daPut(c: Char, v: Int): Unit =
      if (c < 128) daAscii(c) = v
      else {
        if (daWide == null) daWide = new java.util.HashMap[Character, Integer]()
        daWide.put(c, v)
      }
    i = 1
    while (i <= n) {
      var db = 0
      val ai = a.charAt(i - 1)
      j = 1
      while (j <= m) {
        val bj = b.charAt(j - 1)
        val k = daGet(bj)
        val l = db
        val cost = if (ai == bj) { db = j; 0 } else 1
        var best = dp(i * w + j) + cost            // substitute / match
        val del = dp(i * w + j + 1) + 1            // delete from a
        if (del < best) best = del
        val ins = dp((i + 1) * w + j) + 1          // insert into a
        if (ins < best) best = ins
        val tr = dp(k * w + l) + (i - k - 1) + 1 + (j - l - 1)
        if (tr < best) best = tr
        dp((i + 1) * w + j + 1) = best
        j += 1
      }
      daPut(ai, i)
      i += 1
    }
    dp((n + 1) * w + m + 1)
  }

  /** Column-API entry point. */
  def damerauLevenshtein(x: Column, y: Column): Column =
    org.apache.spark.sql.graft.GraftSqlShim.column(
      DamerauLevenshteinExpression(
        org.apache.spark.sql.graft.GraftSqlShim.expression(x),
        org.apache.spark.sql.graft.GraftSqlShim.expression(y)))
}
