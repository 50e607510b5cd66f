package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** Content-defined minimizer offsets as a native Catalyst expression WITH
  * codegen — the selection kernel behind q171's sampled span mining.
  *
  * For a text of length L, offsets p = 1..max(L-spanLen+1, 1) each open a
  * spanLen-char window; offset p is SELECTED iff its span's hash is the
  * minimum over the w offsets [p, p+w-1] (clipped at the end). The hash is
  * the same polynomial the rolling-fingerprint family (q48) uses —
  * `h = fold(chars, 0, (a, c) -> (a*31 + c) mod 1e9+7)` — which the DuckDB
  * oracle reproduces digit-for-digit as exact integer arithmetic, so the
  * selection is engine-independent (unlike md5-per-offset, this is also
  * the at-scale design: the hash ROLLS in O(1) per offset instead of
  * re-reading 30 chars, ~spanLen times less work per document).
  *
  * The interpreted SQL formulation (transform + per-offset fold) is what
  * the oracle runs; this kernel exists because that chain is interpreted
  * per element on the Spark side (CLAUDE.md: hot per-row HOF chains become
  * native expressions) and because only a native kernel can actually roll
  * the hash.
  *
  * Character basis is the UTF-16 code unit (= code point for BMP text,
  * matching DuckDB's `ascii()` on this corpus's ASCII data).
  */
case class MinimizerOffsetsExpression(child: Expression, spanLen: Int, w: Int)
    extends UnaryExpression {
  require(spanLen >= 1 && w >= 1, s"spanLen=$spanLen w=$w must be >= 1")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    MinimizerOffsetsExpression.compute(input.asInstanceOf[UTF8String],
      spanLen, w)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.MinimizerOffsetsExpression.compute($c, $spanLen, $w)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinimizerOffsetsExpression {
  final val Base = 31L
  final val Mod = 1000000007L

  /** Static kernel shared by interpreted eval and generated code: selected
    * 1-based offsets, ascending.
    */
  def compute(s: UTF8String, spanLen: Int, w: Int): ArrayData = {
    val t = s.toString
    val len = t.length
    val n = math.max(len - spanLen + 1, 1)
    val h = new Array[Long](n)
    if (len < spanLen) {
      // single short span: plain fold
      var acc = 0L
      var i = 0
      while (i < len) { acc = (acc * Base + t.charAt(i)) % Mod; i += 1 }
      h(0) = acc
    } else {
      var acc = 0L
      var i = 0
      while (i < spanLen) { acc = (acc * Base + t.charAt(i)) % Mod; i += 1 }
      h(0) = acc
      var pw = 1L
      i = 1
      while (i < spanLen) { pw = pw * Base % Mod; i += 1 }
      var p = 1
      while (p < n) {
        val drop = t.charAt(p - 1) * pw % Mod
        acc = ((acc - drop + Mod) % Mod * Base + t.charAt(p + spanLen - 1)) % Mod
        h(p) = acc
        p += 1
      }
    }
    // selection: h(p) minimal over the (clipped) w-window it opens; w is a
    // small constant, so the brute inner scan beats deque bookkeeping
    val sel = new Array[Int](n)
    var m = 0
    var p = 0
    while (p < n) {
      var mn = h(p)
      val end = math.min(p + w, n)
      var j = p + 1
      while (j < end) { if (h(j) < mn) mn = h(j); j += 1 }
      if (h(p) == mn) { sel(m) = p + 1; m += 1 }
      p += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(sel, m))
  }

  /** Column-API entry point. */
  def offsets(c: Column, spanLen: Int, w: Int): Column =
    org.apache.spark.sql.graft.GraftSqlShim.column(
      MinimizerOffsetsExpression(
        org.apache.spark.sql.graft.GraftSqlShim.expression(c), spanLen, w))
}
