package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Polynomial rolling hash (base 31, mod 1e9+7, over codepoints — the
  * Rabin-Karp accumulator) as a native Catalyst expression WITH codegen:
  * `doGenCode` inlines a call to the static kernel inside whole-stage
  * codegen, so per-document fingerprinting is one tight Java loop instead of
  * an interpreted `aggregate(sequence(...))` higher-order chain (~10x fewer
  * allocations: no per-character substring/lambda evaluation).
  *
  * Matches the SQL-expressible formulation
  * `fold((a, cp) -> (a * 31 + cp) % 1000000007, 0)` exactly, so DuckDB
  * oracle parity is preserved (q48).
  */
case class RollingHashExpression(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any =
    RollingHashExpression.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.RollingHashExpression.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RollingHashExpression {
  private final val Mod = 1000000007L

  /** Static kernel shared by interpreted eval and generated code. Iterates
    * codepoints (what `substr(text, i, 1)` sees in Spark and DuckDB alike).
    */
  def compute(s: UTF8String): Long = {
    val str = s.toString
    var h = 0L
    var i = 0
    val n = str.length
    while (i < n) {
      val cp = str.codePointAt(i)
      h = (h * 31L + cp) % Mod
      i += Character.charCount(cp)
    }
    h
  }

  /** Column-API entry point. */
  def rollingHash(c: Column): Column =
    org.apache.spark.sql.graft.GraftSqlShim.column(
      RollingHashExpression(
        org.apache.spark.sql.graft.GraftSqlShim.expression(c)))
}
