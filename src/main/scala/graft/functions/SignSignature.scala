package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Binary (sign) quantization of an ARRAY<DOUBLE> vector into packed
  * 32-bit sign words, as a codegen'd native kernel — replaces the
  * interpreted `aggregate(sequence(0, 31), 0L, ...)` higher-order fold
  * q331/q332 evaluated twice per corpus row (VERDICT r13 "What's wrong"
  * #1: the hot per-row HOF chain class this repo otherwise compiles to
  * native Expressions).
  *
  * Semantics are EXACTLY the interpreted fold's (the DuckDB oracle's
  * `list_sum(list_transform(range(0, 32), ...))` twin):
  *   - word w (0-based) packs dims 32w+1 .. 32w+32 (1-based), bit i set
  *     iff element 32w+i+1 is non-NULL and > 0 — the fold's
  *     `CASE WHEN v[i+off] > CAST(0 AS DOUBLE) THEN 1L << i ELSE 0L END`
  *     maps a NULL element to the ELSE branch (NULL > 0 is not true),
  *     i.e. a 0 bit, never a NULL word;
  *   - a NULL vector yields NULL (the HOF on NULL input);
  *   - the word count is ceil(n/32); a trailing partial word packs the
  *     remaining dims low-bit-first, identical to the fold run with the
  *     same off/limit. 32-bit words (not 64) because DuckDB's checked
  *     `<<` cannot place bit 63 in a BIGINT — same reason the original
  *     columns were split into wlo/whi.
  */
case class SignSignatureExpression(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"sign_signature requires ARRAY<DOUBLE>, got ${other.sql}")
    }

  override def nullSafeEval(input: Any): Any =
    SignSignatureExpression.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.SignSignatureExpression.compute($c)")

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)
}

object SignSignatureExpression {

  /** Static kernel shared by interpreted eval and generated code; `v`
    * must not be null. A NULL element contributes a 0 bit (see class
    * doc). */
  def compute(v: ArrayData): ArrayData = {
    val n = v.numElements()
    val nWords = (n + 31) / 32
    val out = new Array[Any](nWords)
    var w = 0
    while (w < nWords) {
      var word = 0L
      val base = w * 32
      val limit = math.min(32, n - base)
      var i = 0
      while (i < limit) {
        if (!v.isNullAt(base + i) && v.getDouble(base + i) > 0.0) {
          word |= (1L << i)
        }
        i += 1
      }
      out(w) = word
      w += 1
    }
    new GenericArrayData(out)
  }

  /** Column-API entry: `vec` ARRAY<DOUBLE> → ARRAY<BIGINT> sign words. */
  def signSignature(vec: Column): Column =
    org.apache.spark.sql.graft.GraftSqlShim.column(
      SignSignatureExpression(
        org.apache.spark.sql.graft.GraftSqlShim.expression(vec)))
}
