package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Random-hyperplane LSH signature over an `Array[Float]` embedding as a
  * native Catalyst expression WITH codegen — replaces an interpreted
  * `concat(when(aggregate(zip_with(...)) > 0, ...))` chain that re-evaluated
  * every hyperplane fold per row element-by-element.
  *
  * Exactly matches the SQL-expressible formulation the DuckDB oracle runs
  * (q42/q47): hyperplane j component i = `value_of_first_hex_digit(
  * md5("j:i")) - 7.5` (i.e. `instr('0123456789abcdef', ...) - 8.5`), dot
  * product accumulated left-to-right in doubles (the same IEEE fold order
  * as `aggregate(zip_with(...), 0.0, (acc, x) -> acc + x)`), signature char
  * j = '1' iff the dot is > 0. A vector whose length differs from `Dim`
  * yields all-'0' chars, and a null element anywhere in the array forces
  * every char to '0' — both mirror the column formulation's
  * null-contaminated-sum behavior (`NULL > 0` is not true).
  *
  * `nBits` is the signature width: q42 buckets on a 4-bit signature (one
  * probe bucket), q47 cuts a 32-bit signature into 4 × 8-bit bands. Planes
  * are indexed globally (plane j is plane j at every width), so widening a
  * signature only appends chars.
  */
case class LshSignatureExpression(child: Expression, nBits: Int)
    extends UnaryExpression {

  override def dataType: DataType = StringType

  override def nullSafeEval(input: Any): Any =
    LshSignatureExpression.compute(input.asInstanceOf[ArrayData], nBits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.LshSignatureExpression.compute($c, $nBits)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object LshSignatureExpression {
  final val Dim = 64
  final val MaxBits = 32

  /** md5-derived deterministic hyperplanes, identical to the SQL fragment
    * `instr('0123456789abcdef', substring(md5('j:i'), 1, 1)) - 8.5`.
    */
  private lazy val planes: Array[Array[Double]] = {
    val md = MessageDigest.getInstance("MD5")
    Array.tabulate(MaxBits, Dim) { (j, i) =>
      md.reset()
      val d = md.digest(s"$j:$i".getBytes(StandardCharsets.UTF_8))
      ((d(0) >>> 4) & 0xF) - 7.5
    }
  }

  /** Static kernel shared by interpreted eval and generated code. */
  def compute(arr: ArrayData, nBits: Int): UTF8String = {
    val n = arr.numElements()
    val out = new Array[Byte](nBits)
    // a null element poisons every dot product (SQL: sum with a NULL term is
    // NULL, and NULL > 0 selects the '0' branch) — same for a length mismatch
    var clean = n == Dim
    var i = 0
    while (clean && i < Dim) {
      if (arr.isNullAt(i)) clean = false
      i += 1
    }
    var j = 0
    while (j < nBits) {
      var bit = '0'.toByte
      if (clean) {
        val p = planes(j)
        var s = 0.0
        var k = 0
        while (k < Dim) {
          s += arr.getFloat(k).toDouble * p(k)
          k += 1
        }
        if (s > 0) bit = '1'.toByte
      }
      out(j) = bit
      j += 1
    }
    UTF8String.fromBytes(out)
  }

  /** Column-API entry point. */
  def lshSignature(c: Column, nBits: Int): Column =
    org.apache.spark.sql.graft.GraftSqlShim.column(
      LshSignatureExpression(
        org.apache.spark.sql.graft.GraftSqlShim.expression(c), nBits))
}
