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
  * 4 hyperplane folds per row element-by-element.
  *
  * Exactly matches the SQL-expressible formulation the DuckDB oracle runs
  * (q42/q47): hyperplane j component i = `value_of_first_hex_digit(
  * md5("j:i")) - 7.5` (i.e. `instr('0123456789abcdef', ...) - 8.5`), dot
  * product accumulated left-to-right in doubles (the same IEEE fold order
  * as `aggregate(zip_with(...), 0.0, (acc, x) -> acc + x)`), signature char
  * j = '1' iff the dot is > 0. A vector whose length differs from `Dim`
  * yields all-'0' chars — the column formulation's null-contaminated-sum
  * behavior.
  */
case class LshSignatureExpression(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def nullSafeEval(input: Any): Any =
    LshSignatureExpression.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.LshSignatureExpression.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object LshSignatureExpression {
  final val Dim = 64
  final val NBits = 4

  /** md5-derived deterministic hyperplanes, identical to the SQL fragment
    * `instr('0123456789abcdef', substring(md5('j:i'), 1, 1)) - 8.5`.
    */
  private lazy val planes: Array[Array[Double]] = {
    val md = MessageDigest.getInstance("MD5")
    Array.tabulate(NBits, Dim) { (j, i) =>
      md.reset()
      val d = md.digest(s"$j:$i".getBytes(StandardCharsets.UTF_8))
      ((d(0) >>> 4) & 0xF) - 7.5
    }
  }

  /** Static kernel shared by interpreted eval and generated code. */
  def compute(arr: ArrayData): UTF8String = {
    val n = arr.numElements()
    val out = new Array[Byte](NBits)
    var j = 0
    while (j < NBits) {
      var bit = '0'.toByte
      if (n == Dim) {
        val p = planes(j)
        var s = 0.0
        var i = 0
        while (i < Dim) {
          s += arr.getFloat(i).toDouble * p(i)
          i += 1
        }
        if (s > 0) bit = '1'.toByte
      }
      out(j) = bit
      j += 1
    }
    UTF8String.fromBytes(out)
  }

  /** Column-API entry point. */
  def lshSignature(c: Column): Column =
    org.apache.spark.sql.graft.GraftSqlShim.column(
      LshSignatureExpression(
        org.apache.spark.sql.graft.GraftSqlShim.expression(c)))
}
