package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** 16-bit SimHash over whitespace word tokens as a native Catalyst
  * expression WITH codegen. The interpreted SQL formulation re-split the
  * text and re-hashed every word once per bit (16x); this kernel hashes
  * each word once and votes all 16 bits from the digest's first two bytes.
  *
  * Exactly matches the SQL formulation the DuckDB oracle runs (q39): token
  * list = `split(trim(text), '\s+')` (Spark trim = space-only trim,
  * Java-regex split with limit -1, so a leading tab still yields an empty
  * first token — replicated via UTF8String.trim + String.split); bit k of
  * word w = bit `3 - k%4` of hex digit `k/4` of md5(w); fingerprint bit k
  * set iff strictly more than half the tokens (occurrences, not distinct)
  * vote 1.
  */
case class SimHashExpression(child: Expression) extends UnaryExpression {

  override def dataType: DataType = IntegerType

  override def nullSafeEval(input: Any): Any =
    SimHashExpression.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.SimHashExpression.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHashExpression {
  final val NBits = 16

  private val tlMd = ThreadLocal.withInitial[MessageDigest](() =>
    MessageDigest.getInstance("MD5"))
  // reused digest scratch — md.digest() would allocate 16 bytes per word
  private val tlBuf = ThreadLocal.withInitial[Array[Byte]](() =>
    new Array[Byte](16))

  /** Static kernel shared by interpreted eval and generated code. */
  def compute(s: UTF8String): Int = {
    // Spark's trim() strips 0x20 only; String.split("\s+", -1) is exactly
    // what Spark's split(str, regex) does
    val words = s.trim().toString.split("\\s+", -1)
    val n = words.length
    val votes = new Array[Int](NBits)
    val md = tlMd.get()
    val d = tlBuf.get()
    var w = 0
    while (w < n) {
      md.reset()
      md.update(words(w).getBytes(StandardCharsets.UTF_8))
      md.digest(d, 0, 16)
      // first 4 hex digits live in digest bytes 0-1, high nibble first
      var k = 0
      while (k < NBits) {
        val digit = (d(k / 8) >>> (if ((k / 4) % 2 == 0) 4 else 0)) & 0xF
        votes(k) += (digit >>> (3 - k % 4)) & 1
        k += 1
      }
      w += 1
    }
    var h = 0
    var k = 0
    while (k < NBits) {
      if (2 * votes(k) > n) h |= 1 << k
      k += 1
    }
    h
  }

  /** Column-API entry point. */
  def simhash(c: Column): Column =
    org.apache.spark.sql.graft.GraftSqlShim.column(
      SimHashExpression(
        org.apache.spark.sql.graft.GraftSqlShim.expression(c)))
}

/** 60-bit SimHash — the radius-search-grade fingerprint (r12). The 16-bit
  * form above is fine for exact-fingerprint grouping (q39), but a radius
  * search's pigeonhole bands over 16 bits give at most 2^5–2^6 buckets per
  * band, so candidate pairs grow ~n²/64: the r12 two-decade scale curve
  * measured q102 at 22.6× for 10× rows — the one super-linear entry in the
  * catalog — and this kernel is the fix. 60 bits = 15 md5 hex digits (the
  * same bit recipe as the 16-bit form, extended), leaving the BIGINT sign
  * bit clear so the DuckDB twin can assemble the fingerprint with
  * `list_sum(1::BIGINT << k)` without overflow; 3 pigeonhole bands of 20
  * bits give 2^20 buckets per band (a 2^15 candidate reduction vs 16-bit),
  * and band width grows with fingerprint width if a larger corpus needs
  * more.
  */
case class SimHash64Expression(child: Expression) extends UnaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.LongType

  override def nullSafeEval(input: Any): Any =
    SimHash64Expression.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.SimHash64Expression.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHash64Expression {
  final val NBits = 60

  private val tlMd = ThreadLocal.withInitial[MessageDigest](() =>
    MessageDigest.getInstance("MD5"))
  private val tlBuf = ThreadLocal.withInitial[Array[Byte]](() =>
    new Array[Byte](16))

  /** Static kernel shared by interpreted eval and generated code; bit k of
    * word w = bit `3 - k%4` of hex digit `k/4` of md5(w), exactly the
    * 16-bit recipe continued through hex digit 14.
    */
  def compute(s: UTF8String): Long = {
    val words = s.trim().toString.split("\\s+", -1)
    val n = words.length
    val votes = new Array[Int](NBits)
    val md = tlMd.get()
    val d = tlBuf.get()
    var w = 0
    while (w < n) {
      md.reset()
      md.update(words(w).getBytes(StandardCharsets.UTF_8))
      md.digest(d, 0, 16)
      var k = 0
      while (k < NBits) {
        val digit = (d(k / 8) >>> (if ((k / 4) % 2 == 0) 4 else 0)) & 0xF
        votes(k) += (digit >>> (3 - k % 4)) & 1
        k += 1
      }
      w += 1
    }
    var h = 0L
    var k = 0
    while (k < NBits) {
      if (2 * votes(k) > n) h |= 1L << k
      k += 1
    }
    h
  }

  /** Column-API entry point. */
  def simhash64(c: Column): Column =
    org.apache.spark.sql.graft.GraftSqlShim.column(
      SimHash64Expression(
        org.apache.spark.sql.graft.GraftSqlShim.expression(c)))
}
