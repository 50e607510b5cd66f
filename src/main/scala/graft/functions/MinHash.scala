package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Full MinHash signature (8 permutations over char-5-gram shingles) as a
  * native Catalyst expression WITH codegen: one tight pass over the
  * document's UTF-8 bytes computing two md5 digests per shingle and tracking
  * eight 32-bit minima — replaces an interpreted
  * `transform(...md5...) + array_min` higher-order chain that allocated
  * three intermediate arrays (shingles, hashes x2) per row.
  *
  * Exactly matches the SQL-expressible formulation the DuckDB oracle runs
  * (q36-q38): permutation j in 0-3 is the j-th 8-hex window of
  * `md5(shingle)`, j in 4-7 the windows of `md5('x' || shingle)`;
  * lexicographic min of fixed-width lowercase hex == numeric min of the
  * unsigned 32-bit window, which is what the kernel tracks. Shingles are
  * code-point based (what `substr(text, i, 5)` sees in Spark and DuckDB
  * alike), walked here as UTF-8 byte slices without materializing strings.
  * Texts shorter than one shingle yield all-null signature entries, matching
  * `list_min([]) = NULL` in the oracle.
  */
case class MinHashSignatureExpression(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = true)

  override def nullSafeEval(input: Any): Any =
    MinHashSignatureExpression.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.MinHashSignatureExpression.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashSignatureExpression {
  final val ShingleLen = 5
  final val NumHashes = 8

  private val tlMd = ThreadLocal.withInitial[MessageDigest](() =>
    MessageDigest.getInstance("MD5"))
  // digest scratch reused across calls: md.digest() allocates a fresh
  // 16-byte array per invocation — at 2 digests per shingle that is tens of
  // millions of throwaway allocations per corpus pass
  private val tlBuf = ThreadLocal.withInitial[Array[Byte]](() =>
    new Array[Byte](32))

  @inline private def utf8CharLen(b: Byte): Int = {
    val u = b & 0xFF
    if (u < 0x80) 1 else if (u < 0xE0) 2 else if (u < 0xF0) 3 else 4
  }

  @inline private def uint32(d: Array[Byte], off: Int): Long =
    ((d(off) & 0xFFL) << 24) | ((d(off + 1) & 0xFFL) << 16) |
      ((d(off + 2) & 0xFFL) << 8) | (d(off + 3) & 0xFFL)

  /** Static kernel shared by interpreted eval and generated code. */
  def compute(s: UTF8String): ArrayData = {
    val bytes = s.getBytes
    val n = bytes.length
    // code-point start offsets (offs(cp) = byte offset of cp-th char)
    val offs = new Array[Int](n + 1)
    var cp = 0
    var i = 0
    while (i < n) { offs(cp) = i; i += utf8CharLen(bytes(i)); cp += 1 }
    offs(cp) = n
    val nSh = cp - (ShingleLen - 1)
    if (nSh <= 0)
      return new GenericArrayData(new Array[Any](NumHashes)) // all-null
    val mins = Array.fill(NumHashes)(0xFFFFFFFFL)
    val md = tlMd.get()
    val buf = tlBuf.get()
    var k = 0
    while (k < nSh) {
      val from = offs(k)
      val len = offs(k + ShingleLen) - from
      md.reset()
      md.update(bytes, from, len)
      md.digest(buf, 0, 16)
      md.reset()
      md.update('x'.toByte)
      md.update(bytes, from, len)
      md.digest(buf, 16, 16)
      var j = 0
      while (j < 4) {
        val v1 = uint32(buf, j * 4)
        if (v1 < mins(j)) mins(j) = v1
        val v2 = uint32(buf, 16 + j * 4)
        if (v2 < mins(j + 4)) mins(j + 4) = v2
        j += 1
      }
      k += 1
    }
    val out = new Array[Any](NumHashes)
    var j = 0
    while (j < NumHashes) {
      out(j) = UTF8String.fromString(f"${mins(j)}%08x")
      j += 1
    }
    new GenericArrayData(out)
  }

  /** Column-API entry point: array of 8 hex minhash values. */
  def minhashSignature(c: Column): Column =
    org.apache.spark.sql.graft.GraftSqlShim.column(
      MinHashSignatureExpression(
        org.apache.spark.sql.graft.GraftSqlShim.expression(c)))
}
