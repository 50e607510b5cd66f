package graft.functions

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.unsafe.types.UTF8String

/** Property pins for [[MinimizerOffsetsExpression]]'s kernel against an
  * independent per-offset reference (plain fold hash + window minimum scan
  * — the exact computation the DuckDB oracle runs in SQL): the rolling
  * update may never drift from the fold, and selection must be exactly
  * "hash minimal over the clipped w-window the offset opens".
  */
class MinimizerSpec extends AnyFunSuite {

  private def reference(t: String, spanLen: Int, w: Int): Seq[Int] = {
    val n = math.max(t.length - spanLen + 1, 1)
    def fold(p: Int): Long = {
      var acc = 0L
      var i = p
      val end = math.min(p + spanLen, t.length)
      while (i < end) { acc = (acc * 31 + t.charAt(i)) % 1000000007L; i += 1 }
      acc
    }
    val h = (0 until n).map(fold)
    (0 until n).filter(p => h(p) == h.slice(p, math.min(p + w, n)).min)
      .map(_ + 1)
  }

  private def kernel(t: String, spanLen: Int, w: Int): Seq[Int] =
    MinimizerOffsetsExpression.compute(UTF8String.fromString(t), spanLen, w)
      .toIntArray().toSeq

  private def holds(name: String)(p: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(300), p)
    assert(res.passed, s"$name: ${res.status}")
  }

  test("kernel offsets equal the per-offset fold reference on random text") {
    val genText = Gen.listOf(Gen.oneOf(
      Gen.alphaNumChar, Gen.const(' '))).map(_.mkString)
    holds("minimizer") {
      Prop.forAll(genText, Gen.choose(1, 12), Gen.choose(1, 10)) {
        (t, spanLen, w) =>
          kernel(t, spanLen, w) == reference(t, spanLen, w)
      }
    }
  }

  test("short text yields the single whole-text offset") {
    assert(kernel("abc", 30, 8) == Seq(1))
    assert(kernel("", 30, 8) == Seq(1))
  }

  test("selection is position-independent (content-defined)") {
    // the property q171's co-selection rests on: the offsets selected
    // INSIDE a long shared region do not depend on what surrounds it,
    // because both hash and window look only at local content
    val shared = "a shared region long enough to open many interior windows"
    val (pre1, pre2) = ("xxxx ", "completely different and longer prefix ")
    def interior(prefix: String): Seq[Int] = {
      val t = prefix + shared + " suffix"
      // interior = selections whose whole window+span sits inside `shared`
      kernel(t, 10, 4)
        .filter(p => p > prefix.length + 1 &&
          p + 10 + 4 - 1 <= prefix.length + shared.length)
        .map(_ - prefix.length)
    }
    val (i1, i2) = (interior(pre1), interior(pre2))
    assert(i1.nonEmpty && i1 == i2,
      s"interior selections depend on context: $i1 vs $i2")
  }
}
