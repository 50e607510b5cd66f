package graft.functions

import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** Pins [[IntersectCountExpression.count]] to the `size(array_intersect)`
  * contract it replaces in q120/q139: distinct common elements count once,
  * duplicates never double-count, a null element present in both sides
  * counts once, and the small/large side swap is invisible.
  */
class IntersectCountSpec extends AnyFunSuite {

  private def arr(xs: Seq[String]): ArrayData =
    ArrayData.toArrayData(xs.map(x =>
      if (x == null) null else UTF8String.fromString(x)).toArray)

  private def reference(a: Seq[String], b: Seq[String]): Int = {
    val sa = a.toSet
    val sb = b.toSet
    sa.intersect(sb).size // null participates as an element, like ArrayIntersect
  }

  private def cases: Seq[(Seq[String], Seq[String])] = Seq(
    (Seq("a", "b", "c"), Seq("b", "c", "d")),
    (Seq(), Seq("a")),
    (Seq("a"), Seq()),
    (Seq("a", "a", "b"), Seq("a", "a", "a")), // duplicates count once
    (Seq("x", null, "y"), Seq(null, "z")), // shared null counts once
    (Seq(null, null), Seq(null)),
    (Seq("a", "b"), Seq("c", "d")),
    ((0 until 200).map(i => s"t$i"), (100 until 300).map(i => s"t$i")),
    ((0 until 5).map(i => s"t$i"), (0 until 500).map(i => s"t${i % 7}")))

  test("matches the distinct-intersection reference, both argument orders") {
    for ((a, b) <- cases) {
      assert(IntersectCountExpression.count(arr(a), arr(b)) == reference(a, b),
        s"a=$a b=$b")
      assert(IntersectCountExpression.count(arr(b), arr(a)) == reference(a, b),
        s"swapped a=$a b=$b")
    }
  }
}
