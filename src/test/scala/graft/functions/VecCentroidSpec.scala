package graft.functions

import org.scalatest.funsuite.AnyFunSuite

class VecCentroidSpec extends AnyFunSuite {

  private def agg = new VecCentroid.Centroid(3)

  test("reduce + merge compute the exact mean regardless of partitioning") {
    val vs = Seq(Seq(1.0, 2.0, 3.0), Seq(3.0, 2.0, 1.0), Seq(2.0, 2.0, 2.0),
      Seq(6.0, 0.0, 0.0))
    // one partition
    val all = vs.foldLeft(agg.zero)(agg.reduce)
    assert(agg.finish(all) == Seq(3.0, 1.5, 1.5))
    // two partitions merged
    val (l, r) = vs.splitAt(2)
    val merged = agg.merge(
      l.foldLeft(agg.zero)(agg.reduce), r.foldLeft(agg.zero)(agg.reduce))
    assert(agg.finish(merged) == Seq(3.0, 1.5, 1.5))
  }

  test("empty group finishes to an empty vector, not NaNs") {
    assert(agg.finish(agg.zero) == Seq.empty)
  }

  test("ragged input is rejected loudly") {
    val e = intercept[IllegalArgumentException] {
      agg.reduce(agg.zero, Seq(1.0, 2.0))
    }
    assert(e.getMessage.contains("length 2"))
  }
}
