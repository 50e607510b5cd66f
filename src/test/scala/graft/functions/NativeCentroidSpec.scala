package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Pins [[NativeCentroid]] BIT-FOR-BIT to the typed [[VecCentroid]]
  * Aggregator it replaces at every Lloyd-chain call site: same
  * per-partition accumulation order, same merge arithmetic, same
  * empty-group contract — so swapping a call site never changes a value,
  * only how it is computed.
  */
class NativeCentroidSpec extends AnyFunSuite {

  private def vecs(n: Int, dim: Int): Seq[Seq[Double]] =
    (0 until n).map(i => (0 until dim).map(j =>
      ((i * 31 + j * 17) % 101 - 50) / 7.0))

  private def nativeOf(xs: Seq[Seq[Double]], dim: Int): NativeCentroid.Buf = {
    val agg = NativeCentroid.CentroidAggregate(
      org.apache.spark.sql.catalyst.expressions.BoundReference(0,
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.DoubleType), nullable = true),
      dim)
    xs.foldLeft(agg.createAggregationBuffer()) { (b, v) =>
      agg.update(b, org.apache.spark.sql.catalyst.InternalRow(
        org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(v.toArray)))
    }
  }

  private def nativeEval(b: NativeCentroid.Buf): Seq[Double] = {
    val agg = NativeCentroid.CentroidAggregate(
      org.apache.spark.sql.catalyst.expressions.BoundReference(0,
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.DoubleType), nullable = true),
      b.dim)
    agg.eval(b).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      .toDoubleArray().toSeq
  }

  test("stream accumulation matches the typed Aggregator bit-for-bit") {
    val dim = 5
    val typed = new VecCentroid.Centroid(dim)
    for (n <- Seq(1, 7, 100)) {
      val xs = vecs(n, dim)
      val want = typed.finish(xs.foldLeft(typed.zero)(typed.reduce))
      val got = nativeEval(nativeOf(xs, dim))
      assert(got.map(java.lang.Double.doubleToRawLongBits) ==
        want.map(java.lang.Double.doubleToRawLongBits), s"n=$n")
    }
  }

  test("merge matches the typed merge under arbitrary splits") {
    val dim = 4
    val typed = new VecCentroid.Centroid(dim)
    val xs = vecs(60, dim)
    for (cut <- Seq(0, 1, 30, 59, 60)) {
      val (a, b) = xs.splitAt(cut)
      // the typed reference must merge the SAME split — partial-sum
      // association differs bitwise from one unsplit stream
      val want = typed.finish(typed.merge(
        a.foldLeft(typed.zero)(typed.reduce),
        b.foldLeft(typed.zero)(typed.reduce)))
      val agg = NativeCentroid.CentroidAggregate(
        org.apache.spark.sql.catalyst.expressions.BoundReference(0,
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.DoubleType), nullable = true),
        dim)
      val m = agg.merge(nativeOf(a, dim), nativeOf(b, dim))
      assert(nativeEval(m).map(java.lang.Double.doubleToRawLongBits) ==
        want.map(java.lang.Double.doubleToRawLongBits), s"cut=$cut")
    }
  }

  test("serialize round-trips; empty buffer evals to the empty array") {
    val dim = 3
    val b = nativeOf(vecs(9, dim), dim)
    val agg = NativeCentroid.CentroidAggregate(
      org.apache.spark.sql.catalyst.expressions.BoundReference(0,
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.DoubleType), nullable = true),
      dim)
    val r = agg.deserialize(agg.serialize(b))
    assert(r.n == b.n && r.sums.toSeq == b.sums.toSeq)
    val empty = agg.createAggregationBuffer()
    assert(agg.eval(empty)
      .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      .numElements() == 0)
  }

  test("ragged input fails loudly, like the typed Aggregator") {
    val agg = NativeCentroid.CentroidAggregate(
      org.apache.spark.sql.catalyst.expressions.BoundReference(0,
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.DoubleType), nullable = true),
      4)
    val b = agg.createAggregationBuffer()
    intercept[IllegalArgumentException] {
      agg.update(b, org.apache.spark.sql.catalyst.InternalRow(
        org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
          Array(1.0, 2.0))))
    }
  }
}
