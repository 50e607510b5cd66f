package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Per-group mean vector as a typed [[Aggregator]] — the codebook-training
  * primitive behind IVF indexing (q43 assigns to a codebook; this is how a
  * pipeline computes one). Single pass, O(dim) state per group: the
  * partial+final hash aggregation ships one (sums, count) buffer per group
  * per partition instead of exploding rows x dim through a shuffle — at
  * 100 TB that is the difference between a vector-width and a
  * corpus-width shuffle.
  */
object VecCentroid {

  final class Centroid(dim: Int)
      extends Aggregator[Seq[Double], (Array[Double], Long), Seq[Double]] {

    override def zero: (Array[Double], Long) = (new Array[Double](dim), 0L)

    override def reduce(
        b: (Array[Double], Long), v: Seq[Double]): (Array[Double], Long) = {
      // fail loudly on ragged input: silently zero-padding/truncating would
      // produce a wrong centroid that still looks plausible
      require(v.length == dim,
        s"centroid aggregator of dim $dim fed a vector of length ${v.length}")
      val acc = b._1
      var i = 0
      while (i < dim) { acc(i) += v(i); i += 1 }
      (acc, b._2 + 1)
    }

    override def merge(
        a: (Array[Double], Long), b: (Array[Double], Long)): (Array[Double], Long) = {
      val acc = a._1
      var i = 0
      while (i < dim) { acc(i) += b._1(i); i += 1 }
      (acc, a._2 + b._2)
    }

    override def finish(r: (Array[Double], Long)): Seq[Double] =
      if (r._2 == 0L) Seq.empty
      else r._1.map(_ / r._2).toSeq

    override def bufferEncoder: Encoder[(Array[Double], Long)] =
      Encoders.tuple(ExpressionEncoder[Array[Double]](), Encoders.scalaLong)

    override def outputEncoder: Encoder[Seq[Double]] =
      ExpressionEncoder[Seq[Double]]()
  }
}
