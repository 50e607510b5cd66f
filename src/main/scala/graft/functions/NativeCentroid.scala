package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Per-group mean vector as a NATIVE [[TypedImperativeAggregate]] — the
  * non-typed successor of [[VecCentroid]] (same (sums, count) buffer, same
  * per-partition accumulation order, same empty-group contract), run
  * directly over InternalRows with no Dataset-encoder round trip per input
  * row. The Lloyd training chains (q84/q179/q204/q244/q245/q270) pay the
  * centroid aggregation once per refinement pass per corpus row, so the
  * encoder removal multiplies across the whole trained-IVF tier. Shuffle
  * shape is unchanged: one O(dim) buffer per group per partition.
  *
  * Bit-identity with the typed Aggregator is pinned by NativeCentroidSpec.
  */
object NativeCentroid {

  /** (element sums, row count); fails loudly on ragged input exactly like
    * VecCentroid (a silently zero-padded centroid would be plausible and
    * wrong). */
  final class Buf(val dim: Int) {
    val sums = new Array[Double](dim)
    var n: Long = 0L
  }

  case class CentroidAggregate(
      vec: Expression,
      dim: Int,
      mutableAggBufferOffset: Int = 0,
      inputAggBufferOffset: Int = 0)
      extends TypedImperativeAggregate[Buf] {
    require(dim >= 1, s"dim must be >= 1, got $dim")

    override def children: Seq[Expression] = Seq(vec)
    override def checkInputDataTypes(): TypeCheckResult = vec.dataType match {
      case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"centroid requires ARRAY<DOUBLE>, got ${t.sql}")
    }
    override def dataType: DataType =
      ArrayType(DoubleType, containsNull = false)
    override def nullable: Boolean = false

    override def createAggregationBuffer(): Buf = new Buf(dim)

    override def update(buffer: Buf, input: InternalRow): Buf = {
      val v = vec.eval(input)
      if (v != null) {
        val a = v.asInstanceOf[ArrayData]
        require(a.numElements() == dim,
          s"centroid aggregator of dim $dim fed a vector of length " +
            s"${a.numElements()}")
        var i = 0
        while (i < dim) { buffer.sums(i) += a.getDouble(i); i += 1 }
        buffer.n += 1
      }
      buffer
    }

    override def merge(buffer: Buf, input: Buf): Buf = {
      var i = 0
      while (i < dim) { buffer.sums(i) += input.sums(i); i += 1 }
      buffer.n += input.n
      buffer
    }

    override def eval(buffer: Buf): Any =
      if (buffer.n == 0L) new GenericArrayData(Array.empty[Any])
      else {
        val out = new Array[Double](dim)
        var i = 0
        while (i < dim) { out(i) = buffer.sums(i) / buffer.n; i += 1 }
        new GenericArrayData(out)
      }

    override def serialize(buffer: Buf): Array[Byte] = {
      val bb = ByteBuffer.allocate(12 + 8 * dim)
      bb.putInt(dim)
      bb.putLong(buffer.n)
      var i = 0
      while (i < dim) { bb.putDouble(buffer.sums(i)); i += 1 }
      bb.array()
    }

    override def deserialize(bytes: Array[Byte]): Buf = {
      val bb = ByteBuffer.wrap(bytes)
      val d = bb.getInt()
      val buf = new Buf(d)
      buf.n = bb.getLong()
      var i = 0
      while (i < d) { buf.sums(i) = bb.getDouble(); i += 1 }
      buf
    }

    override def withNewMutableAggBufferOffset(newOffset: Int): CentroidAggregate =
      copy(mutableAggBufferOffset = newOffset)
    override def withNewInputAggBufferOffset(newOffset: Int): CentroidAggregate =
      copy(inputAggBufferOffset = newOffset)
    override protected def withNewChildrenInternal(
        newChildren: IndexedSeq[Expression]): Expression =
      copy(vec = newChildren(0))
    override def prettyName: String = "centroid"
  }

  /** Column API: per-group element-wise mean of fixed-`dim` ARRAY<DOUBLE>
    * vectors (empty array for an all-NULL group, like VecCentroid). */
  def centroid(vec: Column, dim: Int): Column =
    org.apache.spark.sql.graft.GraftSqlShim.column(
      CentroidAggregate(
        org.apache.spark.sql.graft.GraftSqlShim.expression(vec),
        dim).toAggregateExpression())
}
