package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Bounded-memory mergeable quantile sketch as a typed Spark [[Aggregator]]
  * — the third custom sketch beside the space-saving heavy hitters
  * ([[HeavyHitters]]) and Spark's built-in HLL (q15): the one that answers
  * "what are the p50/p90 of a 100 TB column" in one pass with O(k·log(n/k))
  * memory per partition, where the exact `percentile` (q54) must buffer
  * every group value in the final aggregation.
  *
  * Munro–Paterson / MRL-style multi-level buffer (the deterministic core of
  * the KLL family, public literature): level i holds items of weight 2^i,
  * at most k per level. A full level sorts and keeps every other element of
  * its even prefix (fixed offset 0 — compaction is deterministic, no RNG),
  * promoting the survivors to level i+1; when the level size is odd (possible
  * after merge() concatenation) the single leftover element is retained at
  * level i with its weight, so total sketch weight always equals the number
  * of values observed. Each compaction at level i perturbs any rank by
  * at most 2^i, giving a worst-case rank error of Σ c_i·2^i ≈ n·log₂(n/k)/k
  * over c_i compactions — `QuantileSketchSpec` asserts that derived bound
  * end-to-end through Spark's partial/merge machinery (merge ORDER
  * across partitions varies run to run, so the sketch result may vary
  * within the bound; the driver entry is rows-only for that reason, exactly
  * like the HLL query).
  *
  * Merging concatenates levels pairwise then re-compacts — associative and
  * commutative up to the documented error bound, so the aggregate runs as
  * standard partial+final ObjectHashAggregate.
  */
object QuantileSketch {

  final case class Sketch(levels: Seq[Seq[Double]])

  final class Quantiles(k: Int, probes: Seq[Double])
      extends Aggregator[Double, Sketch, Seq[Double]] {
    require(k >= 2 && probes.nonEmpty)

    override def zero: Sketch = Sketch(Seq(Vector.empty))

    /** keep-every-other compaction of a full level into the next. An odd
      * leftover element stays at level i (standard MRL behavior) so no
      * weight is ever dropped: 2·⌊s/2⌋ weight promotes, s−2·⌊s/2⌋ remains.
      */
    private def compact(levels: Array[Vector[Double]]): Array[Vector[Double]] = {
      var i = 0
      var ls = levels
      while (i < ls.length) {
        if (ls(i).size >= k) {
          val sorted = ls(i).sorted
          val survivors = Vector.tabulate(sorted.size / 2)(j => sorted(2 * j))
          if (i + 1 == ls.length) ls = ls :+ Vector.empty[Double]
          ls(i + 1) = ls(i + 1) ++ survivors
          ls(i) =
            if (sorted.size % 2 == 1) Vector(sorted.last) else Vector.empty
        }
        i += 1
      }
      ls
    }

    override def reduce(b: Sketch, x: Double): Sketch = {
      // Hot path: level 0 still has room — one Vector append, no compaction
      // cascade and no per-row rebuild of the whole level structure.
      val l0 = b.levels.head :+ x
      if (l0.size < k) Sketch(l0 +: b.levels.tail)
      else {
        val ls = b.levels.map(_.toVector).toArray
        ls(0) = l0.toVector
        Sketch(compact(ls).toSeq)
      }
    }

    override def merge(a: Sketch, b: Sketch): Sketch = {
      val n = math.max(a.levels.size, b.levels.size)
      val ls = Array.tabulate(n) { i =>
        val av = if (i < a.levels.size) a.levels(i).toVector else Vector.empty[Double]
        val bv = if (i < b.levels.size) b.levels(i).toVector else Vector.empty[Double]
        av ++ bv
      }
      // concatenation can reach 2(k-1) at a level; one cascade restores < k
      Sketch(compact(compact(ls)).toSeq)
    }

    /** Weighted quantiles: flatten to (value, 2^level), sort, walk the
      * cumulative weight to each probe's rank.
      */
    override def finish(r: Sketch): Seq[Double] = {
      val weighted = r.levels.zipWithIndex.flatMap { case (vs, i) =>
        vs.map(v => (v, 1L << i))
      }.sortBy(_._1)
      if (weighted.isEmpty) return probes.map(_ => Double.NaN)
      val total = weighted.iterator.map(_._2).sum
      probes.map { p =>
        val target = math.max(1L, math.ceil(p * total).toLong)
        var cum = 0L
        var idx = 0
        while (cum < target && idx < weighted.size) {
          cum += weighted(idx)._2
          idx += 1
        }
        weighted(math.min(idx - 1, weighted.size - 1))._1
      }
    }

    override def bufferEncoder: Encoder[Sketch] = Encoders.product[Sketch]
    override def outputEncoder: Encoder[Seq[Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
  }
}
