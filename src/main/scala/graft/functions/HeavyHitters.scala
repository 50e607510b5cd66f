package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Space-saving heavy-hitters sketch as a typed Spark [[Aggregator]] — the
  * custom-aggregation machinery piece of the engine (SURVEY §7 "custom vs
  * built-in": the one aggregate shape stock Spark lacks).
  *
  * Metwally et al.'s Space-Saving algorithm: keep at most `capacity`
  * counters; an unseen item evicts the minimum counter and inherits its
  * count (+1), bounding the overestimate by the evicted count. Buffers merge
  * associatively (sum counts, re-truncate), so the aggregate runs as normal
  * partial+final hash aggregation — at 100 TB this finds top tokens with
  * O(capacity) memory per partition instead of a corpus-wide groupBy
  * shuffle over every distinct token.
  *
  * When `capacity` exceeds the true distinct count the sketch degrades to
  * exact counting — which is what the driver-checked query `q53` exploits to
  * stay DuckDB-oracle-comparable while still exercising this code path.
  */
object HeavyHitters {

  /** counter map + total evicted-mass bound (0 while exact). */
  final case class Sketch(counts: Map[String, Long], evicted: Long)

  final class TopK(capacity: Int)
      extends Aggregator[Seq[String], Sketch, (Map[String, Long], Long)] {

    override def zero: Sketch = Sketch(Map.empty, 0L)

    private def add(m: mutable.Map[String, Long], item: String, by: Long): Unit =
      m.update(item, m.getOrElse(item, 0L) + by)

    private def truncate(m: mutable.Map[String, Long]): Long = {
      var evicted = 0L
      while (m.size > capacity) {
        val (k, v) = m.minBy { case (k, v) => (v, k) }
        m.remove(k)
        evicted = math.max(evicted, v)
        // space-saving: the next new item would inherit the evicted count;
        // merging post-truncation keeps the standard error bound
      }
      evicted
    }

    override def reduce(b: Sketch, items: Seq[String]): Sketch = {
      val m = mutable.Map.from(b.counts)
      var evicted = b.evicted
      items.foreach { it =>
        if (m.contains(it) || m.size < capacity) add(m, it, 1L)
        else {
          // evict min, inherit its count + 1; the evicted count is the
          // overestimate bound — track it so exactness stays observable
          val (mk, mv) = m.minBy { case (k, v) => (v, k) }
          m.remove(mk)
          m.update(it, mv + 1L)
          evicted = math.max(evicted, mv)
        }
      }
      Sketch(m.toMap, evicted)
    }

    override def merge(a: Sketch, b: Sketch): Sketch = {
      val m = mutable.Map.from(a.counts)
      b.counts.foreach { case (k, v) => add(m, k, v) }
      val ev = truncate(m)
      // mergeable-summaries error bounds ADD across merged sketches (an
      // item may carry overestimate from both inputs plus this truncation);
      // max would understate the bound in the approximate regime
      Sketch(m.toMap, a.evicted + b.evicted + ev)
    }

    /** Result = (counters, summed evicted bound — per-stream max within a
      * partition, added across merged partials). The bound is 0 iff the
      * sketch never hit capacity and is therefore exact; oracle-paired
      * queries expose it as an output column so the verify harness detects
      * a silent switch to approximate mode (round-2 ADVICE) instead of a
      * nondeterministic hash mismatch.
      */
    override def finish(r: Sketch): (Map[String, Long], Long) =
      (r.counts, r.evicted)

    override def bufferEncoder: Encoder[Sketch] = Encoders.product[Sketch]
    // ExpressionEncoder so the result is a real (MapType, Long) struct column
    // (explodable), not an opaque kryo binary
    override def outputEncoder: Encoder[(Map[String, Long], Long)] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Map[String, Long], Long)]()
  }
}
