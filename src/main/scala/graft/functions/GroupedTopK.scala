package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Per-group top-k as a typed, mergeable [[Aggregator]] — the scalable
  * replacement for the `row_number().over(Window.partitionBy(g).orderBy(v))
  * <= k` idiom. The window form shuffles and SORTS every row of every group;
  * this aggregator keeps a k-bounded ordered buffer per group, runs as a
  * normal partial+final hash aggregation (map-side partials shrink each
  * partition's contribution to <= k rows per group before the shuffle), and
  * never sorts anything larger than k. At 100 TB the shuffle carries
  * O(k * groups) rows instead of the corpus.
  *
  * Ordering is total and deterministic: score DESC, then key ASC — ties
  * cannot reorder across partition-merge schedules, so the result is
  * hash-comparable against a windowed SQL oracle.
  *
  * The common-case `reduce` path is O(1): a row worse than the current k-th
  * entry is rejected without allocation (the overwhelming majority of rows
  * once the buffer warms up).
  */
object GroupedTopK {

  /** One candidate: the ranking score and a unique tie-break key. */
  final case class Entry(score: Double, key: Long)

  /** Buffer: entries sorted by (score DESC, key ASC), size <= k. */
  final case class Buf(entries: Seq[Entry])

  // java.lang.Double.compare, not >/==: primitive comparisons make NaN
  // neither beat nor lose, which breaks the sorted-buffer invariant and the
  // claimed total order (round-5 ADVICE — a zero-norm embedding feeding a
  // cosine score is enough to produce one). Double.compare totally orders
  // NaN above +Infinity, so NaN-scored entries rank first, deterministically.
  private def beats(a: Entry, b: Entry): Boolean = {
    val c = java.lang.Double.compare(a.score, b.score)
    c > 0 || (c == 0 && a.key < b.key)
  }

  final class TopK(k: Int) extends Aggregator[Entry, Buf, Seq[Entry]] {
    require(k >= 1, s"k must be >= 1, got $k")

    override def zero: Buf = Buf(Vector.empty)

    override def reduce(b: Buf, e0: Entry): Buf = {
      // Normalize -0.0 to 0.0 on entry: Double.compare ranks 0.0 above -0.0,
      // but the SQL oracles' ORDER BY treats them equal and falls through to
      // the key tie-break — a rounded -0.0 at the k-boundary must not order
      // differently than DuckDB's row_number (round-6 ADVICE).
      val e = if (e0.score == 0.0d) Entry(0.0d, e0.key) else e0
      val es = b.entries
      // fast reject: buffer full and e does not beat the current k-th
      if (es.size >= k && !beats(e, es.last)) b
      else {
        val i = es.indexWhere(x => beats(e, x)) match {
          case -1 => es.size
          case n => n
        }
        Buf(((es.take(i) :+ e) ++ es.drop(i)).take(k))
      }
    }

    override def merge(a: Buf, b: Buf): Buf = {
      // merge two sorted runs, stop at k — O(k), no re-sort
      val out = Vector.newBuilder[Entry]
      var (i, j, n) = (0, 0, 0)
      val (xs, ys) = (a.entries, b.entries)
      while (n < k && (i < xs.size || j < ys.size)) {
        val takeX = j >= ys.size || (i < xs.size && beats(xs(i), ys(j)))
        if (takeX) { out += xs(i); i += 1 } else { out += ys(j); j += 1 }
        n += 1
      }
      Buf(out.result())
    }

    override def finish(r: Buf): Seq[Entry] = r.entries

    override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
    override def outputEncoder: Encoder[Seq[Entry]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Entry]]()
  }
}
