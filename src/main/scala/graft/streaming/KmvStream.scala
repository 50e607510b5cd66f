package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming KMV distinct sketch — the perpetual-ingest twin of the batch
  * k-minimum-values tier (q280): maintain, per source, the k smallest
  * distinct 60-bit md5 hashes of the tokens seen so far, and emit each
  * touched source's refreshed distinct-count estimate after every
  * micro-batch. This is the canonical streaming use of a mergeable sketch:
  * O(k) state per key forever, and two keys' states union into the exact
  * sketch of their combined stream (the k smallest of the two k-sets),
  * so shard-level states roll up to fleet-level estimates without
  * re-reading history — the property `KmvStreamSpec` proves bit-exactly
  * against the batch construction.
  *
  * Hashing happens OUTSIDE the stateful operator with the IDENTICAL column
  * expression the batch query uses (first 15 md5 hex chars as a long), so
  * the maintained sketch rows — not just the estimates — equal the batch
  * q280 sketch of everything ingested, and replaying a batch is a state
  * no-op (hash-set semantics make the update idempotent).
  *
  * State GC: keys here are SOURCES — a schema-bounded dimension (the
  * corpus ships 20), unlike per-user/per-metric state, so there is no
  * retired-key growth to collect and the state bound is |sources|·k longs
  * by construction. A deployment keying on an unbounded dimension would
  * add the event-time timeout the way [[CusumStream]] does; the documents
  * relation carries no event time, so none is manufactured here.
  *
  * Not oracle-checkable (DuckDB has no streams); `KmvStreamSpec` pins
  * stream==batch sketch equality, the estimate formula, merge exactness,
  * and replay idempotence.
  */
object KmvStream {

  final case class Hashed(source: String, h: Long)

  /** One source's snapshot after a micro-batch: the sketch size (< k means
    * the sketch still holds EVERY distinct hash, so the estimate is
    * exact), the k-th minimum, and the distinct estimate.
    */
  final case class KmvSnap(source: String, n_sketch: Int, hk: Long,
      est: Double)

  final case class KmvState(mins: Vector[Long])

  /** The q280 estimator: exact below k, (k−1)·2^60/h_k at capacity. */
  def estimate(k: Int, nSketch: Int, hk: Long): Double =
    if (nSketch < k) nSketch.toDouble
    else (k - 1).toDouble * math.pow(2.0, 60) / hk.toDouble

  /** Merge two sketches: the k smallest of the union — exact for the
    * combined stream because each side retains its k minima.
    */
  def merge(k: Int, a: Vector[Long], b: Vector[Long]): Vector[Long] =
    (a ++ b).distinct.sorted.take(k)

  private def update(k: Int)(
      source: String,
      rows: Iterator[Hashed],
      state: GroupState[KmvState]): Iterator[KmvSnap] = {
    var mins = state.getOption.map(_.mins).getOrElse(Vector.empty[Long])
    // set-semantics insert, capped at k: idempotent under replay
    rows.foreach { r =>
      if (!mins.contains(r.h) && (mins.length < k || r.h < mins.last)) {
        mins = (mins :+ r.h).sorted.take(k)
      }
    }
    state.update(KmvState(mins))
    Iterator(KmvSnap(source, mins.length, if (mins.isEmpty) 0L else mins.last,
      estimate(k, mins.length, if (mins.isEmpty) 0L else mins.last)))
  }

  /** Stateful sketch over a pre-hashed (source, h) stream. */
  def sketch(rows: Dataset[Hashed], k: Int = 64): Dataset[KmvSnap] = {
    import rows.sparkSession.implicits._
    rows
      .groupByKey(_.source)
      .flatMapGroupsWithState[KmvState, KmvSnap](
        OutputMode.Update(), GroupStateTimeout.NoTimeout())(update(k))
  }

  /** Wire a raw streaming document frame (`source`, `text`): tokenize and
    * hash with the EXACT batch-q280 column expressions, then sketch.
    */
  def attach(docs: DataFrame, k: Int = 64): Dataset[KmvSnap] = {
    import docs.sparkSession.implicits._
    val hashed = docs
      .select(col("source"),
        explode(split(trim(col("text")), "\\s+")).as("w"))
      .filter(length(col("w")) > 0)
      .select(col("source"),
        conv(substring(md5(col("w")), 1, 15), 16, 10).cast("long").as("h"))
      .as[Hashed]
    sketch(hashed, k)
  }
}
