package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of the native interval join ([[graft.plans.IntervalJoin]],
  * q07/q190) — "pair every left row with the right rows that follow it
  * within W" computed at ingest: the session-stitching / burst-pairing
  * primitive (view→view co-visit windows, request→retry pairing, the
  * q190 shape) running continuously instead of as a batch sweep. The
  * batch operator is the oracle-checked truth (q190 hash-matches the
  * DuckDB interval self-join); the stream is held to it row-for-row by
  * the parity spec, the q158/q162↔[[AsOfStream]] relationship now for
  * the interval-join shape.
  *
  * Contract (identical to the batch sweep):
  *   - a pair (a, b) is emitted iff key(a) = key(b) and
  *     `ts_a < ts_b <= ts_a + windowUs` — STRICTLY later rights only, so
  *     equal-microsecond rows never self-pair;
  *   - each pair is emitted exactly once, when its RIGHT row is applied
  *     (the left is already buffered — rights look back, never forward).
  *
  * State is O(per-key density of the W window) — exactly the batch
  * exec's sliding-buffer bound, the reason the batch operator scales —
  * because rows are applied in event-time order (sorted within each
  * micro-batch; cross-batch order is the replay contract shared by every
  * stream in this tier, enforced by feeding coordinated chunks): each
  * arriving row first prunes buffered lefts older than `ts - windowUs`,
  * which no future right can reach. Cross-SOURCE delivery is part of the
  * replay contract exactly as for [[AsOfStream]]: Append mode cannot
  * retract, so a parity replay feeds both sides their chunk atomically
  * per batch from one tagged-union source. Keys silent past `retireUs`
  * of event time are GC'd by event-time timeout (the tier's eviction
  * discipline); a retired key's buffer is gone, which is correct — every
  * left it held was already beyond any live right's reach.
  */
object IntervalStream {

  /** Tagged union row: side 0 = left (buffered, pairs forward), side 1 =
    * right (emits pairs looking back). */
  final case class In(key: Long, side: Int, row_id: Long, ts_us: Long,
      event_time: java.sql.Timestamp)

  /** One emitted pair. */
  final case class Out(key: Long, left_id: Long, ts_a: Long,
      right_id: Long, ts_b: Long)

  /** Buffered lefts (ascending ts) + the key's event-time high watermark
    * driving timeout GC. */
  final case class BufState(lefts: List[(Long, Long)], last_us: Long)

  /** Event-time horizon after which a fully-silent key's state is evicted. */
  val RetireUs: Long = 21600000000L // 6 hours

  private def update(windowUs: Long, retireUs: Long)(
      key: Long, rows: Iterator[In],
      state: GroupState[BufState]): Iterator[Out] = {
    if (state.hasTimedOut) {
      state.remove()
      Iterator.empty
    } else {
      val sorted = rows.toSeq.sortBy(r => (r.ts_us, r.side, r.row_id))
      var lefts: List[(Long, Long)] =
        state.getOption.map(_.lefts).getOrElse(Nil)
      var lastUs = state.getOption.map(_.last_us).getOrElse(0L)
      val out = Seq.newBuilder[Out]
      sorted.foreach { r =>
        lastUs = math.max(lastUs, r.ts_us)
        // density bound: lefts below ts - W can never pair again
        lefts = lefts.dropWhile(_._1 < r.ts_us - windowUs)
        if (r.side == 1) {
          // buffered lefts are >= ts - W after the prune; strict < keeps
          // equal-time rows from pairing
          lefts.iterator.takeWhile(_._1 < r.ts_us).foreach { case (ta, id) =>
            out += Out(key, id, ta, r.row_id, r.ts_us)
          }
        } else {
          lefts = lefts :+ (r.ts_us -> r.row_id)
        }
      }
      state.update(BufState(lefts, lastUs))
      state.setTimeoutTimestamp(lastUs / 1000L + retireUs / 1000L)
      out.result().iterator
    }
  }

  /** Wire the pairing over two streaming frames: `left` with columns
    * `(key, row_id, ts_us)`, `right` with `(key, row_id, ts_us)` —
    * integer-µs event times, the engine's time convention. The 1-hour
    * watermark bounds late data; `windowUs` mirrors the batch operator's
    * window and `retireUs` the tier's GC discipline.
    */
  def attach(left: DataFrame, right: DataFrame, windowUs: Long,
      retireUs: Long = RetireUs): Dataset[Out] = {
    val s = left.sparkSession
    import s.implicits._
    require(windowUs > 0L, "window must be positive")
    require(retireUs > 3600000000L,
      "retire horizon must exceed the 1h watermark delay")
    val l = left.select(col("key"), lit(0).as("side"), col("row_id"),
      col("ts_us"))
    val r = right.select(col("key"), lit(1).as("side"), col("row_id"),
      col("ts_us"))
    l.unionByName(r)
      .withColumn("event_time", timestamp_micros(col("ts_us")))
      .withWatermark("event_time", "1 hour")
      .as[In]
      .groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(
        update(windowUs, retireUs))
  }
}
