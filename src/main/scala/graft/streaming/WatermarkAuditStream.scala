package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming watermark-lateness audit — the online twin of the batch
  * `q238_watermark_audit`: per arrival key (user), maintain the running
  * event-time high-watermark (ONE long of state) and emit each event's
  * lateness behind it as it arrives. The batch tier sizes `withWatermark`
  * retrospectively; this stream is the live meter an ingest owner
  * dashboards (per-type lateness percentiles off the emitted points) and
  * alerts on BEFORE a mis-sized watermark silently drops data — the
  * operational loop-closure of q238's measurement.
  *
  * Within a micro-batch each key's events process in event_id order (the
  * same arrival proxy the batch audit replays), so an in-order replay
  * emits EXACTLY the batch window's `greatest(0, runmax − us)` per event
  * — `WatermarkAuditStreamSpec` asserts per-event equality and that the
  * aggregated p50/p95/p99 + drop-fraction readout reproduces q238's
  * output.
  *
  * Scale shape: O(1) state per key (one max + the timeout bookkeeping),
  * keys partitioned across the cluster. Retired keys (silent past
  * [[RetireUs]] of event time) are GC'd by event-time timeout; a
  * resumed key restarts its high-watermark, which cannot disturb the
  * lateness meter — with any retire horizon wider than the stream's
  * watermark delay, a post-eviction event necessarily carries an event
  * time above the evicted max (events older than the global watermark
  * were already dropped upstream), so its lateness is 0 under either
  * state. Eviction is therefore asserted through the state-store row
  * count, not through emitted values.
  */
object WatermarkAuditStream {

  final case class Ev(user_id: Long, event_type: String, event_id: Long,
      ts_us: Long, event_time: java.sql.Timestamp)

  final case class Late(user_id: Long, event_type: String, event_id: Long,
      ts_us: Long, late_us: Long)

  final case class WmState(max_us: Long)

  /** Event-time horizon after which a silent key's state is evicted. */
  val RetireUs: Long = 86400000000L // 24 hours

  private def update(retireUs: Long)(
      key: Long,
      events: Iterator[Ev],
      state: GroupState[WmState]): Iterator[Late] = {
    if (state.hasTimedOut) {
      state.remove()
      Iterator.empty
    } else {
      val sorted = events.toSeq.sortBy(_.event_id) // arrival order proxy
      var mx = state.getOption.map(_.max_us).getOrElse(Long.MinValue)
      val out = sorted.map { e =>
        mx = math.max(mx, e.ts_us)
        Late(key, e.event_type, e.event_id, e.ts_us, mx - e.ts_us)
      }
      state.update(WmState(mx))
      // never below the current watermark: events reaching the operator
      // satisfy ts >= wm - delay, and retireUs > delay by contract
      state.setTimeoutTimestamp(mx / 1000L + retireUs / 1000L)
      out.iterator
    }
  }

  /** Wire a raw streaming frame with `ts` (long, ns), `event_id`,
    * `event_type`, `user_id`. `delayUs` is the stream's own allowed-late
    * window: events later than it are dropped UPSTREAM of this meter and
    * never measured, so size it to the worst lateness you still want to
    * SEE (q238's batch percentiles are the sizing input) — a meter whose
    * delay is tighter than the tail it monitors censors exactly the
    * events it exists to catch. `retireUs` must exceed `delayUs` (see
    * class doc).
    */
  def attach(events: DataFrame, retireUs: Long = RetireUs,
      delayUs: Long = 3600000000L): Dataset[Late] = {
    val s = events.sparkSession
    import s.implicits._
    require(retireUs > delayUs,
      "retire horizon must exceed the watermark delay")
    events
      .withColumn("event_time", timestamp_micros(expr("ts DIV 1000")))
      .withWatermark("event_time", s"${delayUs / 1000000L} seconds")
      .select(col("user_id"), col("event_type"), col("event_id"),
        expr("ts DIV 1000").as("ts_us"), col("event_time"))
      .as[Ev]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(update(retireUs))
  }
}
