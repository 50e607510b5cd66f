package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming CUSUM changepoint monitor — the online twin of the batch
  * `q256_cusum_changepoint`: per metric key, maintain the running
  * cumulative sum of deviations from a FIXED reference mean (in a real
  * deployment the mean comes from the batch tier's training window —
  * q256's level, or q258's seasonal level — exactly the lambda split the
  * dedup tier already documents), and emit each event's cumulative
  * statistic as it arrives. An alerting sink thresholds |S| (Page's test);
  * the batch q256 locates the changepoint retrospectively, this stream
  * raises it as it develops.
  *
  * Scale shape: state is O(1) per key (a count and one double) under
  * `flatMapGroupsWithState` — no window re-sort, no history; a 100 TB/day
  * stream carries exactly |keys| state entries partitioned across the
  * cluster. Within a micro-batch each key's events are sorted by
  * (ts_us, event_id), so an in-order replay reproduces the batch window's
  * addend order EXACTLY — `CusumStreamSpec` asserts the emitted series is
  * bit-identical (double equality, no tolerance) to the batch
  * prefix-sum frame.
  *
  * State eviction (r11): a RETIRED metric key (no events for [[RetireUs]]
  * of event time) has its state dropped via event-time timeout — the same
  * GC discipline the other stateful streams carry; without it |keys|
  * grows monotonically over a deployment's lifetime. Eviction emits
  * nothing (a monitor has no close record); a key that RESUMES after
  * retirement restarts its series from n=1, which is also the statistic
  * you want — a months-silent metric should not resume mid-drift.
  */
object CusumStream {

  final case class Ev(event_type: String, event_id: Long, ts_us: Long,
      value: Double, event_time: java.sql.Timestamp)

  final case class Point(event_type: String, rn: Long, event_id: Long,
      ts_us: Long, cusum: Double)

  final case class CuState(n: Long, s: Double, last_us: Long)

  /** Event-time horizon after which a silent key's state is evicted. */
  val RetireUs: Long = 21600000000L // 6 hours

  private def update(means: Map[String, Double], retireUs: Long)(
      key: String,
      events: Iterator[Ev],
      state: GroupState[CuState]): Iterator[Point] = {
    if (state.hasTimedOut) {
      state.remove()
      Iterator.empty
    } else {
      val mu = means.getOrElse(key, 0.0)
      val sorted = events.toSeq.sortBy(e => (e.ts_us, e.event_id))
      var st = state.getOption.getOrElse(CuState(0L, 0.0, 0L))
      val out = sorted.map { e =>
        st = CuState(st.n + 1, st.s + (e.value - mu),
          math.max(st.last_us, e.ts_us))
        Point(key, st.n, e.event_id, e.ts_us, st.s)
      }
      state.update(st)
      state.setTimeoutTimestamp(st.last_us / 1000L + retireUs / 1000L)
      out.iterator
    }
  }

  /** Wire a raw streaming frame with `ts` (long, ns), `event_id`,
    * `event_type`, `value`. `means` is the per-key reference level fitted
    * by the batch tier (rounded there, so both tiers subtract identical
    * doubles). The 1-hour watermark bounds late data; the event-time
    * timeout GCs keys silent past `retireUs` of event time (choose the
    * horizon per deployment cadence — longer than the slowest live
    * metric's natural gap, or its series restarts on resume).
    */
  def attach(events: DataFrame, means: Map[String, Double],
      retireUs: Long = RetireUs): Dataset[Point] = {
    val s = events.sparkSession
    import s.implicits._
    // a horizon tighter than the 1h watermark delay would evict a key
    // whose NEXT event still clears the late filter — the series would
    // restart mid-stream and silently break batch parity
    require(retireUs > 3600000000L,
      "retire horizon must exceed the 1h watermark delay")
    events
      .withColumn("event_time", timestamp_micros(expr("ts DIV 1000")))
      .withWatermark("event_time", "1 hour")
      .select(col("event_type"), col("event_id"),
        expr("ts DIV 1000").as("ts_us"), col("value"), col("event_time"))
      .as[Ev]
      .groupByKey(_.event_type)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(update(means, retireUs))
  }
}
