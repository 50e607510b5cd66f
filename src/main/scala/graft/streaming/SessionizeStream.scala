package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful streaming sessionization — the streaming twin of the batch
  * `q50_sessionize` (30-minute inactivity gap), built on
  * `flatMapGroupsWithState` with event-time timeout: the canonical "custom
  * state machine per key" Structured Streaming shape.
  *
  * State per user is one open session (O(1)); sessions are emitted when the
  * watermark passes their close (gap expiry), so state neither grows with
  * history nor waits for the stream to end. At 100 TB/day event volume this
  * is the only shape that works: state is partitioned by user across the
  * cluster, and each micro-batch touches only keys with new events or
  * expiring timers.
  */
object SessionizeStream {

  /** Input event: microsecond epoch + user. `event_time` is the watermarked
    * column — it must survive projection into the stateful operator for
    * event-time timeout to resolve.
    */
  final case class Ev(user_id: Long, ts_us: Long, value: Double,
      event_time: java.sql.Timestamp)

  /** Emitted closed session. */
  final case class Session(
      user_id: Long, start_us: Long, end_us: Long, n_events: Long,
      sum_value: Double)

  /** Open-session state carried between micro-batches. */
  final case class SessState(
      start_us: Long, end_us: Long, n_events: Long, sum_value: Double)

  val GapUs: Long = 1800000000L // 30 minutes

  private def update(
      userId: Long,
      events: Iterator[Ev],
      state: GroupState[SessState]): Iterator[Session] = {
    if (state.hasTimedOut) {
      val s = state.get
      state.remove()
      Iterator(Session(userId, s.start_us, s.end_us, s.n_events, s.sum_value))
    } else {
      val sorted = events.toSeq.sortBy(e => (e.ts_us, e.value))
      var open = state.getOption
      val closed = Seq.newBuilder[Session]
      sorted.foreach { e =>
        open match {
          case Some(s) if e.ts_us - s.end_us <= GapUs =>
            open = Some(SessState(s.start_us, math.max(s.end_us, e.ts_us),
              s.n_events + 1, s.sum_value + e.value))
          case Some(s) =>
            closed += Session(userId, s.start_us, s.end_us, s.n_events,
              s.sum_value)
            open = Some(SessState(e.ts_us, e.ts_us, 1L, e.value))
          case None =>
            open = Some(SessState(e.ts_us, e.ts_us, 1L, e.value))
        }
      }
      open.foreach { s =>
        state.update(s)
        // close the session when event time passes end + gap
        state.setTimeoutTimestamp(s.end_us / 1000L + GapUs / 1000L)
      }
      closed.result().iterator
    }
  }

  /** @param events streaming Dataset of [[Ev]] (already watermarked upstream
    *               via `event_time`; see [[attach]] for the full pipeline)
    */
  def sessionize(events: Dataset[Ev]): Dataset[Session] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessState, Session](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(update)
  }

  /** Wire a raw (ts-ns long) streaming frame into the sessionizer: convert
    * to event-time, watermark, sessionize.
    */
  def attach(raw: Dataset[_]): Dataset[Session] = {
    val spark: SparkSession = raw.sparkSession
    import spark.implicits._
    val evs = raw.toDF()
      .withColumn("event_time", timestamp_micros(expr("ts DIV 1000")))
      .withWatermark("event_time", "1 hour")
      .select(col("user_id"), expr("ts DIV 1000").as("ts_us"), col("value"),
        col("event_time"))
      .as[Ev]
    sessionize(evs)
  }
}
