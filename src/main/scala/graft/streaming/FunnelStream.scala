package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful streaming funnel — the streaming twin of the batch
  * `q107_funnel`: per user, first view, first click strictly after it,
  * first purchase strictly after that; a completed funnel is emitted the
  * moment its purchase stage closes. Built on `flatMapGroupsWithState`
  * like the sessionizer: ONE stateful operator, no chained stateful
  * aggregations.
  *
  * State per user is three timestamps (O(1)), partitioned by user across
  * the cluster. An event-time timeout GCs users whose funnel never
  * completes once the watermark passes their horizon, so abandonment does
  * not accumulate state — the property that keeps a perpetual stream
  * viable. Within a micro-batch events are sorted by event time; across
  * batches the stage machine is monotone — a bound stage is never revised,
  * so a cross-batch late arrival that PRECEDES an already-bound stage does
  * not retract it (the no-retraction semantics every append-mode state
  * machine has). For event-time-ordered delivery across batches (and any
  * disorder within a batch) the emitted funnels equal the batch q107's —
  * `FunnelStreamSpec` pins exactly that contract.
  */
object FunnelStream {

  final case class Ev(user_id: Long, ts_us: Long, event_type: String,
      event_time: java.sql.Timestamp)

  /** A completed view→click→purchase funnel. */
  final case class Funnel(
      user_id: Long, t_view_us: Long, t_click_us: Long, t_purchase_us: Long)

  /** Stage state: -1 = stage not reached yet. `lastTs` is the max event
    * time ever seen for the user — the monotone base for the GC timeout
    * (deriving the timeout from the current batch alone would let a late
    * straggler SHRINK an existing deadline).
    */
  final case class FunnelState(
      tView: Long, tClick: Long, tPurchase: Long, lastTs: Long)

  /** Keep an incomplete funnel's state for this long past the user's
    * latest event.
    */
  val HorizonUs: Long = 24L * 3600 * 1000000

  private def update(
      userId: Long,
      events: Iterator[Ev],
      state: GroupState[FunnelState]): Iterator[Funnel] = {
    if (state.hasTimedOut) {
      state.remove() // abandoned funnel: no emission, state GC'd
      Iterator.empty
    } else {
      var s = state.getOption.getOrElse(FunnelState(-1L, -1L, -1L, 0L))
      val done0 = s.tPurchase >= 0
      val sorted = events.toSeq.sortBy(e => (e.ts_us, e.event_type))
      sorted.foreach { e =>
        e.event_type match {
          case "view" if s.tView < 0 =>
            s = s.copy(tView = e.ts_us)
          case "click" if s.tView >= 0 && s.tClick < 0 && e.ts_us > s.tView =>
            s = s.copy(tClick = e.ts_us)
          case "purchase"
              if s.tClick >= 0 && s.tPurchase < 0 && e.ts_us > s.tClick =>
            s = s.copy(tPurchase = e.ts_us)
          case _ => // stage already filled or precondition unmet
        }
      }
      s = s.copy(lastTs = math.max(s.lastTs,
        sorted.map(_.ts_us).maxOption.getOrElse(0L)))
      state.update(s)
      state.setTimeoutTimestamp((s.lastTs + HorizonUs) / 1000L)
      if (!done0 && s.tPurchase >= 0)
        Iterator(Funnel(userId, s.tView, s.tClick, s.tPurchase))
      else Iterator.empty
    }
  }

  def funnel(events: Dataset[Ev]): Dataset[Funnel] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelState, Funnel](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(update)
  }

  /** Wire a raw (ts-ns long) streaming frame: event-time, watermark,
    * funnel state machine.
    */
  def attach(raw: Dataset[_]): Dataset[Funnel] = {
    val spark: SparkSession = raw.sparkSession
    import spark.implicits._
    val evs = raw.toDF()
      .withColumn("event_time", timestamp_micros(expr("ts DIV 1000")))
      .withWatermark("event_time", "1 hour")
      .select(col("user_id"), expr("ts DIV 1000").as("ts_us"),
        col("event_type"), col("event_time"))
      .as[Ev]
    funnel(evs)
  }
}
