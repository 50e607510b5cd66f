package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of the native as-of join ([[graft.plans.AsOfJoin]],
  * q158/q162/q182) — point-in-time feature enrichment at ingest: every
  * fact row is enriched with the latest-prior feature row for its key
  * (strictly earlier event time, optionally within a staleness tolerance),
  * exactly the lookup the batch operator's merge pass performs
  * retrospectively. At ingest time this is THE feature-store operator:
  * the serving-side join that q182's leakage audit proves the batch tier
  * must match.
  *
  * Contract (identical to the batch merge, which is what the parity spec
  * pins against q158/q162 on the real events table):
  *   - the enriching feature has the LARGEST feature time strictly BEFORE
  *     the fact time (same-microsecond features do not apply — facts sort
  *     before features at an equal timestamp);
  *   - among equal-time features the max value survives (the merge loop's
  *     (time asc, value asc) keep order, o182's `max(s.value)`);
  *   - with a tolerance, features older than `toleranceUs` before the
  *     fact are too stale and yield NULL (q162's path).
  *
  * State is O(1) per key — ONE (feature time, value) pair plus the key's
  * event-time high watermark — because rows are applied in event-time
  * order (sorted within each micro-batch; cross-batch order is the replay
  * contract shared by every stream in this tier). Cross-SOURCE delivery is
  * part of that contract: a fact processed in an earlier micro-batch than
  * an older feature (feature-pipeline lag) enriches as None — Append mode
  * cannot retract — so a parity replay must feed both inputs their chunk
  * atomically per batch (the spec drives both sides from one tagged-union
  * source for exactly this reason). Keys silent past
  * `retireUs` of event time are GC'd by event-time timeout: a fact row
  * also refreshes its key's liveness, so an actively-served entity never
  * loses its profile to the horizon — only fully-idle keys do (and a
  * retired key's next fact re-enriches only after a fresh feature, the
  * "months-silent metric should not resume mid-drift" stance of
  * [[CusumStream]]).
  */
object AsOfStream {

  /** Tagged union row: side 0 = fact (`event_id` meaningful), side 1 =
    * feature (`value` meaningful). */
  final case class In(key: Long, side: Int, event_id: Long, ts_us: Long,
      value: Double, event_time: java.sql.Timestamp)

  /** One enriched fact: `asof` = the feature value as of `ts_us`, None if
    * no live feature qualifies. */
  final case class Out(key: Long, event_id: Long, ts_us: Long,
      asof: Option[Double])

  /** Latest-prior feature for the key + the key's event-time high
    * watermark (facts included) driving timeout GC. */
  final case class FeatState(ts_us: Long, value: Double, last_us: Long)

  /** Event-time horizon after which a fully-silent key's state is evicted. */
  val RetireUs: Long = 21600000000L // 6 hours

  private def update(tolUs: Long, retireUs: Long)(
      key: Long, rows: Iterator[In],
      state: GroupState[FeatState]): Iterator[Out] = {
    if (state.hasTimedOut) {
      state.remove()
      Iterator.empty
    } else {
      // (ts, side, value) order: at an equal microsecond the fact precedes
      // the feature (strict-before contract); equal-time features apply in
      // value order so the max value is the one that survives
      val sorted = rows.toSeq
        .sortBy(r => (r.ts_us, r.side, r.value, r.event_id))
      var st = state.getOption.orNull
      var lastUs = if (st == null) 0L else st.last_us
      val out = Seq.newBuilder[Out]
      sorted.foreach { r =>
        lastUs = math.max(lastUs, r.ts_us)
        if (r.side == 0) {
          val live = st != null && st.ts_us < r.ts_us &&
            (tolUs <= 0L || r.ts_us - st.ts_us <= tolUs)
          out += Out(key, r.event_id, r.ts_us,
            if (live) Some(st.value) else None)
        } else {
          st =
            if (st == null) FeatState(r.ts_us, r.value, lastUs)
            else if (r.ts_us > st.ts_us ||
              (r.ts_us == st.ts_us && r.value > st.value))
              FeatState(r.ts_us, r.value, lastUs)
            else st
        }
      }
      if (st != null) {
        state.update(FeatState(st.ts_us, st.value, lastUs))
        state.setTimeoutTimestamp(lastUs / 1000L + retireUs / 1000L)
      }
      out.result().iterator
    }
  }

  /** Wire the enrichment over two streaming frames: `facts` with columns
    * `(key, event_id, ts_us)`, `features` with `(key, ts_us, value)` —
    * integer-µs event times, the engine's time convention. The 1-hour
    * watermark bounds late data; `toleranceUs` (None = unbounded lookback,
    * q158; Some(t) = staleness bound, q162) and `retireUs` mirror the
    * batch knobs and the tier's GC discipline.
    */
  def attach(facts: DataFrame, features: DataFrame,
      toleranceUs: Option[Long] = None,
      retireUs: Long = RetireUs): Dataset[Out] = {
    val s = facts.sparkSession
    import s.implicits._
    require(retireUs > 3600000000L,
      "retire horizon must exceed the 1h watermark delay")
    toleranceUs.foreach(t => require(t > 0L, "tolerance must be positive"))
    val f = facts.select(col("key"), lit(0).as("side"), col("event_id"),
      col("ts_us"), lit(0.0).as("value"))
    val ft = features.select(col("key"), lit(1).as("side"),
      lit(0L).as("event_id"), col("ts_us"), col("value"))
    f.unionByName(ft)
      .withColumn("event_time", timestamp_micros(col("ts_us")))
      .withWatermark("event_time", "1 hour")
      .as[In]
      .groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(
        update(toleranceUs.getOrElse(0L), retireUs))
  }
}
