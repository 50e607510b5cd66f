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
  */
object CusumStream {

  final case class Ev(event_type: String, event_id: Long, ts_us: Long,
      value: Double)

  final case class Point(event_type: String, rn: Long, event_id: Long,
      ts_us: Long, cusum: Double)

  final case class CuState(n: Long, s: Double)

  private def update(means: Map[String, Double])(
      key: String,
      events: Iterator[Ev],
      state: GroupState[CuState]): Iterator[Point] = {
    val mu = means.getOrElse(key, 0.0)
    val sorted = events.toSeq.sortBy(e => (e.ts_us, e.event_id))
    var st = state.getOption.getOrElse(CuState(0L, 0.0))
    val out = sorted.map { e =>
      st = CuState(st.n + 1, st.s + (e.value - mu))
      Point(key, st.n, e.event_id, e.ts_us, st.s)
    }
    state.update(st)
    out.iterator
  }

  /** Wire a raw streaming frame with `ts` (long, ns), `event_id`,
    * `event_type`, `value`. `means` is the per-key reference level fitted
    * by the batch tier (rounded there, so both tiers subtract identical
    * doubles).
    */
  def attach(events: DataFrame, means: Map[String, Double]): Dataset[Point] = {
    val s = events.sparkSession
    import s.implicits._
    events
      .select(col("event_type"), col("event_id"),
        expr("ts DIV 1000").as("ts_us"), col("value"))
      .as[Ev]
      .groupByKey(_.event_type)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(update(means))
  }
}
