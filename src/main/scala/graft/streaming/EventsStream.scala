package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Structured Streaming twin of the batch tumbling-window query
  * (`q23_tumbling_window`): the same 1-hour event aggregation expressed over
  * an unbounded stream with event-time watermarking.
  *
  * Not oracle-checkable (the reference has no streaming surface and DuckDB
  * no streams — SURVEY §2.C last row), so it is exercised by
  * `EventsStreamSpec` through a MemoryStream instead of `SparkEntry.queries`.
  *
  * Scale notes: stateful aggregation keyed by (window) only — state size is
  * O(active windows), bounded by the 2-hour watermark horizon; partial
  * aggregation happens map-side before the state-store shuffle, exactly like
  * the batch plan.
  */
object EventsStream {

  /** @param events streaming frame with `ts` (long, ns since epoch),
    *               `user_id` (long), `value` (double) — the shape
    *               `events.parquet` reads as (see Tables doc).
    * @return windowed aggregate: window_start, n_events, sum_value
    */
  def hourlyAggregate(events: DataFrame): DataFrame =
    events
      .withColumn("event_time", timestamp_micros(expr("ts DIV 1000")))
      .withWatermark("event_time", "2 hours")
      .groupBy(window(col("event_time"), "1 hour").getField("start")
        .as("window_start"))
      .agg(
        count(lit(1)).as("n_events"),
        round(sum(col("value")), 4).as("sum_value"))

  /** Stream-static enrichment: each streaming event joins the (batch) user
    * dimension — the standard lookup-join shape. The static side is a plain
    * DataFrame Spark re-reads per micro-batch (so dimension updates are
    * picked up), and with a small dimension the join planner broadcasts it:
    * no stream-side state, no shuffle of the stream.
    *
    * @param events streaming frame with `ts` (long ns), `user_id`, `value`
    * @param users  static dimension with `user_id`, `segment`
    * @return per-segment windowed aggregates over the enriched stream
    */
  def enrichedBySegment(events: DataFrame, users: DataFrame): DataFrame =
    events
      .withColumn("event_time", timestamp_micros(expr("ts DIV 1000")))
      .withWatermark("event_time", "2 hours")
      .join(users, Seq("user_id"))
      .groupBy(
        window(col("event_time"), "1 hour").getField("start")
          .as("window_start"),
        col("segment"))
      .agg(
        count(lit(1)).as("n_events"),
        round(sum(col("value")), 4).as("sum_value"))
}
