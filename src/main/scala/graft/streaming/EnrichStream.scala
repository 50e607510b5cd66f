package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-STATIC enrichment join — the fifth canonical streaming shape in
  * this engine (windowed agg, sessionizer, dedup, stream-stream interval
  * join, and now dimension enrichment): every arriving event is joined to a
  * static dimension table (customers) to carry its market segment onward.
  *
  * Scale notes: the static side is bounded, so this needs NO state store,
  * no watermark, and no interval bound — Spark re-resolves and (under the
  * threshold) re-broadcasts the static relation per micro-batch, which is
  * exactly the semantics a slowly-refreshed dimension wants: replace the
  * underlying files and the next batch joins against the new snapshot. The
  * join is LEFT: an event from a user missing in the dimension keeps
  * flowing with a sentinel segment instead of silently disappearing — the
  * enrichment contract a fact pipeline needs (never drop facts because a
  * dim is late).
  *
  * Not oracle-checkable (no streams in DuckDB); `EnrichStreamSpec` proves
  * exact equality with the SAME join run as a batch query over the same
  * rows — the streaming/batch duality proof used across graft.streaming.
  */
object EnrichStream {

  /** @param events    streaming frame: `event_id`, `ts` (long, ns),
    *                  `user_id`, `event_type`, `value`
    * @param customers STATIC dimension: `c_custkey`, `c_mktsegment`
    */
  def enrich(events: DataFrame, customers: DataFrame): DataFrame =
    events
      .withColumn("event_time", timestamp_micros(expr("ts DIV 1000")))
      .join(
        broadcast(customers.select(col("c_custkey"), col("c_mktsegment"))),
        col("user_id") === col("c_custkey"), "left")
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("value"), col("event_time"),
        coalesce(col("c_mktsegment"), lit("(unknown)")).as("segment"))
}
