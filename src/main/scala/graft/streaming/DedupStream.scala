package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming-ingest twin of the batch exact-dedup queries (q34/q35): drop
  * re-arrivals of the same content fingerprint as documents stream in,
  * keeping state only within the watermark horizon.
  *
  * `dropDuplicatesWithinWatermark` is the scale-safe variant: plain
  * streaming `dropDuplicates` keeps every key ever seen (unbounded state);
  * the within-watermark form evicts fingerprints older than the horizon, so
  * state is O(arrival rate x horizon) — the only viable shape for a
  * perpetual ingest of a 100 TB corpus. Late re-arrivals beyond the horizon
  * would pass (by design); the periodic batch dedup (q35) is the backstop,
  * which is the standard lambda-architecture split for training-data
  * ingestion.
  *
  * Not oracle-checkable (DuckDB has no streams) — exercised by
  * `DedupStreamSpec` through a MemoryStream, and its batch-equivalence is
  * asserted there the same way `SessionizeStreamSpec` pins the sessionizer.
  */
object DedupStream {

  /** @param docs streaming frame with `ts` (long, ns since epoch), `doc_id`
    *             (long), `text` (string).
    * @return one row per first-seen content fingerprint within the
    *         watermark horizon: event_time, doc_id, fp.
    */
  def dedupByFingerprint(docs: DataFrame, horizon: String = "1 hour"): DataFrame =
    docs
      .withColumn("event_time", timestamp_micros(expr("ts DIV 1000")))
      .withColumn("fp", md5(regexp_replace(lower(col("text")), "\\s+", " ")))
      .withWatermark("event_time", horizon)
      .dropDuplicatesWithinWatermark("fp")
      .select(col("event_time"), col("doc_id"), col("fp"))
}
