package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-STREAM interval join — the attribution shape q107 computes in
  * batch, expressed over two live streams: every view joined to the same
  * user's clicks that land within the following 10 minutes. The fourth
  * canonical stateful-streaming shape in this engine, next to the windowed
  * aggregate (EventsStream), the gap sessionizer (SessionizeStream) and the
  * bounded dedup (DedupStream).
  *
  * Scale notes: both sides are watermarked and the join condition carries a
  * two-sided event-time interval, so Spark derives a state-retention bound
  * PER SIDE (a view can only match clicks up to 10 minutes later; a click
  * only views up to 10 minutes earlier + watermark delay) and evicts state
  * beyond it — without the interval the join state would grow forever.
  * State is shuffled by user_id like the batch join's exchange.
  *
  * Not oracle-checkable (no streams in DuckDB); `JoinStreamSpec` feeds both
  * sides through MemoryStreams and asserts exact equality with the SAME
  * join run as a batch query over the same rows — the streaming/batch
  * duality proof used across graft.streaming.
  */
object JoinStream {

  /** @param views  streaming frame: `ts` (long, ns), `user_id`, `event_id`
    * @param clicks streaming frame: same shape
    * @return one row per (view, click-within-10-min) pair:
    *         user_id, view_id, click_id, view_time, click_time
    */
  def viewClickAttribution(views: DataFrame, clicks: DataFrame): DataFrame =
    attribution(views, clicks, "inner")

  /** Left-outer form of the same attribution: every view is emitted, with a
    * NULL click when no click landed in its 10-minute window. In streaming,
    * the unmatched-view row cannot be emitted eagerly — a matching click may
    * still arrive — so Spark holds the view in state and emits the NULL row
    * only once the watermark passes the end of its match window (view_time
    * + 10 min + the 30-min watermark delay), i.e. once no in-order click
    * could possibly still match. Same state bound and user_id exchange as
    * the inner form; the outer semantics add no retained state, only a
    * deferred emission at eviction time.
    */
  def viewClickAttributionLeftOuter(views: DataFrame,
                                    clicks: DataFrame): DataFrame =
    attribution(views, clicks, "leftOuter")

  /** Full-outer form — completes the operator's join-mode matrix: every
    * view AND every click is emitted, the unmatched side NULL. Both
    * directions of null emission are watermark-deferred (a lone click may
    * still match a late view and vice versa), with the same per-side state
    * bounds as the inner join.
    */
  def viewClickAttributionFullOuter(views: DataFrame,
                                    clicks: DataFrame): DataFrame =
    attribution(views, clicks, "fullOuter")

  private def attribution(views: DataFrame, clicks: DataFrame,
                          joinType: String): DataFrame = {
    val v = views
      .withColumn("view_time", timestamp_micros(expr("ts DIV 1000")))
      .withWatermark("view_time", "30 minutes")
      .select(col("user_id"), col("event_id").as("view_id"), col("view_time"))
    val c = clicks
      .withColumn("click_time", timestamp_micros(expr("ts DIV 1000")))
      .withWatermark("click_time", "30 minutes")
      .select(col("user_id").as("c_user"), col("event_id").as("click_id"),
        col("click_time"))
    v.join(c,
      col("user_id") === col("c_user") &&
      col("click_time") >= col("view_time") &&
      col("click_time") <= col("view_time") + expr("INTERVAL 10 MINUTES"),
      joinType)
      // coalesce surfaces the click-side key on click-only rows (full
      // outer); for inner/left rows the two sides agree by the equi-key
      .select(coalesce(col("user_id"), col("c_user")).as("user_id"),
        col("view_id"), col("click_id"),
        col("view_time"), col("click_time"))
  }
}
