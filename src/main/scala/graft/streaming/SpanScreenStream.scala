package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming copied-span screen — the perpetual-ingest twin of the batch
  * exact-substring miners (q142/q171): each arriving document contributes
  * its minimizer-sampled 30-char spans (the SAME content-defined selection
  * as q171, via the codegen'd rolling-hash
  * [[graft.functions.MinimizerOffsetsExpression]] — selection depends only
  * on local content, so a region copied from an earlier document selects
  * the same spans no matter where it lands), keyed by 64-bit span hash. A
  * hit is emitted the moment a span hash recurs from a different document:
  * the "this paragraph is already in the corpus" signal at ingest time,
  * before the nightly batch pass would catch it.
  *
  * State is per span-hash and doubly bounded, both bounds honest:
  *   - capacity: at most `capacity` reference doc ids per span (lowest ids
  *     kept — deterministic; `saturated` on emissions marks a floor);
  *   - horizon: spans idle past the event-time watermark horizon are
  *     evicted by timer (lambda stance: q142/q171 batch passes are the
  *     backstop, exactly as q38/q97 back DedupStream/NearDupStream).
  *
  * Emissions are span-grain (doc, span hash, prior count, earliest ref); a
  * downstream `groupBy(doc_id).agg(count, max(n_prior))` turns them into
  * the per-document copied-content decision. Not oracle-checkable (DuckDB
  * has no streams) — `SpanScreenStreamSpec` pins cross-batch detection,
  * self-arrival silence, batch-parity of the span construction, and
  * horizon eviction.
  */
object SpanScreenStream {

  /** q142/q171's span grain and q171's minimizer window. */
  final val SpanLen = 30
  final val W = 8

  /** `event_time` duplicates `ts_us` as a timestamp so the watermark column
    * survives into the stateful operator (see NearDupStream.BandRow).
    */
  final case class SpanRow(h: Long, doc_id: Long, ts_us: Long,
      event_time: java.sql.Timestamp)

  /** One recurrence report: `n_prior` distinct prior documents carrying the
    * span (exact unless `saturated`), `first_doc` the lowest-id of them.
    */
  final case class Hit(doc_id: Long, h: Long, n_prior: Int,
      first_doc: Option[Long], saturated: Boolean)

  final case class SpanState(docIds: Seq[Long], maxSeenUs: Long)

  /** The batch-identical span derivation: minimizer offsets → 30-char span
    * → xxhash64. Public so the spec can assert stream/batch parity on the
    * exact construction q171 oracle-pins.
    */
  def spanFrame(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), expr("ts DIV 1000").as("ts_us"),
        col("text"),
        explode(graft.functions.MinimizerOffsetsExpression.offsets(
          col("text"), SpanLen, W)).as("p"))
      .select(xxhash64(col("text").substr(col("p"), lit(SpanLen))).as("h"),
        col("doc_id"), col("ts_us"))

  private def update(capacity: Int, horizonUs: Long)(
      key: Long,
      rows: Iterator[SpanRow],
      state: GroupState[SpanState]): Iterator[Hit] = {
    if (state.hasTimedOut) {
      state.remove()
      Iterator.empty
    } else {
      var refs = state.getOption.map(_.docIds).getOrElse(Seq.empty)
      var maxUs = state.getOption.map(_.maxSeenUs).getOrElse(Long.MinValue)
      // deterministic within-batch order: arrival time, then doc id
      val hits = rows.toSeq.sortBy(r => (r.ts_us, r.doc_id)).flatMap { r =>
        maxUs = math.max(maxUs, r.ts_us)
        if (refs.contains(r.doc_id)) None // same doc again: not a copy
        else {
          val h = Hit(r.doc_id, key, refs.size, refs.headOption,
            saturated = refs.size >= capacity)
          refs = (refs :+ r.doc_id).sorted.take(capacity)
          Some(h)
        }
      }
      state.update(SpanState(refs, maxUs))
      state.setTimeoutTimestamp(math.max(maxUs / 1000 + horizonUs / 1000,
        state.getCurrentWatermarkMs() + 1))
      hits.iterator
    }
  }

  /** Wire a raw streaming document frame (`doc_id` long, `ts` long ns,
    * `text` string) into the screen.
    */
  def attach(docs: DataFrame, horizon: String = "1 hour",
      capacity: Int = 16): Dataset[Hit] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val horizonUs = org.apache.spark.sql.catalyst.util.IntervalUtils
      .stringToInterval(
        org.apache.spark.unsafe.types.UTF8String.fromString(horizon))
    // same month guard as NearDupStream (round-5 ADVICE): months have no
    // fixed width, and silently dropping them would evict at the watermark
    require(horizonUs.months == 0,
      s"horizon must not contain month/year units (got '$horizon'): " +
        "state eviction needs a fixed-width duration")
    val hUs = horizonUs.days * 86400000000L + horizonUs.microseconds
    spanFrame(docs)
      .withColumn("event_time", timestamp_micros(col("ts_us")))
      .withWatermark("event_time", horizon)
      .as[SpanRow]
      .groupByKey(_.h)
      .flatMapGroupsWithState[SpanState, Hit](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(
        update(capacity, hUs))
  }
}
