package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming NEAR-dup screen — the perpetual-ingest twin of the batch
  * incremental dedup (q104): as documents stream in, each is checked against
  * the banded-MinHash bucket index of everything already seen, and its band
  * collisions are emitted immediately. Exact re-arrivals are DedupStream's
  * job; this catches the near-misses exact fingerprints cannot.
  *
  * Shape mirrors the batch design exactly: signature → 2 band keys per doc
  * (the SAME md5 construction as `graft.queries.Dedup`, via the codegen'd
  * [[graft.functions.MinHashSignatureExpression]]), then a stateful operator
  * KEYED BY (band_pos, band key) — so bucket state distributes across the
  * cluster like any keyed state, and a doc's two bands are screened in
  * parallel. Per-bucket state is doubly bounded, both bounds honest:
  *   - capacity: at most `capacity` reference doc ids per bucket (the
  *     lowest ids are kept — deterministic; `saturated` on emissions says
  *     when the prior-count is a floor rather than exact);
  *   - horizon: buckets idle past the event-time watermark horizon are
  *     evicted by timer (same lambda-architecture stance as DedupStream:
  *     the periodic batch pass q38/q97 is the backstop).
  *
  * Emissions are band-grain (doc, band, n_prior, earliest colliding ref);
  * a downstream `groupBy(doc_id).agg(max(n_prior))` makes the per-doc
  * dup-candidate decision, and confirmed candidates would be
  * Jaccard-verified exactly as q38 does in batch. Not oracle-checkable
  * (DuckDB has no streams) — `NearDupStreamSpec` pins collision detection,
  * determinism, both state bounds, and parity with the batch band
  * construction.
  */
object NearDupStream {

  /** `event_time` duplicates `ts_us` as a timestamp: the watermark is
    * attached to that COLUMN, and it must survive into the stateful operator
    * — a typed `map` to a timestamp-less row would strip it and fail
    * analysis ("event-time timeout not supported without watermark").
    */
  final case class BandRow(band_pos: Int, bkey: String, doc_id: Long,
      ts_us: Long, event_time: java.sql.Timestamp)

  /** One band collision report: `n_prior` references already in the bucket
    * (exact unless `saturated`), `min_ref` the earliest of them.
    */
  final case class Hit(doc_id: Long, band_pos: Int, n_prior: Int,
      min_ref: Option[Long], saturated: Boolean)

  final case class BucketState(docIds: Seq[Long], maxSeenUs: Long)

  /** The batch-identical band derivation: MinHash signature (8 windows from
    * 2 md5s per shingle) → 2 band keys (md5 over 4 signature components
    * each). Public so the spec can assert stream/batch parity on the SAME
    * construction q36–q38 oracle-pin.
    */
  def bandFrame(docs: DataFrame): DataFrame = {
    val sigCol =
      graft.functions.MinHashSignatureExpression.minhashSignature(col("text"))
    docs
      .withColumn("sig", sigCol)
      .filter(element_at(col("sig"), 1).isNotNull)
      .select(col("doc_id"), expr("ts DIV 1000").as("ts_us"),
        posexplode(array(
          md5(concat_ws("|", (0 until 4).map(j => element_at(col("sig"), j + 1)): _*)),
          md5(concat_ws("|", (4 until 8).map(j => element_at(col("sig"), j + 1)): _*))))
          .as(Seq("band_pos", "bkey")))
      .select(col("band_pos").cast("int").as("band_pos"), col("bkey"),
        col("doc_id"), col("ts_us"))
  }

  private def update(capacity: Int, horizonUs: Long)(
      key: (Int, String),
      rows: Iterator[BandRow],
      state: GroupState[BucketState]): Iterator[Hit] = {
    if (state.hasTimedOut) {
      state.remove()
      Iterator.empty
    } else {
      var refs = state.getOption.map(_.docIds).getOrElse(Seq.empty)
      var maxUs = state.getOption.map(_.maxSeenUs).getOrElse(Long.MinValue)
      // deterministic within-batch order: arrival time, then doc id
      val hits = rows.toSeq.sortBy(r => (r.ts_us, r.doc_id)).flatMap { r =>
        maxUs = math.max(maxUs, r.ts_us)
        if (refs.contains(r.doc_id)) None // exact re-arrival: not a near-dup
        else {
          val h = Hit(r.doc_id, r.band_pos, refs.size, refs.headOption,
            saturated = refs.size >= capacity)
          // keep the lowest `capacity` ids, ascending — deterministic and
          // stable under any arrival interleaving once saturated
          refs = (refs :+ r.doc_id).sorted.take(capacity)
          Some(h)
        }
      }
      state.update(BucketState(refs, maxUs))
      // ms-grain; clamped above the current watermark — a bucket whose
      // horizon already passed within this same trigger must still set a
      // legal timer (it fires on the next trigger)
      state.setTimeoutTimestamp(math.max(maxUs / 1000 + horizonUs / 1000,
        state.getCurrentWatermarkMs() + 1))
      hits.iterator
    }
  }

  /** Wire a raw streaming document frame (`doc_id` long, `ts` long ns,
    * `text` string) into the screen.
    */
  def attach(docs: DataFrame, horizon: String = "1 hour", capacity: Int = 64): Dataset[Hit] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val hUs = horizonMicros(horizon)
    bandFrame(docs)
      .withColumn("event_time", timestamp_micros(col("ts_us")))
      .withWatermark("event_time", horizon)
      .as[BandRow]
      .groupByKey(r => (r.band_pos, r.bkey))
      .flatMapGroupsWithState[BucketState, Hit](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(
        update(capacity, hUs))
  }

  private def horizonMicros(horizon: String): Long = {
    val horizonUs = org.apache.spark.sql.catalyst.util.IntervalUtils
      .stringToInterval(org.apache.spark.unsafe.types.UTF8String.fromString(horizon))
    // months have no fixed microsecond width, so a "1 month" horizon cannot
    // be converted to the eviction duration — and silently treating it as 0
    // would evict buckets the moment the watermark passes while the
    // withWatermark below honors the full month (round-5 ADVICE). Reject it
    // loudly; day-or-finer intervals convert exactly.
    require(horizonUs.months == 0,
      s"horizon must not contain month/year units (got '$horizon'): " +
        "state eviction needs a fixed-width duration")
    horizonUs.days * 86400000000L + horizonUs.microseconds
  }

  // ---------------------------------------------------------------------
  // Multi-probe SimHash tier
  // ---------------------------------------------------------------------

  /** One row of the SimHash screen's keyed traffic: `probe = false` is the
    * doc's own fingerprint (screens AND inserts), `probe = true` a
    * hamming-1 flip of it (screens only — never touches state).
    */
  final case class SimRow(bkey: Int, probe: Boolean, doc_id: Long,
      ts_us: Long, event_time: java.sql.Timestamp)

  /** `probe_dist` 0 = exact-fingerprint collision, 1 = caught only by a
    * bit-flip probe (the stored doc's fingerprint differs in one bit).
    */
  final case class SimHit(doc_id: Long, probe_dist: Int, n_prior: Int,
      min_ref: Option[Long], saturated: Boolean)

  /** The MULTI-PROBE tier of the screen (round-6 verdict #7): q129 probes
    * every bucket within hamming distance 1 of the query's signature;
    * the same trade ported to streaming lookup. It cannot live on the
    * MinHash bands above — their keys are md5 digests, which have no
    * enumerable bit-neighborhood (and a signature differing in ONE MinHash
    * component is already caught exactly by the other band, pigeonhole).
    * So the probeable tier keys state by the 16-bit SimHash fingerprint
    * itself (q39/q102's construction, same codegen'd expression) and each
    * arriving doc looks up 17 buckets: its own fingerprint plus all 16
    * one-bit flips — ×(bits+1) probe WORK, ×1 state, exactly q129's trade.
    *
    * Probes are lookup-only by construction: a probe row never inserts,
    * never re-arms a bucket's eviction timer, and never creates state for
    * an empty bucket — so state size, per-bucket capacity, and the
    * watermark-horizon eviction bound are IDENTICAL to a probe-less run
    * (spec-pinned). A doc still inserts under its own fingerprint only.
    */
  def simhashProbeFrame(docs: DataFrame): DataFrame = {
    val variants: Column = array((0 to 16).map { j =>
      if (j == 0) struct(col("fp").as("bkey"), lit(false).as("probe"))
      else struct(col("fp").bitwiseXOR(lit(1 << (j - 1))).as("bkey"),
        lit(true).as("probe"))
    }: _*)
    docs
      .withColumn("fp", graft.functions.SimHashExpression.simhash(col("text")))
      .filter(col("fp").isNotNull)
      .select(col("doc_id"), expr("ts DIV 1000").as("ts_us"),
        explode(variants).as("p"))
      .select(col("p.bkey").as("bkey"), col("p.probe").as("probe"),
        col("doc_id"), col("ts_us"))
  }

  private def updateSim(capacity: Int, horizonUs: Long)(
      key: Int,
      rows: Iterator[SimRow],
      state: GroupState[BucketState]): Iterator[SimHit] = {
    if (state.hasTimedOut) {
      state.remove()
      Iterator.empty
    } else {
      var refs = state.getOption.map(_.docIds).getOrElse(Seq.empty)
      var maxUs = state.getOption.map(_.maxSeenUs).getOrElse(Long.MinValue)
      var inserted = false
      // probes sort after the same-instant insert: a doc that both inserts
      // into and probes the same bucket in one batch (fp == flip collision
      // cannot happen — a flip differs in exactly one bit — but two docs'
      // rows interleave) sees a deterministic order regardless
      val hits = rows.toSeq.sortBy(r => (r.ts_us, r.doc_id, r.probe))
        .flatMap { r =>
          if (r.probe) {
            // lookup-only: emit a hit if the bucket has references, touch
            // nothing — notably not the timer, so probing a bucket cannot
            // extend its lifetime past its own ingest horizon
            if (refs.nonEmpty)
              Some(SimHit(r.doc_id, 1, refs.size, refs.headOption,
                saturated = refs.size >= capacity))
            else None
          } else {
            maxUs = math.max(maxUs, r.ts_us)
            inserted = true
            if (refs.contains(r.doc_id)) None // exact re-arrival
            else {
              val h = SimHit(r.doc_id, 0, refs.size, refs.headOption,
                saturated = refs.size >= capacity)
              refs = (refs :+ r.doc_id).sorted.take(capacity)
              Some(h)
            }
          }
        }
      // state is written ONLY on insert; a probe-only visit to a missing
      // bucket leaves no state behind (16 probes/doc would otherwise mint
      // 16 empty buckets each) and to an existing bucket leaves its timer
      // untouched
      if (inserted) {
        state.update(BucketState(refs, maxUs))
        state.setTimeoutTimestamp(math.max(maxUs / 1000 + horizonUs / 1000,
          state.getCurrentWatermarkMs() + 1))
      }
      hits.iterator
    }
  }

  /** Wire a raw streaming document frame into the multi-probe SimHash
    * screen. Same contract as [[attach]]; hits carry `probe_dist`.
    */
  def attachSimHash(docs: DataFrame, horizon: String = "1 hour",
      capacity: Int = 64): Dataset[SimHit] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val hUs = horizonMicros(horizon)
    simhashProbeFrame(docs)
      .withColumn("event_time", timestamp_micros(col("ts_us")))
      .withWatermark("event_time", horizon)
      .as[SimRow]
      .groupByKey(r => r.bkey)
      .flatMapGroupsWithState[BucketState, SimHit](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(
        updateSim(capacity, hUs))
  }
}
