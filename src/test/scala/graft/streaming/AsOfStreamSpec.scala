package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkTestBase

/** Batch↔stream parity for the as-of enrichment: replaying the real events
  * table (purchases as facts, views as features) through [[AsOfStream]]
  * must reproduce the native batch operator's answer row-for-row — q158
  * (unbounded lookback) and q162 (30-minute staleness tolerance) are the
  * oracle-checked truths the stream is held to. Plus the tier's eviction
  * contract: fully-silent keys retire after the horizon, while fact
  * traffic alone keeps a key's feature state alive.
  */
class AsOfStreamSpec extends SparkTestBase {

  /** Replay the real purchases/views through the stream in event-time
    * order (coordinated chunks across both inputs) and return
    * event_id -> asof. */
  private def replay(tolerance: Option[Long],
      name: String): Map[Long, Option[Double]] = {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val ev = graft.queries.Tables.events(spark, sf())
      .select(col("event_type"), col("event_id"), col("user_id"),
        expr("ts DIV 1000").as("us"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select("user_id", "event_id", "us").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val views = ev.filter(col("event_type") === "view")
      .select("user_id", "us").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val allTs = (purchases.map(_._3) ++ views.map(_._2)).sorted
    val cuts = (1 to 6)
      .map(i => allTs(math.min(allTs.length - 1, i * allTs.length / 7)))
      .distinct :+ Long.MaxValue
    // ONE tagged-union source split into the two attach inputs: the query
    // triggers continuously from start(), so two separate MemoryStreams
    // would race — a micro-batch can fire between the two addData calls
    // and process a chunk's facts before its features reach state (seen
    // live: chunk-1 purchases enriched None under machine load). Feeding
    // both sides from one source makes each chunk's cross-source delivery
    // atomic per batch, which is exactly the coordinated event-time replay
    // the operator's contract requires of a backfill.
    val in = MemoryStream[(Long, Int, Long, Long, Double)]
    val both = in.toDS().toDF("key", "side", "event_id", "ts_us", "value")
    // history replay: parity needs no mid-stream retirement (the default
    // horizon is an ingest-cadence knob, not part of the join contract)
    val out = AsOfStream.attach(
      both.filter(col("side") === 0).select("key", "event_id", "ts_us"),
      both.filter(col("side") === 1).select("key", "ts_us", "value"),
      toleranceUs = tolerance, retireUs = 3650L * 86400000000L)
    val query = out.toDF().writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append()).start()
    try {
      var lo = Long.MinValue
      cuts.foreach { hi =>
        in.addData(
          purchases.filter(p => p._3 >= lo && p._3 < hi)
            .map(p => (p._1, 0, p._2, p._3, 0.0)).toSeq ++
          views.filter(v => v._2 >= lo && v._2 < hi)
            .map(v => (v._1, 1, 0L, v._2, v._2.toDouble)).toSeq)
        query.processAllAvailable()
        lo = hi
      }
      val got = spark.table(name).collect()
        .map(r => r.getLong(1) ->
          (if (r.isNullAt(3)) None else Some(r.getDouble(3))))
      assert(got.length == purchases.length,
        s"${got.length} enriched facts for ${purchases.length} purchases")
      got.toMap
    } finally query.stop()
  }

  private def batchTruth(queryName: String): Map[Long, Option[Double]] =
    graft.queries.Events.defs.find(_.name == queryName).get
      .spark(spark, sf())
      .collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(3)) None else Some(r.getLong(3).toDouble)))
      .toMap

  test("streaming as-of enrichment reproduces the native batch operator " +
      "(q158, unbounded lookback) on the real events table") {
    assert(replay(None, "asof_parity") == batchTruth("q158_asof_native"))
  }

  test("the staleness-tolerance path reproduces q162 (30-minute bound)") {
    assert(replay(Some(1800000000L), "asof_parity_tol") ==
      batchTruth("q162_asof_tolerance"))
  }

  test("silent keys retire after the horizon; fact traffic keeps a key " +
      "alive; a retired key's facts lose enrichment") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val hourUs = 3600000000L
    val t0 = 100L * hourUs // well past the initial 0 watermark
    val fIn = MemoryStream[(Long, Long, Long)]
    val ftIn = MemoryStream[(Long, Long, Double)]
    val out = AsOfStream.attach(
      fIn.toDS().toDF("key", "event_id", "ts_us"),
      ftIn.toDS().toDF("key", "ts_us", "value")) // default 6h horizon
    val query = out.toDF().writeStream.format("memory")
      .queryName("asof_evict").outputMode(OutputMode.Append()).start()
    try {
      // b1: features for keys 1 and 3; early facts enrich
      ftIn.addData((1L, t0, 7.0), (3L, t0, 9.0))
      fIn.addData((1L, 11L, t0 + 1 * hourUs), (3L, 31L, t0 + 3 * hourUs))
      query.processAllAvailable()
      // b2: key 2 advances the watermark to t0+8h — past key 1's timeout
      // (last seen t0+1h + 6h); key 3's fact refreshes its liveness
      fIn.addData((2L, 21L, t0 + 9 * hourUs), (3L, 32L, t0 + 6 * hourUs))
      query.processAllAvailable()
      // b3: the timeout fires; key 3 still enriched purely on fact traffic
      fIn.addData((3L, 33L, (t0 + 9.5 * hourUs).toLong))
      query.processAllAvailable()
      // b4: key 1 returns after retirement — its feature state is gone
      fIn.addData((1L, 12L, t0 + 11 * hourUs))
      query.processAllAvailable()

      val got = spark.table("asof_evict").collect()
        .map(r => r.getLong(1) ->
          (if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
      assert(got == Map(
        11L -> Some(7.0), // enriched before retirement
        31L -> Some(9.0), 32L -> Some(9.0),
        33L -> Some(9.0), // fact liveness kept key 3's profile alive
        21L -> None, // key 2 never had a feature
        12L -> None // retired: the horizon evicted key 1's profile
      ), got.toString)
    } finally query.stop()
  }
}
