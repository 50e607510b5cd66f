package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkTestBase

class JoinStreamSpec extends SparkTestBase {

  private val minNs = 60000000000L // one minute in nanoseconds

  // (ts, user_id, event_id) rows; event times offset from epoch so nothing
  // collides with the initial watermark (round-3 gotcha)
  private val viewRows = Seq(
    (10 * minNs, 1L, 100L), // matched by clicks at +5min and +10min (edge)
    (10 * minNs, 2L, 101L), // matched once; click at +11min is out of range
    (40 * minNs, 1L, 102L), // second view of user 1, no later click
    (10 * minNs, 3L, 103L)) // user with no clicks at all
  private val clickRows = Seq(
    (15 * minNs, 1L, 200L), // 100 +5min
    (20 * minNs, 1L, 201L), // 100 +10min boundary — inclusive
    (9 * minNs, 2L, 202L),  // BEFORE user 2's view — excluded
    (21 * minNs, 2L, 203L), // 101 +11min — out of range
    (12 * minNs, 2L, 204L)) // 101 +2min

  test("stream-stream interval join equals the same join run in batch") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    val vIn = MemoryStream[(Long, Long, Long)]
    val cIn = MemoryStream[(Long, Long, Long)]
    val joined = JoinStream.viewClickAttribution(
      vIn.toDF().toDF("ts", "user_id", "event_id"),
      cIn.toDF().toDF("ts", "user_id", "event_id"))
    val query = joined.writeStream
      .format("memory").queryName("attr_join_test")
      .outputMode(OutputMode.Append())
      .start()
    val streamed =
      try {
        vIn.addData(viewRows: _*)
        cIn.addData(clickRows: _*)
        query.processAllAvailable()
        spark.table("attr_join_test")
          .select("user_id", "view_id", "click_id")
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
          .toSet
      } finally query.stop()

    // the same operator over the same rows as finite frames: streaming
    // append-mode inner join must produce exactly the batch result
    val batch = JoinStream.viewClickAttribution(
      viewRows.toDF("ts", "user_id", "event_id"),
      clickRows.toDF("ts", "user_id", "event_id"))
      .select("user_id", "view_id", "click_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

    assert(streamed == batch)
    assert(streamed == Set(
      (1L, 100L, 200L), // +5 min
      (1L, 100L, 201L), // +10 min inclusive boundary
      (2L, 101L, 204L)) // +2 min; the +11min and before-view clicks excluded
    )
  }

  test("left-outer join emits null-click rows once the watermark expires " +
    "the view's match window, and equals the batch left-outer join") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    val vIn = MemoryStream[(Long, Long, Long)]
    val cIn = MemoryStream[(Long, Long, Long)]
    val joined = JoinStream.viewClickAttributionLeftOuter(
      vIn.toDF().toDF("ts", "user_id", "event_id"),
      cIn.toDF().toDF("ts", "user_id", "event_id"))
    val query = joined.writeStream
      .format("memory").queryName("attr_left_join_test")
      .outputMode(OutputMode.Append())
      .start()
    val streamed =
      try {
        vIn.addData(viewRows: _*)
        cIn.addData(clickRows: _*)
        query.processAllAvailable()
        // At this point no null row may exist: every view's match window is
        // still open (watermark = max event time - 30 min), so an eager
        // emission here would be a correctness bug, not a latency win.
        val early = spark.table("attr_left_join_test")
          .filter("click_id IS NULL").count()
        assert(early == 0L, "null rows emitted before watermark expiry")
        // Push both watermarks far past every view's window close
        // (view_time + 10 min match + 30 min delay): two pusher batches,
        // because the watermark computed at batch N's end only evicts (and
        // null-emits) during batch N+1. Pusher users are distinct so the
        // pushers themselves never match anything.
        vIn.addData((1000 * minNs, 98L, 900L))
        cIn.addData((1000 * minNs, 99L, 901L))
        query.processAllAvailable()
        vIn.addData((1001 * minNs, 98L, 902L))
        cIn.addData((1001 * minNs, 99L, 903L))
        query.processAllAvailable()
        spark.table("attr_left_join_test")
          .filter("user_id <= 3") // pusher views' own windows never close
          .select("user_id", "view_id", "click_id")
          .collect()
          .map(r => (r.getLong(0), r.getLong(1),
            if (r.isNullAt(2)) -1L else r.getLong(2)))
          .toSet
      } finally query.stop()

    // batch parity on the finite prefix: a batch left-outer join over the
    // same rows emits the identical set (batch resolves "no click can still
    // arrive" by exhaustion; streaming resolves it by watermark — the
    // results must agree once the watermark has passed)
    val batch = JoinStream.viewClickAttributionLeftOuter(
      viewRows.toDF("ts", "user_id", "event_id"),
      clickRows.toDF("ts", "user_id", "event_id"))
      .select("user_id", "view_id", "click_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2)))
      .toSet

    assert(streamed == batch)
    assert(streamed == Set(
      (1L, 100L, 200L), // inner matches, exactly as before
      (1L, 100L, 201L),
      (2L, 101L, 204L),
      (1L, 102L, -1L),  // user 1's second view: no click in its window
      (3L, 103L, -1L))  // user 3 never clicked
    )
  }

  test("full-outer join null-emits BOTH unmatched sides at watermark " +
    "expiry, and equals the batch full-outer join") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    val vIn = MemoryStream[(Long, Long, Long)]
    val cIn = MemoryStream[(Long, Long, Long)]
    val joined = JoinStream.viewClickAttributionFullOuter(
      vIn.toDF().toDF("ts", "user_id", "event_id"),
      cIn.toDF().toDF("ts", "user_id", "event_id"))
    val query = joined.writeStream
      .format("memory").queryName("attr_full_join_test")
      .outputMode(OutputMode.Append())
      .start()
    def opt(r: org.apache.spark.sql.Row, i: Int): Long =
      if (r.isNullAt(i)) -1L else r.getLong(i)
    val streamed =
      try {
        vIn.addData(viewRows: _*)
        cIn.addData(clickRows: _*)
        query.processAllAvailable()
        vIn.addData((1000 * minNs, 98L, 900L))
        cIn.addData((1000 * minNs, 99L, 901L))
        query.processAllAvailable()
        vIn.addData((1001 * minNs, 98L, 902L))
        cIn.addData((1001 * minNs, 99L, 903L))
        query.processAllAvailable()
        spark.table("attr_full_join_test")
          .filter("user_id <= 3")
          .select("user_id", "view_id", "click_id")
          .collect().map(r => (r.getLong(0), opt(r, 1), opt(r, 2))).toSet
      } finally query.stop()

    val batch = JoinStream.viewClickAttributionFullOuter(
      viewRows.toDF("ts", "user_id", "event_id"),
      clickRows.toDF("ts", "user_id", "event_id"))
      .select("user_id", "view_id", "click_id")
      .collect().map(r => (r.getLong(0), opt(r, 1), opt(r, 2))).toSet

    assert(streamed == batch)
    assert(streamed == Set(
      (1L, 100L, 200L),
      (1L, 100L, 201L),
      (2L, 101L, 204L),
      (1L, 102L, -1L),  // unmatched views, as in left-outer
      (3L, 103L, -1L),
      (2L, -1L, 202L),  // click BEFORE user 2's view: view side NULL
      (2L, -1L, 203L))  // click past the window: view side NULL
    )
  }
}
