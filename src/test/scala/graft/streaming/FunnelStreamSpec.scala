package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkTestBase

class FunnelStreamSpec extends SparkTestBase {

  private val minNs = 60000000000L

  test("streaming funnel completes across micro-batches and matches batch logic") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    val in = MemoryStream[(Long, Long, String)]
    val out = FunnelStream.attach(
      in.toDF().toDF("ts", "user_id", "event_type"))
    val query = out.toDF().writeStream
      .format("memory").queryName("funnel_test")
      .outputMode(OutputMode.Append())
      .start()
    try {
      // batch 1: user 1 views then clicks; user 2 clicks BEFORE any view
      // (must not bind); user 3 views only
      in.addData(
        (10 * minNs, 1L, "view"),
        (12 * minNs, 1L, "click"),
        (5 * minNs, 2L, "click"),
        (8 * minNs, 2L, "view"),
        (9 * minNs, 3L, "view"))
      query.processAllAvailable()
      assert(spark.table("funnel_test").isEmpty) // nobody purchased yet

      // batch 2: user 1 purchases (completes); user 2 clicks after view then
      // purchases (completes); user 3 purchases with NO click (incomplete)
      in.addData(
        (20 * minNs, 1L, "purchase"),
        (15 * minNs, 2L, "click"),
        (16 * minNs, 2L, "purchase"),
        (18 * minNs, 3L, "purchase"))
      query.processAllAvailable()
      val got = spark.table("funnel_test")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSet
      val minUs = minNs / 1000
      assert(got == Set(
        (1L, 10 * minUs, 12 * minUs, 20 * minUs),
        (2L, 8 * minUs, 15 * minUs, 16 * minUs)))

      // batch 3: duplicate purchase must not re-emit; a second funnel for an
      // already-completed user must not start
      in.addData((25 * minNs, 1L, "purchase"), (26 * minNs, 1L, "view"))
      query.processAllAvailable()
      assert(spark.table("funnel_test").count() == 2)
    } finally query.stop()
  }

  test("within-batch disorder is sorted before the state machine runs") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    val in = MemoryStream[(Long, Long, String)]
    val out = FunnelStream.attach(
      in.toDF().toDF("ts", "user_id", "event_type"))
    val query = out.toDF().writeStream
      .format("memory").queryName("funnel_disorder_test")
      .outputMode(OutputMode.Append())
      .start()
    try {
      // delivered purchase-first within ONE batch; event-time order is
      // view < click < purchase, so the funnel must still complete
      in.addData(
        (30 * minNs, 7L, "purchase"),
        (10 * minNs, 7L, "view"),
        (20 * minNs, 7L, "click"))
      query.processAllAvailable()
      val minUs = minNs / 1000
      val got = spark.table("funnel_disorder_test")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      assert(got.toSeq == Seq((7L, 10 * minUs, 20 * minUs, 30 * minUs)))
    } finally query.stop()
  }
}
