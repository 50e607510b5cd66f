package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkTestBase

class EventsStreamSpec extends SparkTestBase {

  test("hourly streaming aggregate matches hand-computed windows") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    val hourNs = 3600000000000L
    // three events in hour 0, two in hour 1 (epoch-based)
    val input = MemoryStream[(Long, Long, Double)]
    val df = input.toDF().toDF("ts", "user_id", "value")
    val agg = EventsStream.hourlyAggregate(df)

    val query = agg.writeStream
      .format("memory")
      .queryName("hourly_agg_test")
      .outputMode(OutputMode.Complete())
      .start()
    try {
      input.addData(
        (1000L, 1L, 1.0), (hourNs / 2, 2L, 2.5), (hourNs - 1000L, 1L, 3.0),
        (hourNs + 1000L, 3L, 4.0), (hourNs + 2000L, 1L, 0.5))
      query.processAllAvailable()
      val out = spark.table("hourly_agg_test")
        .orderBy("window_start")
        .collect()
        .map(r => (r.getTimestamp(0).getTime, r.getLong(1), r.getDouble(2)))
      assert(out.toSeq == Seq(
        (0L, 3L, 6.5),          // hour-0 window: 1.0 + 2.5 + 3.0
        (3600000L, 2L, 4.5)))   // hour-1 window: 4.0 + 0.5
    } finally query.stop()
  }

  test("stream-static enrichment joins the user dimension per micro-batch") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    val hourNs = 3600000000000L
    val users = Seq((1L, "gold"), (2L, "silver"), (3L, "gold"))
      .toDF("user_id", "segment")
    val input = MemoryStream[(Long, Long, Double)]
    val df = input.toDF().toDF("ts", "user_id", "value")
    val agg = EventsStream.enrichedBySegment(df, users)

    val query = agg.writeStream
      .format("memory")
      .queryName("enriched_agg_test")
      .outputMode(OutputMode.Complete())
      .start()
    try {
      input.addData(
        (1000L, 1L, 1.0), (2000L, 2L, 2.0), (3000L, 3L, 3.0),
        (hourNs + 1000L, 1L, 4.0),
        (4000L, 99L, 100.0)) // user 99 not in the dimension -> dropped
      query.processAllAvailable()
      val out = spark.table("enriched_agg_test")
        .orderBy("window_start", "segment")
        .collect()
        .map(r => (r.getTimestamp(0).getTime, r.getString(1), r.getLong(2),
          r.getDouble(3)))
      assert(out.toSeq == Seq(
        (0L, "gold", 2L, 4.0),      // users 1 and 3 in hour 0
        (0L, "silver", 1L, 2.0),    // user 2 in hour 0
        (3600000L, "gold", 1L, 4.0))) // user 1 in hour 1
    } finally query.stop()
  }
}
