package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkTestBase

class SessionizeStreamSpec extends SparkTestBase {

  test("stateful streaming sessionization closes sessions on gap and watermark") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    val h = 3600000000000L // 1 hour in ns
    val b = 1704067200000000000L // 2024-01-01 in ns: epoch-0 events would
                                 // collide with the initial watermark value
    val input = MemoryStream[(Long, Long, Double)]
    val sessions = SessionizeStream.attach(
      input.toDS().toDF("ts", "user_id", "value"))

    val query = sessions.writeStream
      .format("memory")
      .queryName("sess_test")
      .outputMode(OutputMode.Append())
      .start()
    try {
      // user 1: two events 60s apart (one session), then one event 3h later
      // (gap > 30min -> closes the first session inline)
      input.addData((b, 1L, 1.0), (b + 60000000000L, 1L, 2.0),
        (b + 3 * h, 1L, 4.0))
      query.processAllAvailable()
      // user 2 event at 6h pushes the watermark to 5h (1h delay), past the
      // 3h session's 3h30m timeout -> timer closes it
      input.addData((b + 6 * h, 2L, 8.0))
      query.processAllAvailable()

      val out = spark.table("sess_test")
        .orderBy("user_id", "start_us")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getDouble(4)))
      val bus = b / 1000
      assert(out.toSeq == Seq(
        (1L, bus, bus + 60000000L, 2L, 3.0),               // gap-closed
        (1L, bus + 3 * h / 1000, bus + 3 * h / 1000, 1L, 4.0))) // timer-closed
    } finally query.stop()
  }

  test("streaming sessionization agrees with the batch q50 on real events") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    val rows = graft.queries.Tables.events(spark, sf())
      .select("ts", "user_id", "value")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sortBy(_._1)

    val input = MemoryStream[(Long, Long, Double)]
    val sessions = SessionizeStream.attach(
      input.toDS().toDF("ts", "user_id", "value"))
    val query = sessions.writeStream
      .format("memory").queryName("sess_batch_eq")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(rows.toSeq)
      query.processAllAvailable()
      // sentinel far past everything: watermark sweep closes all real sessions
      val flushTs = rows.map(_._1).max + 100L * 3600000000000L
      input.addData((flushTs, -1L, 0.0))
      query.processAllAvailable()

      val streamed = spark.table("sess_batch_eq")
        .filter($"user_id" >= 0)
        .groupBy("user_id")
        .agg(
          org.apache.spark.sql.functions.count(
            org.apache.spark.sql.functions.lit(1)).as("n_sessions"),
          org.apache.spark.sql.functions.sum("n_events").as("n_events"))
        .orderBy("user_id")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .toSeq

      val batch = graft.SparkEntry.queries("q50_sessionize")(spark, sf())
        .select("user_id", "n_sessions", "n_events")
        .collect()
        .map(r => (r.getLong(0), r.getInt(1).toLong, r.getLong(2)))
        .toSeq
      assert(streamed == batch)
    } finally query.stop()
  }
}
