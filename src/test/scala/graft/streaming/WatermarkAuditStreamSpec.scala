package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkTestBase

/** Batch↔stream parity for the watermark-lateness meter: replaying the
  * events table in arrival (event_id) order through
  * [[WatermarkAuditStream]] must emit EXACTLY the batch running-max
  * lateness per event, and the per-type percentile/drop-fraction rollup of
  * the emitted points must reproduce `q238_watermark_audit`'s output.
  * Eviction is pinned through the state-store row count (see the operator
  * doc for why emitted values cannot witness it).
  */
class WatermarkAuditStreamSpec extends SparkTestBase {

  test("streamed lateness equals the batch running-max audit per event") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    val ev = graft.queries.Tables.events(spark, sf())
      .select(col("user_id"), col("event_type"), col("event_id"),
        expr("ts DIV 1000").as("us"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val batch = ev
      .withColumn("late",
        greatest(lit(0L), max(col("us")).over(w) - col("us")))
      .select(col("event_id"), col("late"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap

    val rows = ev.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._3) // global arrival order
    val input = MemoryStream[(Long, String, Long, Long)]
    val out = WatermarkAuditStream.attach(
      input.toDS().toDF("user_id", "event_type", "event_id", "us")
        .select(col("user_id"), col("event_type"), col("event_id"),
          (col("us") * 1000).as("ts")),
      retireUs = 3650L * 86400000000L) // replay: no mid-stream eviction
    val query = out.toDF().writeStream.format("memory")
      .queryName("wm_audit_parity").outputMode(OutputMode.Append()).start()
    try {
      rows.grouped(math.max(rows.length / 5, 1)).foreach { chunk =>
        input.addData(chunk.toSeq)
        query.processAllAvailable()
      }
      val streamed = spark.table("wm_audit_parity")
        .select("event_id", "late_us")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      assert(streamed.size == rows.length, "missing emitted events")
      assert(streamed == batch,
        "streamed lateness diverged from the batch running-max audit")

      // and the rolled-up readout reproduces q238 exactly
      val q238 = graft.queries.Events.defs
        .find(_.name == "q238_watermark_audit").get
        .spark(spark, sf()).collect()
        .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2),
          r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getDouble(6)))
        .toSet
      val fromStream = spark.table("wm_audit_parity")
        .withColumn("late_s", expr("late_us DIV 1000000L"))
        .groupBy(col("event_type"))
        .agg(
          round(expr("percentile(late_s, 0.5D)"), 4).as("p50"),
          round(expr("percentile(late_s, 0.95D)"), 4).as("p95"),
          round(expr("percentile(late_s, 0.99D)"), 4).as("p99"),
          round(avg((col("late_us") > 60000000L).cast("double")), 6)
            .as("f1"),
          round(avg((col("late_us") > 300000000L).cast("double")), 6)
            .as("f5"),
          round(avg((col("late_us") > 900000000L).cast("double")), 6)
            .as("f15"))
        .collect()
        .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2),
          r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getDouble(6)))
        .toSet
      assert(fromStream == q238,
        "per-type rollup of streamed lateness disagrees with q238")
    } finally query.stop()
  }

  test("a silent key's state row is evicted after the retire horizon") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val hourUs = 3600000000L
    val t0 = 100L * hourUs
    val input = MemoryStream[(Long, String, Long, Long)]
    val out = WatermarkAuditStream.attach(
      input.toDS().toDF("user_id", "event_type", "event_id", "us")
        .select(col("user_id"), col("event_type"), col("event_id"),
          (col("us") * 1000).as("ts")),
      retireUs = 6L * hourUs)
    val query = out.toDF().writeStream.format("memory")
      .queryName("wm_audit_evict").outputMode(OutputMode.Append()).start()
    try {
      input.addData((1L, "a", 1L, t0), (2L, "b", 2L, t0))
      query.processAllAvailable()
      assert(query.lastProgress.stateOperators(0).numRowsTotal == 2L)
      // user 2 advances event time 9h -> watermark 8h past user 1's
      // last event; the next batch fires user 1's 6h timeout
      input.addData((2L, "b", 3L, t0 + 9L * hourUs))
      query.processAllAvailable()
      input.addData((2L, "b", 4L, t0 + 10L * hourUs))
      query.processAllAvailable()
      assert(query.lastProgress.stateOperators(0).numRowsTotal == 1L,
        "retired key's state row was not evicted")
      // live key kept continuity the whole time
      val bLate = spark.table("wm_audit_evict")
        .filter(col("user_id") === 2L).select("event_id", "late_us")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(bLate == Set((2L, 0L), (3L, 0L), (4L, 0L)))
    } finally query.stop()
  }
}
