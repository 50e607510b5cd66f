package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkTestBase

/** Batch↔stream parity for the CUSUM monitor: replaying the real events
  * table in (time, event_id) order through [[CusumStream]] must reproduce
  * the batch prefix-sum frame BIT-FOR-BIT (double equality, no tolerance —
  * the addend order is identical by construction), and the argmax of the
  * emitted series must be exactly q256's changepoint.
  */
class CusumStreamSpec extends SparkTestBase {

  test("streaming CUSUM reproduces the batch prefix sums exactly") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    val ev = graft.queries.Tables.events(spark, sf())
      .select(col("event_type"), col("event_id"),
        expr("ts DIV 1000").as("us"), col("value"))
    // the batch tier's reference level (q256's rounding convention)
    val means = ev.groupBy(col("event_type"))
      .agg(round(avg(col("value")), 6).as("mu"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    // batch truth: per-key prefix sums in (us, event_id) order
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("us"), col("event_id"))
    val muCol = means.foldLeft(lit(Double.NaN)) { case (acc, (k, v)) =>
      when(col("event_type") === k, lit(v)).otherwise(acc)
    }
    val batch = ev.withColumn("mu", muCol)
      .withColumn("rn", row_number().over(w))
      .withColumn("s", sum(col("value") - col("mu"))
        .over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .select(col("event_type"), col("rn"), col("event_id"), col("s"))
      .collect()
      .map(r => (r.getString(0), r.getInt(1).toLong, r.getLong(2),
        r.getDouble(3)))
      .toSet

    // replay in arrival (= time) order across a few micro-batches
    val rows = ev.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .sortBy(t => (t._3, t._2))
    val input = MemoryStream[(String, Long, Long, Double)]
    // retire horizon wider than the corpus span: this test replays history,
    // where mid-stream eviction (the default 6 h horizon; see the eviction
    // test) would legitimately restart sparse keys — parity needs none
    val out = CusumStream.attach(
      input.toDS().toDF("event_type", "event_id", "us", "value")
        .select(col("event_type"), col("event_id"),
          (col("us") * 1000).as("ts"), col("value")),
      means, retireUs = 3650L * 86400000000L)
    val query = out.toDF().writeStream.format("memory")
      .queryName("cusum_parity").outputMode(OutputMode.Append()).start()
    try {
      rows.grouped(math.max(rows.length / 7, 1)).foreach { chunk =>
        input.addData(chunk.toSeq)
        query.processAllAvailable()
      }
      val streamed = spark.table("cusum_parity")
        .select("event_type", "rn", "event_id", "cusum")
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getDouble(3)))
        .toSet
      assert(streamed.size == rows.length)
      assert(streamed == batch,
        "streaming CUSUM series diverged from the batch prefix sums")

      // and the online argmax is exactly q256's changepoint
      val q256 = graft.queries.Events.defs
        .find(_.name == "q256_cusum_changepoint").get
        .spark(spark, sf())
        .select("event_type", "cp_index", "max_abs_cusum")
        .collect()
        .map(r => (r.getString(0), r.getInt(1).toLong, r.getDouble(2)))
        .toSet
      val online = streamed.groupBy(_._1).map { case (t, pts) =>
        val best = pts.toSeq
          .map(p => (p._2, BigDecimal(math.abs(p._4))
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
          .minBy { case (rn, a) => (-a, rn) }
        (t, best._1, best._2)
      }.toSet
      assert(online == q256,
        "online argmax disagrees with q256's retrospective changepoint")
    } finally query.stop()
  }

  test("a silent key's state is evicted after the retire horizon; " +
      "live keys keep their series") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    val hourUs = 3600000000L
    val input = MemoryStream[(String, Long, Long, Double)]
    val out = CusumStream.attach(
      input.toDS().toDF("event_type", "event_id", "us", "value")
        .select(col("event_type"), col("event_id"),
          (col("us") * 1000).as("ts"), col("value")),
      Map("a" -> 0.0, "b" -> 0.0))
    val query = out.toDF().writeStream.format("memory")
      .queryName("cusum_evict").outputMode(OutputMode.Append()).start()
    try {
      // base sits well past epoch 0 — rows AT the initial 0 watermark are
      // dropped as late before reaching the stateful operator
      val t0 = 100L * hourUs
      // t0: both keys alive
      input.addData(("a", 1L, t0, 1.0), ("b", 2L, t0, 10.0))
      query.processAllAvailable()
      // b advances event time to +9h → watermark lands at +8h, past a's
      // timeout (last a event + 6h); the NEXT batch fires the timeout
      input.addData(("b", 3L, t0 + 9L * hourUs, 10.0))
      query.processAllAvailable()
      input.addData(("b", 4L, t0 + 10L * hourUs, 10.0))
      query.processAllAvailable()
      // a resumes after retirement → must restart at rn=1 (state dropped);
      // without eviction this would be rn=2
      input.addData(("a", 5L, t0 + 12L * hourUs, 2.0))
      query.processAllAvailable()

      val pts = spark.table("cusum_evict")
        .select("event_type", "rn", "event_id", "cusum")
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getDouble(3)))
        .toSet
      val aPts = pts.filter(_._1 == "a")
      assert(aPts == Set(("a", 1L, 1L, 1.0), ("a", 1L, 5L, 2.0)),
        s"retired key 'a' did not restart from scratch: $aPts")
      val bPts = pts.filter(_._1 == "b")
      assert(bPts == Set(("b", 1L, 2L, 10.0), ("b", 2L, 3L, 20.0),
        ("b", 3L, 4L, 30.0)),
        s"live key 'b' lost continuity: $bPts")
    } finally query.stop()
  }
}
