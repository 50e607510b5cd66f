package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkTestBase

class SprtStreamSpec extends SparkTestBase {

  /** The batch q318 trial grain, replicated with its exact column
    * expressions: one (arm, day, conv) row per user-day, ordered by day —
    * the completed-trial feed an upstream day-close stage would emit.
    */
  private def batchTrials: Seq[(Long, String, Long)] = {
    import spark.implicits._
    graft.queries.Tables.events(spark, sf())
      .selectExpr("user_id", "(ts DIV 1000) DIV 86400000000 AS day",
        "event_type", "value")
      .groupBy("user_id", "day")
      .agg(org.apache.spark.sql.functions.expr(
        "max(CASE WHEN event_type = 'purchase' AND value > 150 " +
          "THEN 1L ELSE 0L END)").as("conv"))
      .selectExpr("day",
        "CASE WHEN substring(md5(CAST(user_id AS STRING)), 1, 1) < '8' " +
          "THEN 'A' ELSE 'B' END AS arm",
        "conv")
      .as[(Long, String, Long)].collect().toSeq.sortBy(r => (r._1, r._2))
  }

  test("streamed SPRT walk prefix-equals batch q318 at every batch cut") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val trials = batchTrials
    assert(trials.nonEmpty)
    val days = trials.map(_._1).distinct.sorted
    // batch truth: q318's full walk, keyed by (arm, day)
    val batch = graft.SparkEntry.queries("q318_sprt_monitor")(spark, sf())
      .collect()
      .map(r => (r.getAs[String]("arm"), r.getAs[Long]("day")) ->
        (r.getAs[Long]("n_cum"), r.getAs[Long]("conv_cum"),
          r.getAs[Double]("llr"), r.getAs[String]("decision")))
      .toMap

    val input = MemoryStream[SprtStream.Trial]
    val out = SprtStream.monitor(input.toDS())
    val query = out.writeStream.format("memory")
      .queryName("sprt_stream_test").outputMode(OutputMode.Update()).start()
    def lastSnapPerArm(): Map[String, SprtStream.SprtSnap] =
      spark.table("sprt_stream_test")
        .as[SprtStream.SprtSnap].collect()
        .zipWithIndex
        .groupBy(_._1.arm)
        .map { case (a, rows) => a -> rows.maxBy(_._2)._1 }
    def assertDay(day: Long): Unit =
      lastSnapPerArm().foreach { case (arm, snap) =>
        batch.get((arm, day)).foreach { case (n, c, llr, dec) =>
          assert(snap.n_cum == n, s"$arm day $day n_cum")
          assert(snap.conv_cum == c, s"$arm day $day conv_cum")
          assert(math.abs(snap.llr - llr) < 1e-9, s"$arm day $day llr")
          assert(snap.decision == dec, s"$arm day $day decision")
        }
      }
    try {
      // prefix equality at 10 single-day cuts, then the remainder in one
      // micro-batch with the final positions checked against the batch
      // walk's last row per arm
      val (single, bulk) = days.splitAt(10)
      single.foreach { day =>
        input.addData(trials.filter(_._1 == day)
          .map(t => SprtStream.Trial(t._2, t._3)))
        query.processAllAvailable()
        assertDay(day)
      }
      if (bulk.nonEmpty) {
        input.addData(trials.filter(t => bulk.contains(t._1))
          .map(t => SprtStream.Trial(t._2, t._3)))
        query.processAllAvailable()
      }
      val lastDayPerArm = trials.groupBy(_._2)
        .map { case (a, rows) => a -> rows.map(_._1).max }
      lastSnapPerArm().foreach { case (arm, snap) =>
        val (n, c, llr, dec) = batch((arm, lastDayPerArm(arm)))
        assert(snap.n_cum == n, s"$arm final n_cum")
        assert(snap.conv_cum == c, s"$arm final conv_cum")
        assert(math.abs(snap.llr - llr) < 1e-9, s"$arm final llr")
        assert(snap.decision == dec, s"$arm final decision")
      }
      // O(1)-per-arm state: one walk per arm, nothing else keyed
      assert(lastSnapPerArm().size == trials.map(_._2).distinct.size)
    } finally query.stop()
  }
}
