package graft.streaming

import java.security.MessageDigest

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkTestBase

/** Loop-closure for the q238 watermark-lateness audit: the batch lateness
  * rule q238 measures (`late = running-max(event time) - t`, drop iff
  * `late > delay`) must predict EXACTLY what Spark's watermark protocol
  * drops when the same events are replayed one micro-batch per arrival.
  *
  * With one event per micro-batch, Spark's global watermark before batch N
  * is `floor_ms(max event time over batches < N) - delay`, and a stateful
  * operator filters rows strictly below it — which is q238's strict
  * `late > delay` rule up to the sub-millisecond floor (asserted identical
  * on this data). The real events table arrives perfectly in event_id
  * order (generation order == time order), so on real arrival q238
  * predicts zero drops — asserted as the vacuous case — and the
  * adversarial case replays the busiest user's real events in a
  * DETERMINISTIC md5-permuted arrival order, where lateness is nonzero
  * and every drop must land exactly where the rule says.
  */
class WatermarkSizingSpec extends SparkTestBase {

  private val DelayUs = 300000000L // the 5-minute delay q238 sizes

  /** (event_id, ts-us) rows of the busiest user, deterministic. */
  private def busiestUserRows(): Seq[(Long, Long)] = {
    val ev = graft.queries.Tables.events(spark, sf())
      .select(col("user_id"), col("event_id"), expr("ts DIV 1000").as("us"))
    val top = ev.groupBy(col("user_id")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("user_id")).limit(1)
      .collect()(0).getLong(0)
    ev.filter(col("user_id") === top)
      .select(col("event_id"), col("us"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toSeq
  }

  private def md5hex(x: Long): String =
    MessageDigest.getInstance("MD5").digest(x.toString.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  /** q238's batch rule over an arrival sequence: running max INCLUDING the
    * row (a row that advances the max has late = 0), drop iff strictly
    * later than the delay. Returns the predicted-drop event_ids.
    */
  private def q238Predicted(arr: Seq[(Long, Long)], delayUs: Long): Set[Long] = {
    var runMax = Long.MinValue
    arr.flatMap { case (id, us) =>
      runMax = math.max(runMax, us)
      if (runMax - us > delayUs) Some(id) else None
    }.toSet
  }

  /** Spark's actual protocol at one-event-per-batch granularity: the
    * watermark seen by batch N is floor-to-ms(max over previous batches)
    * minus the delay; a row strictly below it is dropped.
    */
  private def protocolPredicted(arr: Seq[(Long, Long)], delayUs: Long): Set[Long] = {
    var prevMax = Long.MinValue
    arr.flatMap { case (id, us) =>
      val wmUs = if (prevMax == Long.MinValue) Long.MinValue
        else (prevMax / 1000L) * 1000L - delayUs
      val dropped = us < wmUs
      prevMax = math.max(prevMax, us)
      if (dropped) Some(id) else None
    }.toSet
  }

  /** Replay `arr` one micro-batch per event through a 5-minute-watermark
    * dedup on the (unique) event_id; the kept ids are the stream's
    * surviving set.
    */
  private def streamKept(arr: Seq[(Long, Long)], name: String): Set[Long] = {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(Long, Long)]
    val out = input.toDS().toDF("event_id", "us")
      .withColumn("event_time", timestamp_micros(col("us")))
      .withWatermark("event_time", "5 minutes")
      .dropDuplicatesWithinWatermark("event_id")
    val query = out.writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append()).start()
    try {
      arr.foreach { r =>
        input.addData(r)
        query.processAllAvailable()
      }
      spark.table(name).select("event_id").collect().map(_.getLong(0)).toSet
    } finally query.stop()
  }

  test("real arrival order is in-order: q238 predicts zero drops and the stream drops zero") {
    val rows = busiestUserRows().sortBy(_._1) // event_id = arrival order
    val predicted = q238Predicted(rows, DelayUs)
    assert(predicted.isEmpty,
      "real events arrive in generation order; q238's audit measures zero lateness")
    val kept = streamKept(rows, "wm_inorder")
    assert(kept == rows.map(_._1).toSet)
  }

  test("md5-permuted arrival: the 5-minute watermark drops exactly the q238-predicted set") {
    val rows = busiestUserRows().sortBy(r => md5hex(r._1))
    val predicted = q238Predicted(rows, DelayUs)
    val protocol = protocolPredicted(rows, DelayUs)
    // the strict batch rule and the ms-floored protocol agree on this data
    // (no lateness value inside the sub-ms sliver between them)
    assert(predicted == protocol)
    assert(predicted.nonEmpty, "the permuted replay must exercise real drops")
    assert(predicted.size < rows.size)
    val kept = streamKept(rows, "wm_permuted")
    assert(kept == rows.map(_._1).toSet -- predicted)
  }
}
