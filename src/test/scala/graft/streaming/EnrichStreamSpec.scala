package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkTestBase

/** Pins [[EnrichStream]]: the streamed enrichment equals the same join run
  * as a batch query over the same rows (streaming/batch duality), events
  * whose user is missing from the dimension keep flowing with the sentinel
  * segment, and the operator needs no state (append mode, no watermark).
  */
class EnrichStreamSpec extends SparkTestBase {

  private val b = 1704067200000000000L // 2024-01-01 ns

  test("stream equals batch; unmatched users keep flowing with a sentinel") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val customers = spark.read.parquet(s"${sf()}/customer.parquet")
    val rows = Seq(
      (1L, b, 0L, "view", 1.0),
      (2L, b + 1000000000L, 7L, "click", 2.5),
      (3L, b + 2000000000L, 999999L, "view", 0.0), // no such customer
      (4L, b + 3000000000L, 3L, "purchase", 9.9))

    val input = MemoryStream[(Long, Long, Long, String, Double)]
    val enriched = EnrichStream.enrich(
      input.toDS().toDF("event_id", "ts", "user_id", "event_type", "value"),
      customers)
    val name = s"enrich_${System.nanoTime()}"
    val query = enriched.writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append()).start()
    val streamed =
      try {
        input.addData(rows.take(2))
        query.processAllAvailable()
        input.addData(rows.drop(2)) // second batch re-resolves the static side
        query.processAllAvailable()
        spark.table(name).collect().map(r => (r.getLong(0), r.getString(5)))
          .toMap
      } finally query.stop()

    val batch = EnrichStream.enrich(
      rows.toDF("event_id", "ts", "user_id", "event_type", "value"),
      customers).collect().map(r => (r.getLong(0), r.getString(5))).toMap

    assert(streamed == batch)
    assert(streamed.size == 4) // nothing dropped
    assert(streamed(3L) == "(unknown)")
    assert(streamed(1L) != "(unknown)" && streamed(2L) != "(unknown)")
  }
}
