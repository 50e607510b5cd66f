package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkTestBase

/** Pins [[SpanScreenStream]]: a region copied from an earlier document is
  * detected across batches (content-defined selection makes the copy emit
  * the same span hashes), a document's own re-arrival is silent, the span
  * construction is exactly q171's batch construction, and idle span state
  * is evicted at the horizon.
  */
class SpanScreenStreamSpec extends SparkTestBase {

  private val b = 1704067200000000000L // 2024-01-01 ns
  private val hourNs = 3600000000000L

  // long shared region: interior minimizer windows co-select identically
  private val sharedRegion =
    "the very same long paragraph of reference text that a later document " +
      "will lift verbatim from this one, amply longer than one span window"
  private val textA = "original context before. " + sharedRegion
  private val textCopy = "totally new framing text here! " + sharedRegion +
    " plus an original continuation of its own"
  private val textB = "an entirely unrelated document about shuffles " * 3

  private def run(capacity: Int = 16)(
      feed: (MemoryStream[(Long, Long, String)],
        org.apache.spark.sql.streaming.StreamingQuery) => Unit)
      : Seq[SpanScreenStream.Hit] = {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(Long, Long, String)]
    val hits = SpanScreenStream.attach(
      input.toDS().toDF("doc_id", "ts", "text"), "1 hour", capacity)
    val name = s"spanscreen_${System.nanoTime()}"
    val query = hits.writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append()).start()
    try {
      feed(input, query)
      spark.table(name).as[SpanScreenStream.Hit].collect().toSeq
    } finally query.stop()
  }

  test("a copied region is flagged across batches with the original as ref") {
    val out = run() { (input, query) =>
      input.addData((1L, b, textA), (10L, b, textB))
      query.processAllAvailable()
      input.addData((2L, b + 1000000000L, textCopy))
      query.processAllAvailable()
    }
    val hits2 = out.filter(h => h.doc_id == 2L && h.n_prior > 0)
    assert(hits2.nonEmpty, "copy produced no span recurrences")
    assert(hits2.forall(_.first_doc.contains(1L)))
    // doc 10 shares nothing: every emission for it is first-arrival
    assert(out.filter(_.doc_id == 10L).forall(_.n_prior == 0))
  }

  test("same doc re-arrival is silent, not a self-copy") {
    val out = run() { (input, query) =>
      input.addData((1L, b, textA))
      query.processAllAvailable()
      input.addData((1L, b + 1000000000L, textA))
      query.processAllAvailable()
    }
    assert(out.forall(h => h.doc_id == 1L && h.n_prior == 0))
    // exactly one emission per selected span, none for the re-arrival
    assert(out.size == out.map(_.h).distinct.size)
  }

  test("span derivation is q171's batch construction (stream/batch parity)") {
    // the SAME rows through spanFrame must equal applying the minimizer
    // kernel + substr + xxhash64 in plain batch expressions
    import spark.implicits._
    val docs = Seq((1L, b, textA), (2L, b + 1000000000L, textCopy))
      .toDF("doc_id", "ts", "text")
    val streamSide = SpanScreenStream.spanFrame(docs)
      .select("h", "doc_id").collect().map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    val batchSide = docs
      .select(col("doc_id"), col("text"),
        explode(graft.functions.MinimizerOffsetsExpression.offsets(
          col("text"), 30, 8)).as("p"))
      .select(xxhash64(col("text").substr(col("p"), lit(30))).as("h"),
        col("doc_id")).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(streamSide == batchSide && streamSide.nonEmpty)
    // and the copied region really co-selects: shared hashes across docs
    val shared = streamSide.filter(_._2 == 1L).map(_._1) intersect
      streamSide.filter(_._2 == 2L).map(_._1)
    assert(shared.nonEmpty)
  }

  test("horizon evicts idle span state (timer-driven)") {
    val out = run() { (input, query) =>
      input.addData((1L, b, textA))
      query.processAllAvailable()
      // advance the watermark far past horizon + delay; then a trigger with
      // no data for the old spans fires their timers
      input.addData((50L, b + 10 * hourNs, textB))
      query.processAllAvailable()
      input.addData((51L, b + 10 * hourNs + 1000000000L, textB))
      query.processAllAvailable()
      // the copy arrives after eviction: no refs remembered
      input.addData((2L, b + 10 * hourNs + 2000000000L, textCopy))
      query.processAllAvailable()
    }
    assert(out.filter(_.doc_id == 2L).forall(h =>
      h.n_prior == 0 && h.first_doc.isEmpty))
  }
}
