package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkTestBase

/** Pins [[DecontamStream]]: the streamed collision set equals the SAME
  * screen run as a batch query over the same rows (and therefore equals
  * q211's candidate generation, which uses the identical band
  * construction); documents with no eval collision flow through silently;
  * and the plan is stateless (no state store, no watermark — the eval
  * side is a static relation re-resolved per micro-batch).
  */
class DecontamStreamSpec extends SparkTestBase {

  test("stream equals batch screen; known eval near-dups are flagged; stateless") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
      .select(col("doc_id"), col("text"))
    val evalDocs = docs.filter(col("doc_id") % 10 === 0)
    val trainRows = docs.filter(col("doc_id") % 10 =!= 0)
      .as[(Long, String)].collect().toSeq

    val input = MemoryStream[(Long, String)]
    val screened = DecontamStream.screen(
      input.toDS().toDF("doc_id", "text"), evalDocs)
    val name = s"decontam_${System.nanoTime()}"
    val query = screened.writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append()).start()
    val (streamed, stateless) =
      try {
        // two micro-batches so the static side is re-resolved at least once
        input.addData(trainRows.take(trainRows.size / 2))
        query.processAllAvailable()
        input.addData(trainRows.drop(trainRows.size / 2))
        query.processAllAvailable()
        val rows = spark.table(name).collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
        val noState = Option(query.lastProgress)
          .forall(_.stateOperators.isEmpty)
        (rows, noState)
      } finally query.stop()

    val batch = DecontamStream.screen(
      trainRows.toDF("doc_id", "text"), evalDocs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet

    assert(streamed == batch, "stream/batch duality broken")
    // sf0.001 testdata has injected near-dups crossing the %10 split
    // (verified when q211 landed): the screen must catch at least one.
    assert(streamed.nonEmpty, "no collisions found — screen is blind")
    assert(stateless, "decontam screen must not allocate a state store")

    // every flagged train doc collides with a genuine eval-set member
    assert(streamed.forall { case (d, e, _) => d % 10 != 0 && e % 10 == 0 })

    // the screen is selective: most train docs carry no eval collision
    val flagged = streamed.map(_._1)
    assert(flagged.size < trainRows.size / 2,
      s"screen flagged ${flagged.size} of ${trainRows.size} train docs")
  }
}
