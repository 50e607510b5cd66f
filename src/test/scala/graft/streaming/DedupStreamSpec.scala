package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkTestBase

class DedupStreamSpec extends SparkTestBase {

  test("streaming dedup keeps first arrival per fingerprint within horizon") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    val minNs = 60000000000L // 1 minute in ns
    val input = MemoryStream[(Long, Long, String)]
    val df = input.toDF().toDF("ts", "doc_id", "text")
    val dedup = DedupStream.dedupByFingerprint(df, "10 minutes")

    val query = dedup.writeStream
      .format("memory")
      .queryName("dedup_stream_test")
      .outputMode(OutputMode.Append())
      .start()
    try {
      input.addData(
        (1 * minNs, 1L, "hello world"),
        (2 * minNs, 2L, "HELLO   world"), // same normalized fingerprint
        (3 * minNs, 3L, "different doc"),
        (4 * minNs, 4L, "hello world")) // dup again
      query.processAllAvailable()
      // advance watermark far enough to emit append-mode results
      input.addData((60 * minNs, 99L, "watermark pusher"))
      query.processAllAvailable()
      val kept = spark.table("dedup_stream_test")
        .select("doc_id").as[Long].collect().toSet
      // first arrival per fingerprint survives; 2 and 4 are dropped
      assert(kept.contains(1L) && kept.contains(3L))
      assert(!kept.contains(2L) && !kept.contains(4L))
    } finally query.stop()
  }

  test("streaming dedup agrees with batch exact-dedup on real docs") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    // batch truth: the distinct normalized fingerprints (q34 group keys),
    // computed with the same Spark expression the stream uses (JVM-side
    // toLowerCase differs from Spark lower on some code points). Which
    // doc_id survives per group is arbitrary within a micro-batch — same as
    // batch dropDuplicates — so parity is on the fingerprint set.
    val docs = graft.queries.Tables.documents(spark, sf())
      .selectExpr("doc_id", "text").as[(Long, String)].collect().toSeq
      .sortBy(_._1)
    val batchMd5 = graft.queries.Tables.documents(spark, sf())
      .selectExpr("md5(regexp_replace(lower(text), '\\\\s+', ' ')) AS fp")
      .distinct().as[String].collect().toSet

    val input = MemoryStream[(Long, Long, String)]
    val df = input.toDF().toDF("ts", "doc_id", "text")
    val dedup = DedupStream.dedupByFingerprint(df, "1 hour")
    val query = dedup.writeStream
      .format("memory")
      .queryName("dedup_batch_parity_test")
      .outputMode(OutputMode.Append())
      .start()
    try {
      // offset so no event_time lands on epoch 0 == the initial watermark
      // (a boundary row would be discarded as late before dedup sees it)
      input.addData(docs.map { case (id, text) =>
        ((id + 1) * 1000000000L, id, text)
      })
      query.processAllAvailable()
      input.addData((1e18.toLong, -1L, "watermark pusher"))
      query.processAllAvailable()
      val out = spark.table("dedup_batch_parity_test").filter("doc_id >= 0")
      val streamFps = out.select("fp").as[String].collect()
      // exactly one survivor per distinct fingerprint, covering the batch
      // normalization exactly
      assert(streamFps.length == batchMd5.size)
      assert(streamFps.toSet == batchMd5)
    } finally query.stop()
  }
}
