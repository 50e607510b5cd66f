package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkTestBase

/** Pins [[ExactlyOnceSink]]: keyed upsert semantics through a real
  * streaming query, replay idempotence (the exactly-once contract), and
  * crash recovery (an uncommitted version directory is invisible and a
  * retry lands cleanly).
  */
class ExactlyOnceSinkSpec extends SparkTestBase {
  import spark.implicits._

  private def tmp(name: String): String = {
    val d = java.nio.file.Files.createTempDirectory(name)
    d.toFile.deleteOnExit()
    d.toString
  }

  private def snapshot(dir: String): Seq[(Long, Long, String)] =
    ExactlyOnceSink.readTable(spark, dir)
      .orderBy("key").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq

  test("streamed batches upsert by key, latest timestamp wins") {
    implicit val sqlCtx = spark.sqlContext
    val dir = tmp("eos_table")
    val input = MemoryStream[(Long, Long, String)]
    val q = ExactlyOnceSink.attach(
      input.toDS().toDF("key", "ts_us", "payload"), dir, tmp("eos_ckpt"))
    try {
      input.addData((1L, 100L, "a1"), (2L, 100L, "b1"))
      q.processAllAvailable()
      assert(snapshot(dir) == Seq((1L, 100L, "a1"), (2L, 100L, "b1")))
      // update key 1, add key 3; stale event for key 2 (older ts) must lose
      input.addData((1L, 200L, "a2"), (3L, 150L, "c1"), (2L, 50L, "b0"))
      q.processAllAvailable()
      assert(snapshot(dir) == Seq(
        (1L, 200L, "a2"), (2L, 100L, "b1"), (3L, 150L, "c1")))
    } finally q.stop()
  }

  test("replaying an already-committed batch is a no-op") {
    val dir = tmp("eos_replay")
    val b0 = Seq((1L, 100L, "a1")).toDF("key", "ts_us", "payload")
    val b1 = Seq((1L, 200L, "a2")).toDF("key", "ts_us", "payload")
    assert(ExactlyOnceSink.applyBatch(spark, b0, 0L, dir))
    assert(ExactlyOnceSink.applyBatch(spark, b1, 1L, dir))
    val after = snapshot(dir)
    // at-least-once delivery replays batch 1 after a failure: skipped
    assert(!ExactlyOnceSink.applyBatch(spark, b1, 1L, dir))
    assert(snapshot(dir) == after)
    assert(after == Seq((1L, 200L, "a2")))
  }

  test("a crashed write (version dir without commit marker) is invisible and retryable") {
    val dir = tmp("eos_crash")
    val b0 = Seq((1L, 100L, "a1")).toDF("key", "ts_us", "payload")
    assert(ExactlyOnceSink.applyBatch(spark, b0, 0L, dir))
    // simulate a crash between data write and commit for batch 1
    Seq((9L, 900L, "junk")).toDF("key", "ts_us", "payload")
      .write.parquet(s"$dir/v=1")
    assert(snapshot(dir) == Seq((1L, 100L, "a1"))) // orphan ignored
    // the retry of batch 1 overwrites the orphan and commits atomically
    val b1 = Seq((2L, 200L, "b1")).toDF("key", "ts_us", "payload")
    assert(ExactlyOnceSink.applyBatch(spark, b1, 1L, dir))
    assert(snapshot(dir) == Seq((1L, 100L, "a1"), (2L, 200L, "b1")))
  }
}
