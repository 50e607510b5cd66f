package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkTestBase

class SampleStreamSpec extends SparkTestBase {

  private def batchTruth(items: Seq[(Long, Double)], k: Int): Seq[SampleStream.Kept] =
    items.map { case (id, lw) =>
      SampleStream.Kept(id, SampleStream.gumbelKey(id, lw))
    }.sorted(SampleStream.keptOrdering).take(k)

  test("stream sample equals batch Gumbel-top-k regardless of batching") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    // deterministic weights spanning several nats, like DSIR log-weights
    val items = (1L to 200L).map(id => (id, (id % 13).toDouble / 3.0 - 2.0))
    val k = 8

    val input = MemoryStream[(Long, Double)]
    val out = SampleStream.attach(
      input.toDF().toDF("doc_id", "log_weight"), shards = 4, k = k)
    val query = out.writeStream.format("memory")
      .queryName("sample_stream_test").outputMode(OutputMode.Update()).start()
    try {
      val (a, rest) = items.splitAt(70)
      val (b, c) = rest.splitAt(90)
      Seq(a, b, c).foreach { batch =>
        input.addData(batch)
        query.processAllAvailable()
      }
      val snaps = spark.table("sample_stream_test")
        .as[SampleStream.ShardSample].collect()
        .groupBy(_.shard).map { case (_, rows) => rows.last }.toSeq
      // per-shard state is k-bounded
      snaps.foreach(sn => assert(sn.kept.size <= k))
      // the merged stream sample IS the batch Gumbel-top-k of all items
      val got = SampleStream.globalTopK(snaps, k)
      assert(got == batchTruth(items, k))
    } finally query.stop()
  }

  test("at-least-once replay is a no-op on the maintained sample") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    val items = (1L to 50L).map(id => (id, id.toDouble / 10.0))
    val k = 5
    val input = MemoryStream[(Long, Double)]
    val out = SampleStream.attach(
      input.toDF().toDF("doc_id", "log_weight"), shards = 2, k = k)
    val query = out.writeStream.format("memory")
      .queryName("sample_replay_test").outputMode(OutputMode.Update()).start()
    try {
      input.addData(items)
      query.processAllAvailable()
      // replay a slice: identical (id, key) entries dedup inside the state
      input.addData(items.take(20))
      query.processAllAvailable()
      val snaps = spark.table("sample_replay_test")
        .as[SampleStream.ShardSample].collect()
        .groupBy(_.shard).map { case (_, rows) => rows.last }.toSeq
      assert(SampleStream.globalTopK(snaps, k) == batchTruth(items, k))
    } finally query.stop()
  }

  test("re-delivery with an updated weight merges to one max-key entry " +
    "per id, independent of delivery order") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    val k = 5
    val input = MemoryStream[(Long, Double)]
    val out = SampleStream.attach(
      input.toDF().toDF("doc_id", "log_weight"), shards = 1, k = k)
    val query = out.writeStream.format("memory")
      .queryName("sample_update_test").outputMode(OutputMode.Update()).start()
    try {
      // id 1 arrives with a low weight, then re-delivered with a high one
      // (a weight UPDATE, not an exact replay); ids 2-4 fill the sample
      input.addData(Seq((1L, -1.0), (2L, 0.5), (3L, 0.5), (4L, 0.5)))
      query.processAllAvailable()
      input.addData(Seq((1L, 9.0)))
      query.processAllAvailable()
      val kept = spark.table("sample_update_test")
        .as[SampleStream.ShardSample].collect().last.kept
      // exactly one entry for id 1, carrying the max-key (updated) weight
      assert(kept.count(_.id == 1L) == 1)
      assert(kept.find(_.id == 1L).get.key ==
        SampleStream.gumbelKey(1L, 9.0))
      // and the merge is the one batchTruth over max-weight-per-id items
      val truth = batchTruth(
        Seq((1L, 9.0), (2L, 0.5), (3L, 0.5), (4L, 0.5)), k)
      assert(kept == truth)
    } finally query.stop()
  }
}
