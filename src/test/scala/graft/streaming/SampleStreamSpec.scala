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
}
