package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkTestBase

class TopKStreamSpec extends SparkTestBase {

  test("exact regime: streamed top-k equals batch token counts across batches") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    val docs = graft.queries.Tables.documents(spark, sf())
      .selectExpr("doc_id", "text").as[(Long, String)].collect().toSeq
      .sortBy(_._1)
    // batch truth with the same tokenizer + sharding expressions
    val truth = graft.queries.Tables.documents(spark, sf())
      .selectExpr("explode(split(trim(text), '\\\\s+')) AS token")
      .where("length(token) > 0")
      .selectExpr("pmod(hash(token), 16) AS group", "token")
      .groupBy("group", "token").count()
      .as[(Int, String, Long)].collect()
      .map { case (g, t, c) => (g, t) -> c }.toMap

    val input = MemoryStream[(Long, String)]
    val out = TopKStream.attach(
      input.toDF().toDF("doc_id", "text"), groups = 16,
      capacity = 1024, k = 3)
    val query = out.writeStream.format("memory")
      .queryName("topk_stream_test").outputMode(OutputMode.Update()).start()
    try {
      val (first, second) = docs.splitAt(docs.size / 2)
      input.addData(first)
      query.processAllAvailable()
      input.addData(second)
      query.processAllAvailable()
      // last snapshot per group (update mode appends refreshed snapshots to
      // the memory sink; the final batch's rows are the current state)
      val snaps = spark.table("topk_stream_test")
        .as[TopKStream.GroupTopK].collect()
        .groupBy(_.group).map { case (g, rows) => g -> rows.last }
      assert(snaps.nonEmpty)
      snaps.foreach { case (g, snap) =>
        // capacity 1024 >> distinct tokens: sketch is exact, err 0, and the
        // top-3 matches the batch counts for that shard
        val want = truth.collect { case ((`g`, t), c) => (t, c) }.toSeq
          .sortBy { case (t, c) => (-c, t) }.take(3)
        val got = snap.counters.map(c => (c.token, c.count))
        assert(snap.counters.forall(_.err == 0L))
        assert(got == want, s"group $g: $got != $want")
      }
    } finally query.stop()
  }

  test("eviction regime: state stays capacity-bounded, counts overestimate") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    // one group (all same token prefix hashing apart is irrelevant: force
    // group collisions with capacity 4 and 12 distinct tokens, heavy skew
    // on t0 so the true heavy hitter must survive eviction pressure)
    val words = (Seq.fill(50)("t0") ++ (1 to 11).flatMap(i => Seq.fill(3)(s"t$i")))
    val input = MemoryStream[(Long, String)]
    val toks = input.toDF().toDF("doc_id", "text")
      .selectExpr("0 AS group", "text AS token").as[TopKStream.Tok]
    val out = TopKStream.topK(toks, capacity = 4, k = 4)
    val query = out.writeStream.format("memory")
      .queryName("topk_evict_test").outputMode(OutputMode.Update()).start()
    try {
      input.addData(words.zipWithIndex.map { case (w, i) => (i.toLong, w) })
      query.processAllAvailable()
      val snap = spark.table("topk_evict_test")
        .as[TopKStream.GroupTopK].collect().last
      assert(snap.counters.size <= 4)
      val top = snap.counters.head
      // the true heavy hitter survives, its count is an overestimate whose
      // err-corrected lower bound never exceeds the true frequency
      assert(top.token == "t0")
      assert(top.count >= 50 && top.count - top.err <= 50)
    } finally query.stop()
  }
}
