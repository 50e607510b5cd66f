package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkTestBase

class KmvStreamSpec extends SparkTestBase {

  /** Batch truth with the IDENTICAL hashing expressions: per source, the
    * k smallest distinct hashes and the resulting estimate.
    */
  private def batchSketch(k: Int): Map[String, Vector[Long]] = {
    import spark.implicits._
    graft.queries.Tables.documents(spark, sf())
      .selectExpr("source", "explode(split(trim(text), '\\\\s+')) AS w")
      .where("length(w) > 0")
      .selectExpr("source",
        "CAST(conv(substring(md5(w), 1, 15), 16, 10) AS LONG) AS h")
      .distinct()
      .as[(String, Long)].collect()
      .groupBy(_._1)
      .map { case (s, rows) =>
        s -> rows.map(_._2).distinct.sorted.take(k).toVector
      }
  }

  test("streamed sketches equal the batch k-minima across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val k = 8 // small enough that sf0.001 sources saturate the sketch
    val truth = batchSketch(k)

    val docs = graft.queries.Tables.documents(spark, sf())
      .selectExpr("doc_id", "source", "text")
      .as[(Long, String, String)].collect().toSeq.sortBy(_._1)
    val input = MemoryStream[(Long, String, String)]
    val out = KmvStream.attach(
      input.toDF().toDF("doc_id", "source", "text"), k = k)
    val query = out.writeStream.format("memory")
      .queryName("kmv_stream_test").outputMode(OutputMode.Update()).start()
    try {
      val (first, second) = docs.splitAt(docs.size / 2)
      input.addData(first)
      query.processAllAvailable()
      input.addData(second)
      query.processAllAvailable()
      val snaps = spark.table("kmv_stream_test")
        .as[KmvStream.KmvSnap].collect()
        .groupBy(_.source).map { case (s, rows) => s -> rows.last }
      assert(snaps.keySet == truth.keySet)
      snaps.foreach { case (s, snap) =>
        val want = truth(s)
        assert(snap.n_sketch == want.length, s"source $s size")
        assert(snap.hk == want.last, s"source $s hk")
        assert(snap.est == KmvStream.estimate(k, want.length, want.last),
          s"source $s est")
        // at least one source must be in the estimating (saturated) regime
      }
      assert(snaps.values.exists(_.n_sketch == k),
        "test corpus never saturated the sketch — k too large to exercise " +
          "the estimating regime")
    } finally query.stop()
  }

  test("merge of two sources' sketches is the exact sketch of their union") {
    val k = 8
    val truth = batchSketch(k)
    val srcs = truth.keys.toSeq.sorted
    // all pairs: merged k-minima must equal the k-minima of the combined
    // distinct hash set (recomputed from scratch at full precision)
    import spark.implicits._
    val full = graft.queries.Tables.documents(spark, sf())
      .selectExpr("source", "explode(split(trim(text), '\\\\s+')) AS w")
      .where("length(w) > 0")
      .selectExpr("source",
        "CAST(conv(substring(md5(w), 1, 15), 16, 10) AS LONG) AS h")
      .distinct().as[(String, Long)].collect().groupBy(_._1)
      .map { case (s, rows) => s -> rows.map(_._2).toSet }
    for (a <- srcs; b <- srcs if a < b) {
      val merged = KmvStream.merge(k, truth(a), truth(b))
      val want = (full(a) ++ full(b)).toVector.sorted.take(k)
      assert(merged == want, s"merge($a, $b)")
    }
  }

  test("replaying a batch is a state no-op (idempotent updates)") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val k = 8
    val rows = Seq(("s1", 5L), ("s1", 3L), ("s1", 9L), ("s1", 3L))
      .map { case (s, h) => KmvStream.Hashed(s, h) }
    val input = MemoryStream[KmvStream.Hashed]
    val out = KmvStream.sketch(input.toDS(), k = k)
    val query = out.writeStream.format("memory")
      .queryName("kmv_replay_test").outputMode(OutputMode.Update()).start()
    try {
      input.addData(rows)
      query.processAllAvailable()
      input.addData(rows) // replay the identical batch
      query.processAllAvailable()
      val snaps = spark.table("kmv_replay_test")
        .as[KmvStream.KmvSnap].collect()
      assert(snaps.length == 2)
      assert(snaps(0) == snaps(1), "replay changed the snapshot")
      assert(snaps(1).n_sketch == 3 && snaps(1).hk == 9L)
    } finally query.stop()
  }
}
