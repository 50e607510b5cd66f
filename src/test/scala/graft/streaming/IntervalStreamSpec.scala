package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkTestBase

/** Batch↔stream parity for the interval pairing: replaying the real events
  * table (both sides = the event stream, q190's self-pairing shape)
  * through [[IntervalStream]] must reproduce the native batch operator
  * ([[graft.plans.IntervalJoin]]) PAIR-FOR-PAIR — q190 is the
  * oracle-checked truth the batch operator is held to, and the stream is
  * held to the batch operator on the same inputs at three scale factors
  * (the AsOfStream precedent, r13 task #8). Plus the tier's eviction
  * contract: a fully-silent key's buffer retires after the horizon, and
  * pairs never span equal timestamps or exceed the window.
  */
class IntervalStreamSpec extends SparkTestBase {

  private val WindowUs = 300000000L // 5 minutes, q190's window

  /** All (key, left_id, right_id) pairs from the streaming operator fed
    * the given events frame on both sides, replayed in coordinated
    * event-time chunks from one tagged-union source. */
  private def streamPairs(ev: DataFrame, name: String): Set[(Long, Long, Long)] = {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val rows = ev.select(col("user_id"), col("event_id"),
        expr("ts DIV 1000").as("us")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val allTs = rows.map(_._3).sorted
    val cuts = (1 to 6)
      .map(i => allTs(math.min(allTs.length - 1, i * allTs.length / 7)))
      .distinct :+ Long.MaxValue
    // one tagged-union source so each chunk's lefts and rights land in the
    // same micro-batch (the cross-source replay contract — see
    // AsOfStreamSpec's rationale)
    val in = MemoryStream[(Long, Int, Long, Long)]
    val both = in.toDS().toDF("key", "side", "row_id", "ts_us")
    val out = IntervalStream.attach(
      both.filter(col("side") === 0).select("key", "row_id", "ts_us"),
      both.filter(col("side") === 1).select("key", "row_id", "ts_us"),
      windowUs = WindowUs,
      retireUs = 3650L * 86400000000L) // history replay: no mid-replay GC
    val query = out.toDF().writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append()).start()
    try {
      var lo = Long.MinValue
      cuts.foreach { hi =>
        val chunk = rows.filter(r => r._3 >= lo && r._3 < hi)
        in.addData(chunk.map(r => (r._1, 0, r._2, r._3)).toSeq ++
          chunk.map(r => (r._1, 1, r._2, r._3)).toSeq)
        query.processAllAvailable()
        lo = hi
      }
      spark.table(name).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).toSet
    } finally query.stop()
  }

  /** The native batch operator's pairs on the same frame (event_id carried
    * through both sides so pairs are identity-comparable). */
  private def batchPairs(ev: DataFrame): Set[(Long, Long, Long)] = {
    val bucketNs = WindowUs * 1000L
    graft.plans.IntervalJoin.joinWithin(
        ev.select(col("user_id").as("u"), col("event_id").as("ida"),
          col("ts").as("ts_a")),
        ev.select(col("user_id").as("u2"), col("event_id").as("idb"),
          col("ts").as("ts_b")),
        "u", "u2", "ts_a", "ts_b", bucketNs)
      .select(col("u"), col("ida"), col("idb"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
  }

  private def parityAt(sfDir: String, tag: String,
      userCap: Option[Long] = None): Unit = {
    var ev = graft.queries.Tables.events(spark, sf(sfDir))
    userCap.foreach(c => ev = ev.filter(col("user_id") < c))
    val b = batchPairs(ev)
    val s = streamPairs(ev, s"interval_parity_$tag")
    assert(s == b,
      s"$tag: stream ${s.size} pairs vs batch ${b.size}; " +
        s"missing=${(b -- s).take(3)} extra=${(s -- b).take(3)}")
    assert(b.nonEmpty, s"$tag: vacuous parity (no pairs)")
  }

  test("streaming interval pairing reproduces the native batch operator " +
      "on the real events table at sf0.001") {
    parityAt("sf0.001", "sf0001")
  }

  test("parity holds at sf0.01 (full table)") {
    parityAt("sf0.01", "sf001")
  }

  test("parity holds at sf0.1 (first 400 users — bounds the memory-sink " +
      "pair volume, same operator path)") {
    parityAt("sf0.1", "sf01", userCap = Some(400L))
  }

  // Note on eviction: unlike AsOfStream (whose feature profile must
  // OUTLIVE the window), an interval buffer's correctness horizon IS the
  // window — any left a retired key held was already beyond every live
  // right's reach, so retirement can never change output, only state
  // size. This test pins the output-visible contract (strict lower bound,
  // inclusive W upper bound, no stale pairs after a long silence); the
  // timeout path itself is the same GroupStateTimeout.EventTimeTimeout
  // machinery the AsOfStream eviction test drives end-to-end.
  test("strict inequality and window bound: no equal-time pairs, no pair " +
      "beyond W, no pair across a retirement-length silence") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val hourUs = 3600000000L
    val t0 = 100L * hourUs // well past the initial 0 watermark
    val in = MemoryStream[(Long, Int, Long, Long)]
    val both = in.toDS().toDF("key", "side", "row_id", "ts_us")
    val out = IntervalStream.attach(
      both.filter(col("side") === 0).select("key", "row_id", "ts_us"),
      both.filter(col("side") === 1).select("key", "row_id", "ts_us"),
      windowUs = WindowUs) // default 6h retirement horizon
    val query = out.toDF().writeStream.format("memory")
      .queryName("interval_evict").outputMode(OutputMode.Append()).start()
    try {
      // b1, key 1: left at t0; rights at t0 (equal time — no pair),
      // t0+W (boundary — pairs), t0+W+1 (beyond — no pair)
      in.addData((1L, 0, 10L, t0), (1L, 1, 20L, t0),
        (1L, 1, 21L, t0 + WindowUs), (1L, 1, 22L, t0 + WindowUs + 1))
      query.processAllAvailable()
      // b2: key 2 advances the watermark past key 1's 6h horizon
      in.addData((2L, 0, 30L, t0 + 8 * hourUs))
      query.processAllAvailable()
      // b3: key 1 returns — its buffered left is retired, no pair; a
      // fresh left+right pair still works
      in.addData((1L, 1, 23L, t0 + 9 * hourUs),
        (1L, 0, 11L, t0 + 9 * hourUs), (1L, 1, 24L, t0 + 9 * hourUs + 60000000L))
      query.processAllAvailable()
      val got = spark.table("interval_evict").collect()
        .map(r => (r.getLong(1), r.getLong(3))).toSet
      assert(got == Set((10L, 21L), (11L, 24L)), got.toString)
    } finally query.stop()
  }
}
