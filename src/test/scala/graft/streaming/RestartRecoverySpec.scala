package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkTestBase

/** Checkpoint-restart recovery — the production streaming property the
  * per-operator specs don't pin (round-7 VERDICT #4): stop a stateful query
  * mid-stream, restart FROM THE CHECKPOINT, feed the remainder, and require
  * (a) output parity with the uninterrupted run and (b) that pre-restart
  * state actually drove post-restart results — a session opened before the
  * stop closes correctly after it, a fingerprint seen before the stop
  * suppresses its post-restart duplicate, a view buffered before the stop
  * matches a click that only arrives after it.
  *
  * One test per state-shape family in the streaming tier:
  * flatMapGroupsWithState (sessionizer), dropDuplicatesWithinWatermark
  * (ingest dedup), stream-stream join (attribution). The sink is the
  * PARQUET file sink — the memory sink refuses checkpoint recovery by
  * design (not fault-tolerant), while the file sink's manifest gives
  * exactly-once output across restarts, so reading the directory back
  * yields the run's complete appended output with no phase bookkeeping.
  * Each phase stops only after `processAllAvailable()` (offsets committed),
  * so recovery resumes at a batch boundary — the graceful-restart contract;
  * crash-replay idempotence at a CUSTOM sink is ExactlyOnceSinkSpec's
  * property, not this one.
  */
class RestartRecoverySpec extends SparkTestBase {

  private val h = 3600000000000L // 1 hour in ns
  private val b = 1704067200000000000L // 2024-01-01 in ns (clear of the
                                       // initial watermark at epoch 0)

  /** Drive `stream` through the file sink over `batches`, restarting the
    * query from the shared checkpoint between every batch when `restart`
    * (one query consumes everything otherwise), and return the appended
    * rows as strings (order-free). */
  private def drive[A](
      name: String,
      stream: DataFrame,
      feed: Seq[() => Unit],
      restart: Boolean): Set[String] = {
    val dir = Files.createTempDirectory(s"graft_rr_$name").toString
    val (ckpt, out) = (s"$dir/ckpt", s"$dir/out")
    def start() = stream.writeStream
      .format("parquet").option("path", out)
      .option("checkpointLocation", ckpt)
      .outputMode(OutputMode.Append())
      .start()
    if (restart) {
      feed.foreach { add =>
        val q = start()
        try { add(); q.processAllAvailable() } finally q.stop()
      }
    } else {
      val q = start()
      try feed.foreach { add => add(); q.processAllAvailable() }
      finally q.stop()
    }
    spark.read.parquet(out).collect().map(_.toString).toSet
  }

  test("flatMapGroupsWithState sessionizer survives checkpoint restart") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def run(tag: String, restart: Boolean): Set[String] = {
      val input = MemoryStream[(Long, Long, Double)]
      val stream = SessionizeStream.attach(
        input.toDS().toDF("ts", "user_id", "value")).toDF()
      // user 1's FIRST session is still open at each stop (2 events, 60 s
      // apart; a third 2 min in must EXTEND the recovered session); a
      // 3 h-later event closes it by gap, and user 2's session closes only
      // via the recovered event-time TIMER when the sentinel advances the
      // watermark
      val feed: Seq[() => Unit] = Seq(
        () => input.addData((b, 1L, 1.0), (b + 60000000000L, 1L, 2.0)),
        () => input.addData((b + h, 2L, 8.0)),
        () => input.addData((b + 120000000000L, 1L, 4.0)),
        () => input.addData((b + 3 * h, 1L, 16.0)),
        () => input.addData((b + 10 * h, 99L, 0.0))) // watermark sentinel
      drive(s"sess_$tag", stream, feed, restart)
    }
    val restarted = run("restart", restart = true)
    val bus = b / 1000
    // state-survival: the user-1 session spans two restarts — 3 events,
    // sum 7.0, ending at b+2min
    assert(restarted.contains(s"[1,$bus,${bus + 120000000L},3,7.0]"),
      s"recovered session missing or wrong: $restarted")
    val uninterrupted = run("straight", restart = false)
    assert(restarted == uninterrupted)
  }

  test("dropDuplicatesWithinWatermark dedup survives checkpoint restart") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val minNs = 60000000000L
    def run(tag: String, restart: Boolean): Set[String] = {
      val input = MemoryStream[(Long, Long, String)]
      val stream = DedupStream.dedupByFingerprint(
        input.toDS().toDF("ts", "doc_id", "text"), "10 minutes")
      // doc 1's fingerprint enters state before the stop; doc 4 replays the
      // SAME text after the restart, within the horizon — the recovered
      // fingerprint state must suppress it
      val feed: Seq[() => Unit] = Seq(
        () => input.addData((b + 1 * minNs, 1L, "hello world"),
          (b + 2 * minNs, 2L, "another doc")),
        () => input.addData((b + 3 * minNs, 4L, "HELLO   world"),
          (b + 4 * minNs, 5L, "brand new doc")),
        () => input.addData((b + 60 * minNs, 99L, "watermark pusher")))
      drive(s"dedup_$tag", stream, feed, restart)
    }
    val restarted = run("restart", restart = true)
    val keptIds = restarted.map(_.split(",")(1).toLong)
    assert(keptIds.contains(1L) && !keptIds.contains(4L),
      s"cross-restart duplicate not suppressed: $restarted")
    assert(keptIds.contains(2L) && keptIds.contains(5L))
    val uninterrupted = run("straight", restart = false)
    assert(restarted == uninterrupted)
  }

  test("stream-stream left-outer join survives checkpoint restart") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val minNs = 60000000000L
    def run(tag: String, restart: Boolean): Set[String] = {
      val views = MemoryStream[(Long, Long, Long)]
      val clicks = MemoryStream[(Long, Long, Long)]
      val stream = JoinStream.viewClickAttributionLeftOuter(
        views.toDS().toDF("ts", "user_id", "event_id"),
        clicks.toDS().toDF("ts", "user_id", "event_id"))
      // view 10 arrives before the stop; its matching click 20 only AFTER
      // the restart (5 min later, inside the 10-min window): the buffered
      // view must be recovered for the match to exist. view 11 never gets
      // a click — its NULL row must still be emitted when the final
      // sentinel advances both watermarks.
      val feed: Seq[() => Unit] = Seq(
        () => views.addData((b, 1L, 10L), (b + minNs, 2L, 11L)),
        () => clicks.addData((b + 5 * minNs, 1L, 20L)),
        () => {
          views.addData((b + 600 * minNs, 98L, 998L))
          clicks.addData((b + 600 * minNs, 99L, 999L))
        })
      drive(s"join_$tag", stream, feed, restart)
    }
    val restarted = run("restart", restart = true)
    assert(restarted.exists(_.startsWith("[1,10,20,")),
      s"cross-restart view-click match missing: $restarted")
    assert(restarted.exists(_.startsWith("[2,11,null,")),
      s"unmatched view's deferred NULL row missing: $restarted")
    val uninterrupted = run("straight", restart = false)
    assert(restarted == uninterrupted)
  }
}
