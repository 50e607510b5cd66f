package graft.tools

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Dev tool: measure each catalog query's RUNTIME shuffle volume.
  *
  * Static plan snapshots overcount shuffles at runtime — AQE materializes
  * query stages and reuses identical exchanges, but the `explain` of an
  * `AdaptiveSparkPlan` prints the initial plan with zero `ReusedExchange`
  * nodes (e.g. the trained-PQ audits show 350 static Exchange nodes, most
  * of them the same tiny codebook frame re-derived per Lloyd step). What
  * scale actually cares about is BYTES MOVED: a task-metrics listener sums,
  * per query, the input bytes read from storage and the shuffle bytes
  * written, and reports their ratio — the shuffle AMPLIFICATION factor.
  *
  * Denominator: task-reported `inputMetrics.bytesRead` under-reports small
  * local scans (several sub-second queries read 60 MB of parquet but report
  * ~0), so the stable denominator is the DISTINCT source relations the
  * optimized plan references, sized by their file listings. Column pruning
  * means actual read bytes are smaller than file bytes, so the reported
  * amplification is a mild UNDER-estimate per truly-read byte — fine for
  * ranking and for flagging growth.
  *
  * Reading the number at 100 TB: amplification is the bytes that must cross
  * the network per source byte, so `source_bytes x amp` estimates cluster
  * shuffle traffic. amp < 1 means the plan reduces before it shuffles
  * (map-side combine, pre-shuffle projection/filter — the healthy shape);
  * amp > 1 means the pipeline re-shuffles derived data (exploded shingles,
  * n-gram frames, iterative refinement) and the multiplier — not the scan —
  * is what a cluster pays for. Queries whose WORK is join-shaped on derived
  * frames (dedup banding, PQ training) legitimately sit above 1; the audit
  * exists so every such ratio is a recorded, argued number instead of an
  * unread plan.
  *
  * Usage: runMain graft.tools.ShuffleAudit <sfDir> [queryName...]
  * Output: one TSV line per query (name, source MB, shuffle-write MB,
  * shuffle-read MB, amplification) on stdout; sorted summary at the end.
  */
object ShuffleAudit {

  private val inputBytes = new AtomicLong
  private val shuffleWrite = new AtomicLong
  private val shuffleRead = new AtomicLong

  private final class MetricsListener extends SparkListener {
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
      val m = t.taskMetrics
      if (m != null) {
        inputBytes.addAndGet(m.inputMetrics.bytesRead)
        shuffleWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        shuffleRead.addAndGet(m.shuffleReadMetrics.totalBytesRead)
      }
    }
  }

  /** Listener delivery is asynchronous; settle = poll until two reads 200 ms
    * apart agree (a dev-tool-grade barrier — no public waitUntilEmpty).
    * Bounded at 50 iterations (~10 s): background Spark activity ticking
    * task-end events must not hang the audit — a capped read may bleed a
    * few late counts into the next query, which is within this tool's
    * measurement grade.
    */
  private def settle(): (Long, Long, Long) = {
    var prev = (-1L, -1L, -1L)
    var cur = (inputBytes.get, shuffleWrite.get, shuffleRead.get)
    var iters = 0
    while (cur != prev && iters < 50) {
      prev = cur
      Thread.sleep(200)
      cur = (inputBytes.get, shuffleWrite.get, shuffleRead.get)
      iters += 1
    }
    cur
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args.drop(1).toSet
      else SparkEntry.queries.keySet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.sparkContext.addSparkListener(new MetricsListener)

    def mb(b: Long): Double = b / 1048576.0
    // distinct source relations referenced by the optimized plan, sized by
    // their file listings (self-joins re-read a path but reference ONE source)
    def sourceBytes(df: org.apache.spark.sql.DataFrame): Long = {
      import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
      df.queryExecution.optimizedPlan.collect {
        case lr: LogicalRelation => lr.relation match {
          case fs: HadoopFsRelation =>
            Some(fs.location.rootPaths.map(_.toString).mkString(",") ->
              fs.location.sizeInBytes)
          case _ => None
        }
      }.flatten.toMap.values.sum
    }
    val rows = Seq.newBuilder[(String, Double, Double, Double)]
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      if (names.contains(name)) {
        settle()
        inputBytes.set(0); shuffleWrite.set(0); shuffleRead.set(0)
        try {
          val df = fn(spark, sfDir)
          val src = sourceBytes(df)
          df.write.format("noop").mode("overwrite").save()
          val (_, sw, sr) = settle()
          val amp = if (src > 0) mb(sw) / mb(src) else Double.NaN
          rows += ((name, mb(src), mb(sw), amp))
          println(f"$name\t${mb(src)}%.2f\t${mb(sw)}%.2f\t${mb(sr)}%.2f\t$amp%.3f")
        } catch {
          case e: Throwable =>
            println(s"$name\tFAILED\t${e.getMessage}")
        } finally {
          spark.catalog.clearCache()
          spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
        }
      }
    }
    val done = rows.result()
    println("\n===== top shuffle amplification (shuffle-write MB / source MB) =====")
    done.filterNot(_._4.isNaN).sortBy(-_._4).take(25).foreach {
      case (n, in, sw, amp) => println(f"$amp%8.3f  src=$in%9.2f MB  shuf=$sw%9.2f MB  $n")
    }
    println("\n===== top absolute shuffle-write =====")
    done.sortBy(-_._3).take(25).foreach {
      case (n, in, sw, amp) => println(f"$sw%9.2f MB  src=$in%9.2f MB  amp=$amp%7.3f  $n")
    }
    spark.stop()
  }
}
