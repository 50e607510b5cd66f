package graft.tools

import java.util.concurrent.atomic.AtomicLong

import scala.collection.concurrent.TrieMap

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Dev tool: per-STAGE time breakdown for one or more catalog queries —
  * the "empirical approach" of the optimization loop (guide §1.1): find
  * the slowest stage, see whether its time is compute, shuffle read or
  * scheduling, then optimize that one thing.
  *
  * For each named query, runs it twice through the noop sink (first run
  * pays codegen; the second run's stages are reported) and prints, per
  * stage of the second run: wall seconds (submission → completion),
  * summed executor run/CPU seconds, shuffle read/write MB, task count,
  * and the stage name (which carries the RDD callsite — enough to map
  * back to the operator).
  *
  * Usage: runMain graft.tools.QueryProfile <sfDir> <queryName>...
  */
object QueryProfile {

  private final case class StageRec(
      name: String, wallMs: Long, runMs: Long, cpuMs: Long,
      srMb: Double, swMb: Double, tasks: Int)

  private val stages = TrieMap.empty[Int, StageRec]
  private val nJobs = new AtomicLong
  private val jobWallMs = new AtomicLong
  private val jobStarts = TrieMap.empty[Int, Long]

  private final class StageListener extends SparkListener {
    override def onJobStart(e: SparkListenerJobStart): Unit = {
      jobStarts.put(e.jobId, e.time)
      nJobs.incrementAndGet()
    }
    override def onJobEnd(e: SparkListenerJobEnd): Unit =
      jobStarts.remove(e.jobId).foreach(t0 => jobWallMs.addAndGet(e.time - t0))
    override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
      val si = e.stageInfo
      val m = si.taskMetrics
      val wall = (for {
        s <- si.submissionTime; c <- si.completionTime
      } yield c - s).getOrElse(-1L)
      stages.put(si.stageId, StageRec(
        si.name.linesIterator.next(),
        wall,
        m.executorRunTime,
        m.executorCpuTime / 1000000L,
        m.shuffleReadMetrics.totalBytesRead / 1048576.0,
        m.shuffleWriteMetrics.bytesWritten / 1048576.0,
        si.numTasks))
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = args.drop(1)
    require(names.nonEmpty, "usage: QueryProfile <sfDir> <queryName>...")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.sparkContext.addSparkListener(new StageListener)

    names.foreach { name =>
      val fn = SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query $name"))
      def pass(): Double = {
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        val sec = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
        sec
      }
      val warm = pass()
      Thread.sleep(500) // let first-pass stage events drain
      stages.clear(); nJobs.set(0); jobWallMs.set(0)
      val sec = pass()
      Thread.sleep(1000) // let second-pass stage events drain
      val recs = stages.readOnlySnapshot().toSeq.sortBy(-_._2.wallMs)
      println(f"\n===== $name: warm=$warm%.2f s measured=$sec%.2f s " +
        f"jobs=${nJobs.get} jobWall=${jobWallMs.get / 1000.0}%.2f s " +
        f"stages=${recs.size} totalStageWall=${recs.map(_._2.wallMs).sum / 1000.0}%.2f s =====")
      println("stageId  wall_s   run_s   cpu_s  sr_MB  sw_MB tasks  name")
      recs.take(30).foreach { case (id, r) =>
        println(f"$id%7d ${r.wallMs / 1000.0}%7.2f ${r.runMs / 1000.0}%7.2f " +
          f"${r.cpuMs / 1000.0}%7.2f ${r.srMb}%6.1f ${r.swMb}%6.1f ${r.tasks}%5d  ${r.name.take(110)}")
      }
    }
    spark.stop()
  }
}
