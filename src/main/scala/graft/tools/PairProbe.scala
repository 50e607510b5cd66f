package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: bisects the q205->q26 interaction by running NER pipeline
  * variants back-to-back in one local[32] session with direct timing. */
object PairProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val durs = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
          durs.add(e.taskInfo.duration)
      })
    import spark.implicits._
    import org.apache.spark.sql.functions._

    def nerQuery(which: String) = {
      graft.queries.Tables.parallelize(spark,
          spark.read.parquet(s"$sfDir/documents.parquet"))
        .select(col("doc_id"), col("text"))
        .as[(Long, String)]
        .mapPartitions { rows =>
          val loaded = Some(which match {
            case "q4" => graft.ner.SyntheticModel.loadedQ4
            case _ => graft.ner.SyntheticModel.loaded
          })
          graft.ner.Ner.evalPartition(loaded, rows, truncate = true).map {
            case (id, ents) => (id, ents.length)
          }
        }
        .toDF("doc_id", "n")
    }
    def time(name: String)(f: => Unit): Unit = {
      durs.clear()
      val t0 = System.nanoTime(); f
      val wall = (System.nanoTime() - t0) / 1e9
      import scala.jdk.CollectionConverters._
      val d = durs.asScala.toSeq.sorted
      val stats = if (d.isEmpty) "no tasks"
        else f"tasks=${d.size} med=${d(d.size / 2)}ms max=${d.last}ms sum=${d.sum}ms"
      println(f"[probe] $name: $wall%.2f s ($stats)")
    }
    // in-JVM sampler: every 20 ms, histogram the topmost graft/jdk frame
    // of each RUNNABLE executor thread
    val hist = new java.util.concurrent.ConcurrentHashMap[String, Integer]()
    @volatile var sampling = false
    val sampler = new Thread(() => {
      while (true) {
        if (sampling) {
          Thread.getAllStackTraces.forEach { (t, st) =>
            if (t.getName.contains("Executor task launch") &&
                t.getState == Thread.State.RUNNABLE && st.nonEmpty) {
              val top = st.take(6).map(f => f.getClassName + "." + f.getMethodName)
                .mkString(" < ")
              hist.merge(top, 1, (a, b) => a + b)
            }
          }
        }
        Thread.sleep(20)
      }
    })
    sampler.setDaemon(true); sampler.start()
    def dumpHist(): Unit = {
      import scala.jdk.CollectionConverters._
      hist.asScala.toSeq.sortBy(-_._2).take(8).foreach { case (k, n) =>
        println(s"[stack $n] $k")
      }
      hist.clear()
    }
    val mode = args.headOption.getOrElse("q4first")
    def runF32(tag: String) = {
      sampling = true
      time(s"f32 $tag")(
        nerQuery("f32").write.format("noop").mode("overwrite").save())
      sampling = false
      dumpHist()
    }
    def runQ4(tag: String) = time(s"q4 $tag")(
      nerQuery("q4").write.format("noop").mode("overwrite").save())
    mode match {
      case "f32only" => runF32("1"); runF32("2"); runF32("3")
      case "q4first" =>
        runQ4("1"); runF32("after-q4 1"); runF32("after-q4 2")
        runF32("after-q4 3")
      case "buildonly" =>
        // build the Q4 encoder on the DRIVER but never run it in tasks
        val _ = graft.ner.SyntheticModel.loadedQ4
        runF32("after-build 1"); runF32("after-build 2")
    }
    spark.stop()
  }
}
