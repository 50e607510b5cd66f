package graft.tools

/** Dev tool: measures the F32 encoder before/after the Q4 encoder runs in
  * the same JVM — single-threaded and across a 32-thread pool — isolating
  * the cross-path interaction seen between q205 and q26. */
object Q4Interaction {
  def main(args: Array[String]): Unit = {
    val f32 = graft.ner.SyntheticModel.loaded
    val q4 = graft.ner.SyntheticModel.loadedQ4
    val docs = Array.tabulate(64)(i => Array.tabulate(100)(j => 3 + (i + j) % 30))
    def time(name: String, n: Int)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); (1 to n).foreach(_ => f)
      println(f"$name: ${(System.nanoTime() - t0) / 1e6 / n}%.2f ms/iter")
    }
    def timePool(name: String, iters: Int)(f: => Unit): Unit = {
      val pool = java.util.concurrent.Executors.newFixedThreadPool(32)
      val t0 = System.nanoTime()
      val futs = (1 to 32).map(_ => pool.submit(new Runnable {
        def run(): Unit = (1 to iters).foreach(_ => f)
      }))
      futs.foreach(_.get())
      println(f"$name (32 threads x $iters): " +
        f"${(System.nanoTime() - t0) / 1e6 / iters}%.2f ms/round")
      pool.shutdown()
    }
    time("warmup f32", 50)(f32.encoder.evalBatch(docs))
    timePool("f32 pool BEFORE q4", 20)(f32.encoder.evalBatch(docs))
    timePool("q4 pool", 20)(q4.encoder.evalBatch(docs))
    timePool("f32 pool AFTER q4", 20)(f32.encoder.evalBatch(docs))
    timePool("q4 pool again", 20)(q4.encoder.evalBatch(docs))
    timePool("f32 pool again", 20)(f32.encoder.evalBatch(docs))
  }
}
