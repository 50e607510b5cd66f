package graft.tools

import org.apache.spark.sql.SparkSession

import graft.ner.{Ner, SyntheticModel}

/** Dev tool: break q26's cost into stages (scan+decode, tokenize, full
  * inference) over the documents table, single-threaded per row on the
  * driver after a collect — NOT a distributed benchmark, just a per-doc
  * cost attribution to guide optimization.
  */
object ProfileNer {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val texts = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("text").collect().map(_.getString(0))
    println(s"docs: ${texts.length}")
    val loaded = SyntheticModel.loaded
    // warm-up
    texts.take(200).foreach(t => Ner.evalWith(Some(loaded), t, truncate = true))

    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"$name: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    time("tokenize only") {
      texts.foreach(t => graft.ner.WordPiece.tokenize(
        loaded.model.vocab, t, loaded.model.hparams.nMaxTokens))
    }
    time("full evalWith") {
      texts.foreach(t => Ner.evalWith(Some(loaded), t, truncate = true))
    }
    val toks = texts.map(t => graft.ner.WordPiece.tokenize(
      loaded.model.vocab, t, loaded.model.hparams.nMaxTokens))
    time("encoder.eval only") {
      toks.foreach(loaded.encoder.eval)
    }
    time("encoder.evalBatch(32)") {
      toks.grouped(32).foreach(g => loaded.encoder.evalBatch(g.toArray))
    }
    // Q4_0-native path on the quantized twin (round-7 VERDICT #3): same
    // docs, same batching, linears evaluated from raw ggml blocks
    val loadedQ4 = SyntheticModel.loadedQ4
    texts.take(200).foreach(t => Ner.evalWith(Some(loadedQ4), t, truncate = true))
    time("full evalWith (Q4_0-native)") {
      texts.foreach(t => Ner.evalWith(Some(loadedQ4), t, truncate = true))
    }
    time("encoder.evalBatch(32) (Q4_0-native)") {
      toks.grouped(32).foreach(g => loadedQ4.encoder.evalBatch(g.toArray))
    }
    // raw matmulT throughput at the model's FFN shape
    val in = 64; val out = 256; val reps = 200000
    val x = Array.fill(in)(0.1f); val wt = Array.fill(in * out)(0.01f)
    val bias = new Array[Float](out); val y = new Array[Float](out)
    for (k <- graft.ner.Kernels.all) {
      val t0 = System.nanoTime()
      var r = 0
      while (r < reps) { k.matmulT(x, 0, in, wt, 0, out, out, bias, y, 0); r += 1 }
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"${k.getClass.getSimpleName} matmulT($in x $out): " +
        f"${reps.toLong * in * out / sec / 1e9}%.2f GMAC/s")
    }
    // and the same shape through the Q4_0-native kernel
    val wq = graft.ner.ModelFormat.quantizeQ4(Array.fill(in * out)(0.01f))
    for (k <- graft.ner.Kernels.all) {
      val t0 = System.nanoTime()
      var r = 0
      while (r < reps) { k.matmulQ4(x, 0, in, wq, out, bias, y, 0); r += 1 }
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"${k.getClass.getSimpleName} matmulQ4($in x $out): " +
        f"${reps.toLong * in * out / sec / 1e9}%.2f GMAC/s")
    }
    spark.stop()
  }
}
