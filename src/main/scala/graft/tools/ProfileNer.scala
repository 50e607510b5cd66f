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
    spark.stop()
  }
}
