package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

import graft.ner.{Ner, SyntheticModel, WordPiece}

/** The weight-streaming measurement BASELINE.md's Q4/F16 story was
  * extrapolating (round-9 VERDICT #3): run the q26/q208/q205-style paired
  * F32/F16/Q4 readout against the BERT-BASE-GEOMETRY synthetic model
  * ([[SyntheticModel.loadedBase]], ~85 M encoder params, 28 MB of weights
  * per layer — never cache-resident), under Spark parallelism via the same
  * `Ner.evalPartition` batched path the queries use. On bert-tiny the
  * weights live in L2 and F32 wins on compute; at bert-base every matmul
  * streams weights from DRAM across all threads, which is where F16's 2x
  * and Q4's 7.1x byte reduction are supposed to pay. This tool measures
  * whether they actually do on this machine.
  *
  *   tools/bench.sh graft.tools.ProfileBase [sfDir] [nDocs] [cpus]
  *
  * Prints one JSON line per precision: wall seconds, docs/s, tokens/s.
  * Not part of the driver bench (a bert-base pass over the full documents
  * table would dominate the suite); numbers recorded in BASELINE.md r10.
  */
object ProfileBase {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val nDocs = args.lift(1).map(_.toInt).getOrElse(192)
    val cpus = args.lift(2).map(_.toInt)
      .getOrElse(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    // fixed deterministic panel, repartitioned so every core works
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
      .orderBy(col("doc_id")).limit(nDocs)
      .repartition(cpus)
      .as[(Long, String)]
      .persist()
    docs.count()

    // token mass for throughput normalization (same truncation as eval)
    val hp = SyntheticModel.BaseHparams
    val vocab = SyntheticModel.loadedBase.model.vocab
    val nTokens = docs.map { case (_, t) =>
      WordPiece.tokenize(vocab, t, hp.nMaxTokens).length.toLong
    }.reduce(_ + _)
    // ~85M MAC per token at base geometry: 12 layers x (4*768^2 + 2*768*3072)
    val macPerToken = hp.nLayer.toLong *
      (4L * hp.nEmbd * hp.nEmbd + 2L * hp.nEmbd * hp.nIntermediate)

    def run(name: String, pick: () => Ner.Loaded): Unit = {
      // resolve the model on the driver first so build time is excluded
      pick()
      // warm-up pass (JIT + per-executor scratch) then 2 timed passes
      def pass(): Double = {
        val t0 = System.nanoTime()
        val n = docs.mapPartitions { rows =>
          val loaded = Some(pick())
          Ner.evalPartition(loaded, rows, truncate = true)
            .map { case (_, ents) => ents.length.toLong }
        }.reduce(_ + _)
        require(n >= 0)
        (System.nanoTime() - t0) / 1e9
      }
      pass()
      val sec = (1 to 2).map(_ => pass()).min
      println(f"""{"model":"bert-base-geometry","precision":"$name","docs":$nDocs,"tokens":$nTokens,"sec":$sec%.2f,"docs_per_s":${nDocs / sec}%.2f,"gmac_per_s":${nTokens * macPerToken / sec / 1e9}%.1f}""")
    }

    run("f32", () => SyntheticModel.loadedBase)
    run("f16", () => SyntheticModel.loadedBaseF16)
    run("q4_0", () => SyntheticModel.loadedBaseQ4)
    spark.stop()
  }
}
