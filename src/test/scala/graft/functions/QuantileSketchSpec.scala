package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Quantifies [[QuantileSketch]]: exact below capacity, rank error bounded
  * in the approximate regime through Spark's real partial/merge machinery —
  * the local backing for q111's rows-only driver entry (same pattern as the
  * HLL error-bound test for q15).
  */
class QuantileSketchSpec extends SparkTestBase {
  import spark.implicits._

  private val probes = Seq(0.25, 0.5, 0.75, 0.9)

  /** deterministic pseudo-uniform stream, no RNG state */
  private def stream(n: Int): IndexedSeq[Double] =
    (0 until n).map(i => ((i * 2654435761L) % 1000003L).toDouble / 1000003.0)

  test("below capacity the sketch is exact") {
    val agg = new QuantileSketch.Quantiles(256, probes)
    val xs = stream(200)
    val sk = xs.foldLeft(agg.zero)(agg.reduce)
    val got = agg.finish(sk)
    val sorted = xs.sorted
    val want = probes.map(p =>
      sorted(math.max(1, math.ceil(p * xs.size).toInt) - 1))
    assert(got == want)
  }

  test("merge of exact sketches stays exact while combined size < k") {
    val agg = new QuantileSketch.Quantiles(256, probes)
    val xs = stream(200)
    val (a, b) = xs.splitAt(100)
    val sk = agg.merge(a.foldLeft(agg.zero)(agg.reduce),
      b.foldLeft(agg.zero)(agg.reduce))
    val sorted = xs.sorted
    val want = probes.map(p =>
      sorted(math.max(1, math.ceil(p * xs.size).toInt) - 1))
    assert(agg.finish(sk) == want)
  }

  test("distributed rank error stays within the sketch's worst-case bound") {
    val n = 50000
    val k = 128
    val xs = stream(n)
    val qs = new QuantileSketch.Quantiles(k, probes).toColumn
    val got = xs.toDF("x").repartition(32).as[Double]
      .groupByKey(_ => 0).mapValues(identity)
      .agg(qs.name("qq")).collect()(0)._2
    val sorted = xs.sorted
    // merge order across the 32 partitions varies run to run, so assert the
    // DERIVED worst-case bound, n*log2(n/k)/k (~6.7% of n here, rounded up
    // to 8% for the constant factors), not an empirical best-case — a
    // tighter constant would make this test flaky under unlucky task
    // completion orders (deterministic offset-0 compaction biases one way,
    // no random cancellation)
    val bound = math.ceil(n * (math.log(n.toDouble / k) / math.log(2)) / k * 1.2)
    probes.zip(got).foreach { case (p, est) =>
      val rank = sorted.count(_ <= est)
      assert(math.abs(rank - p * n) <= bound,
        s"probe $p: estimate $est has rank $rank, want ~${p * n} +- $bound")
    }
  }

  test("no weight is dropped: total sketch weight equals values observed") {
    // odd level sizes only arise through merge() concatenation; drive many
    // uneven merges and check Σ value·2^level == n exactly every time
    val k = 8
    val agg = new QuantileSketch.Quantiles(k, probes)
    def weight(s: QuantileSketch.Sketch): Long =
      s.levels.zipWithIndex.map { case (vs, i) => vs.size.toLong << i }.sum
    val xs = stream(5000)
    var merged = agg.zero
    var seen = 0L
    // chunk sizes 1,2,3,... keep hitting odd totals at every level
    var off = 0
    var step = 1
    while (off < xs.size) {
      val chunk = xs.slice(off, math.min(off + step, xs.size))
      val part = chunk.foldLeft(agg.zero)(agg.reduce)
      assert(weight(part) == chunk.size.toLong)
      merged = agg.merge(merged, part)
      seen += chunk.size
      assert(weight(merged) == seen,
        s"after merging $seen values the sketch weighs ${weight(merged)}")
      off += step
      step += 1
    }
  }

  test("memory stays bounded: every level holds fewer than k items") {
    val k = 64
    val agg = new QuantileSketch.Quantiles(k, probes)
    val sk = stream(20000).foldLeft(agg.zero)(agg.reduce)
    assert(sk.levels.forall(_.size < k))
    // log-many levels, not linear in n
    assert(sk.levels.size <= 16, s"levels = ${sk.levels.size}")
  }
}
