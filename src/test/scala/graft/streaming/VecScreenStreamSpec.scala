package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkTestBase

/** Pins [[VecScreenStream]]: own-cell semantic near-dups are caught across
  * batches with deterministic best-match reports, a cell-BOUNDARY vector is
  * caught by the second-nearest-cell probe (the q176-measured miss a
  * single-cell lookup would make), probes are lookup-only (no state minted
  * or mutated, capacity bound unchanged), and the capacity bound keeps the
  * lowest ids and says so.
  */
class VecScreenStreamSpec extends SparkTestBase {

  private val b = 1704067200000000000L // 2024-01-01 ns
  private def sec(n: Long) = b + n * 1000000000L

  // two unit centroids; cell 0 looks along x, cell 1 along y
  private def codebook: DataFrame = {
    import spark.implicits._
    Seq((0L, Seq(1.0, 0.0, 0.0, 0.0)), (1L, Seq(0.0, 1.0, 0.0, 0.0)))
      .toDF("cid", "cv")
  }

  private val vecA = Seq(1.0, 0.1, 0.0, 0.0)   // cell 0
  private val vecB = Seq(0.98, 0.12, 0.0, 0.0) // cell 0, ~vecA
  private val vecR = Seq(0.75, 0.66, 0.0, 0.0) // cell 0, near the boundary
  private val vecQ = Seq(0.66, 0.75, 0.0, 0.0) // cell 1, cos(R, Q) ~ 0.992

  private def run(capacity: Int = 64)(
      feed: (MemoryStream[(Long, Long, Seq[Double])],
        org.apache.spark.sql.streaming.StreamingQuery) => Unit)
      : Seq[VecScreenStream.VecHit] = {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(Long, Long, Seq[Double])]
    val hits = VecScreenStream.attach(
      input.toDS().toDF("vec_id", "ts", "embedding"), codebook,
      "1 hour", capacity, minCos = 0.9)
    val name = s"vecscreen_${System.nanoTime()}"
    val query = hits.writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append()).start()
    try {
      feed(input, query)
      spark.table(name).as[VecScreenStream.VecHit].collect().toSeq
    } finally query.stop()
  }

  test("own-cell semantic near-dup caught across batches") {
    val out = run() { (input, query) =>
      input.addData((1L, sec(0), vecA))
      query.processAllAvailable()
      input.addData((2L, sec(1), vecB))
      query.processAllAvailable()
    }
    val byVec = out.groupBy(_.vec_id)
    // vec 1 seeded cell 0: own-cell report with nothing to check
    assert(byVec(1L).exists(h =>
      h.probe_dist == 0 && h.cid == 0L && h.n_checked == 0 &&
        h.best_ref.isEmpty))
    // vec 2 checked exactly vec 1 and found it
    val h2 = byVec(2L).filter(_.probe_dist == 0)
    assert(h2.size == 1)
    assert(h2.head.n_checked == 1 && h2.head.best_ref.contains(1L))
    assert(h2.head.best_cos.exists(_ > 0.99))
    // neither vector's second-cell probe found anything (cell 1 empty)
    assert(out.forall(h => h.probe_dist == 0))
  }

  test("boundary vector caught by the second-nearest-cell probe, " +
    "probes are lookup-only") {
    val out = run() { (input, query) =>
      input.addData((10L, sec(0), vecR)) // cell 0
      query.processAllAvailable()
      input.addData((11L, sec(1), vecQ)) // cell 1 + probe into cell 0
      query.processAllAvailable()
      // vec 12 ~ vecR arrives in cell 0: its report proves vec 11's probe
      // inserted NOTHING there (n_checked must still be 1, only vec 10)
      input.addData((12L, sec(2), vecR.map(_ * 1.01)))
      query.processAllAvailable()
    }
    val byVec = out.groupBy(_.vec_id)
    // the probe hit: vec 11 found vec 10 across the cell boundary
    val probeHits = byVec(11L).filter(_.probe_dist == 1)
    assert(probeHits.size == 1)
    assert(probeHits.head.cid == 0L &&
      probeHits.head.best_ref.contains(10L) &&
      probeHits.head.best_cos.exists(_ >= 0.99))
    // vec 11's own cell (1) was empty
    assert(byVec(11L).exists(h => h.probe_dist == 0 && h.n_checked == 0))
    // vec 12 sees ONLY vec 10 in cell 0 — the probe minted no state
    val h12 = byVec(12L).filter(_.probe_dist == 0)
    assert(h12.size == 1)
    assert(h12.head.n_checked == 1 && h12.head.best_ref.contains(10L))
  }

  test("property: best/second cell assignment equals a plain 2-NN over " +
    "the codebook on random vectors") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    import spark.implicits._
    val dim = 4
    val genVec: Gen[Seq[Double]] =
      Gen.listOfN(dim, Gen.chooseNum(-1.0, 1.0)).map(_.toSeq)
    val prop = Prop.forAll(
      Gen.listOfN(4, genVec), Gen.nonEmptyListOf(genVec).map(_.take(6))) {
      (cents, vecs) =>
        val cb = cents.zipWithIndex.map { case (c, i) => (i.toLong, c) }
        def d2(a: Seq[Double], b: Seq[Double]): Double =
          a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
        val rows = vecs.zipWithIndex.map { case (v, i) => (i.toLong, 0L, v) }
        val got = VecScreenStream.assignFrame(
            rows.toDF("vec_id", "ts", "embedding"),
            cb.toDF("cid", "cv"))
          .select("vec_id", "cid", "probe").collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
          .groupBy(_._1)
        vecs.zipWithIndex.forall { case (v, i) =>
          // reference 2-NN: sort by (d2, cid) — the kernel's tie order
          val ranked = cb.map { case (cid, c) => (d2(v, c), cid) }.sorted
          val mine = got(i.toLong)
          mine.exists(t => !t._3 && t._2 == ranked.head._2) &&
            mine.exists(t => t._3 && t._2 == ranked(1)._2)
        }
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(10), prop)
    assert(res.passed, s"assignFrame 2-NN property: ${res.status}")
  }

  test("capacity bound keeps the lowest ids and reports saturation") {
    val out = run(capacity = 1) { (input, query) =>
      input.addData((5L, sec(0), vecA))
      query.processAllAvailable()
      input.addData((2L, sec(1), vecB))
      query.processAllAvailable()
      input.addData((7L, sec(2), vecA))
      query.processAllAvailable()
    }
    val byVec = out.groupBy(_.vec_id)
    assert(byVec(2L).exists(h =>
      h.probe_dist == 0 && h.n_checked == 1 && h.best_ref.contains(5L) &&
        h.saturated))
    // cell kept min(5, 2) = 2 after saturation
    assert(byVec(7L).exists(h =>
      h.probe_dist == 0 && h.n_checked == 1 && h.best_ref.contains(2L) &&
        h.saturated))
  }
}
