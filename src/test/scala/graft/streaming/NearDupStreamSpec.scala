package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkTestBase

/** Pins [[NearDupStream]]: band collisions are detected across batches with
  * deterministic priors, exact re-arrivals are ignored, capacity saturation
  * keeps the lowest ids and says so, the watermark horizon evicts idle
  * buckets, and the band construction is the batch one (q36–q38's).
  */
class NearDupStreamSpec extends SparkTestBase {

  private val b = 1704067200000000000L // 2024-01-01 ns
  private val hourNs = 3600000000000L

  // long repeated text => plenty of shingles, stable signature
  private val textA = "the quick brown fox jumps over the lazy dog " * 4
  private val textB = "a completely different document about spark " * 4

  private def run(capacity: Int = 64)(
      feed: (MemoryStream[(Long, Long, String)],
        org.apache.spark.sql.streaming.StreamingQuery) => Unit)
      : Seq[NearDupStream.Hit] = {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(Long, Long, String)]
    val hits = NearDupStream.attach(
      input.toDS().toDF("doc_id", "ts", "text"), "1 hour", capacity)
    val name = s"neardup_${System.nanoTime()}"
    val query = hits.writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append()).start()
    try {
      feed(input, query)
      spark.table(name).as[NearDupStream.Hit].collect().toSeq
    } finally query.stop()
  }

  test("month-bearing horizon is rejected, not silently truncated to zero") {
    // months have no fixed microsecond width: the old conversion dropped
    // them entirely, so a "1 month" horizon evicted buckets the moment the
    // watermark passed while withWatermark honored the month (round-5
    // ADVICE). The attach must fail fast instead.
    import spark.implicits._
    val docs = Seq((1L, b, textA)).toDF("doc_id", "ts", "text")
    val e = intercept[IllegalArgumentException] {
      NearDupStream.attach(docs, horizon = "1 month")
    }
    assert(e.getMessage.contains("month"))
    // day-grain horizons still convert exactly
    NearDupStream.attach(docs, horizon = "2 days 3 hours")
  }

  test("near-dup collisions detected across batches, exact priors and min_ref") {
    val out = run() { (input, query) =>
      // batch 1: two identical docs (1, 2) and one distinct (10)
      input.addData((1L, b, textA), (2L, b + 1000000000L, textA),
        (10L, b, textB))
      query.processAllAvailable()
      // batch 2: doc 3 near-dups A; doc 11 re-arrives as doc 10's exact text
      input.addData((3L, b + 2000000000L, textA),
        (11L, b + 2000000000L, textB))
      query.processAllAvailable()
    }
    val byDoc = out.groupBy(_.doc_id)
    // doc 1 seeded both its buckets
    assert(byDoc(1L).forall(h => h.n_prior == 0 && h.min_ref.isEmpty))
    // doc 2 collided with doc 1 in both bands
    assert(byDoc(2L).size == 2)
    assert(byDoc(2L).forall(h => h.n_prior == 1 && h.min_ref.contains(1L)))
    // doc 3 (next batch) sees both refs, earliest = 1
    assert(byDoc(3L).size == 2)
    assert(byDoc(3L).forall(h => h.n_prior == 2 && h.min_ref.contains(1L)))
    // doc 11 collides with 10 only
    assert(byDoc(11L).forall(h => h.n_prior == 1 && h.min_ref.contains(10L)))
    assert(out.forall(!_.saturated))
  }

  test("same doc_id re-arrival is ignored, not a self-collision") {
    val out = run() { (input, query) =>
      input.addData((1L, b, textA))
      query.processAllAvailable()
      input.addData((1L, b + 1000000000L, textA))
      query.processAllAvailable()
    }
    // only the first arrival emitted (2 bands), nothing for the re-arrival
    assert(out.size == 2)
    assert(out.forall(h => h.doc_id == 1L && h.n_prior == 0))
  }

  test("capacity bound saturates honestly and keeps the lowest ids") {
    val out = run(capacity = 1) { (input, query) =>
      input.addData((5L, b, textA))
      query.processAllAvailable()
      input.addData((2L, b + 1000000000L, textA))
      query.processAllAvailable()
      input.addData((7L, b + 2000000000L, textA))
      query.processAllAvailable()
    }
    val byDoc = out.groupBy(_.doc_id)
    assert(byDoc(2L).forall(h =>
      h.n_prior == 1 && h.min_ref.contains(5L) && h.saturated))
    // bucket kept min(5, 2) = 2 after saturation
    assert(byDoc(7L).forall(h =>
      h.n_prior == 1 && h.min_ref.contains(2L) && h.saturated))
  }

  test("watermark horizon evicts idle buckets (timer-driven)") {
    val out = run() { (input, query) =>
      input.addData((1L, b, textA))
      query.processAllAvailable()
      // push the watermark far past b + 1h(horizon) + 1h(delay): the textA
      // bucket's timer becomes due
      input.addData((50L, b + 10 * hourNs, textB))
      query.processAllAvailable()
      // timers fire on the NEXT trigger after the watermark advance — and
      // only for keys with no new data, so the eviction batch must not
      // carry textA itself
      input.addData((51L, b + 10 * hourNs + 1000000000L, textB))
      query.processAllAvailable()
      // textA returns after eviction: no prior refs remembered
      input.addData((60L, b + 10 * hourNs + 2000000000L, textA))
      query.processAllAvailable()
    }
    val byDoc = out.groupBy(_.doc_id)
    assert(byDoc(60L).forall(h => h.n_prior == 0 && h.min_ref.isEmpty))
  }

  // ---- multi-probe SimHash tier ----

  /** Two texts whose 16-bit SimHash fingerprints differ in EXACTLY one bit,
    * found deterministically over a fixed candidate pool (the pool is large
    * enough that some pair is at distance 1 in a 16-bit space; `require`
    * fails loudly if the expression ever changes enough to break that).
    */
  private lazy val (textH0, textH1): (String, String) = {
    val cands = (0 until 250).map(i =>
      s"document variant number $i about streaming near duplicates " * 3)
    val fps = cands.map(t => graft.functions.SimHashExpression.compute(
      org.apache.spark.unsafe.types.UTF8String.fromString(t)))
    val pair = (for {
      i <- cands.indices.iterator
      j <- (i + 1 until cands.size).iterator
      if Integer.bitCount(fps(i) ^ fps(j)) == 1
    } yield (cands(i), cands(j))).buffered
    require(pair.hasNext, "no hamming-1 fingerprint pair in candidate pool")
    pair.head
  }

  private def runSim(capacity: Int = 64)(
      feed: (MemoryStream[(Long, Long, String)],
        org.apache.spark.sql.streaming.StreamingQuery) => Unit)
      : Seq[NearDupStream.SimHit] = {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(Long, Long, String)]
    val hits = NearDupStream.attachSimHash(
      input.toDS().toDF("doc_id", "ts", "text"), "1 hour", capacity)
    val name = s"simdup_${System.nanoTime()}"
    val query = hits.writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append()).start()
    try {
      feed(input, query)
      spark.table(name).as[NearDupStream.SimHit].collect().toSeq
    } finally query.stop()
  }

  test("simhash tier: a hamming-1 variant is caught by the bit-flip probe") {
    val out = runSim() { (input, query) =>
      input.addData((1L, b, textH0))
      query.processAllAvailable()
      // doc 2's fingerprint differs from doc 1's in exactly one bit: an
      // exact-key lookup misses, the flipped-bit probe must not
      input.addData((2L, b + 1000000000L, textH1))
      query.processAllAvailable()
      // doc 3 is doc 1's exact twin: caught at probe_dist 0
      input.addData((3L, b + 2000000000L, textH0))
      query.processAllAvailable()
    }
    val byDoc = out.groupBy(_.doc_id)
    assert(byDoc(1L).forall(h => h.probe_dist == 0 && h.n_prior == 0))
    val probeHits = byDoc(2L).filter(_.probe_dist == 1)
    assert(probeHits.size == 1)
    assert(probeHits.forall(h => h.n_prior == 1 && h.min_ref.contains(1L)))
    // doc 2's own insert seeded its (distinct) bucket
    assert(byDoc(2L).filter(_.probe_dist == 0)
      .forall(h => h.n_prior == 0 && h.min_ref.isEmpty))
    // the exact twin reports distance 0 against doc 1's bucket — and ALSO
    // probe-hits doc 2's neighboring bucket
    assert(byDoc(3L).exists(h =>
      h.probe_dist == 0 && h.n_prior == 1 && h.min_ref.contains(1L)))
    assert(byDoc(3L).exists(h =>
      h.probe_dist == 1 && h.min_ref.contains(2L)))
  }

  test("simhash tier: probes are lookup-only — no state created or " +
    "mutated, capacity bound unchanged") {
    val out = runSim(capacity = 1) { (input, query) =>
      // doc 2 arrives FIRST: its 16 probes visit doc 1's future bucket
      // (among others) while empty — if a probe minted state, doc 1's
      // insert below would see a phantom prior
      input.addData((2L, b, textH1))
      query.processAllAvailable()
      input.addData((1L, b + 1000000000L, textH0))
      query.processAllAvailable()
      // saturate doc 1's bucket at capacity 1 with an exact twin, then a
      // hamming-1 arrival: the probe must report the bucket as-is
      // (saturated, lowest id kept) and must not evict or extend it
      input.addData((5L, b + 2000000000L, textH0))
      query.processAllAvailable()
      input.addData((9L, b + 3000000000L, textH1))
      query.processAllAvailable()
    }
    val byDoc = out.groupBy(_.doc_id)
    // doc 2's probes found nothing (no emission), its insert seeded cleanly
    assert(byDoc(2L).size == 1)
    assert(byDoc(2L).forall(h => h.probe_dist == 0 && h.n_prior == 0))
    // doc 1's insert: n_prior 0 proves doc 2's earlier probe created no
    // state under doc 1's fingerprint; its probe finds doc 2
    assert(byDoc(1L).exists(h => h.probe_dist == 0 && h.n_prior == 0))
    assert(byDoc(1L).exists(h =>
      h.probe_dist == 1 && h.n_prior == 1 && h.min_ref.contains(2L)))
    // doc 5 saturates doc 1's bucket (capacity 1, lowest id 1 kept)
    assert(byDoc(5L).exists(h =>
      h.probe_dist == 0 && h.n_prior == 1 && h.saturated &&
        h.min_ref.contains(1L)))
    // doc 9's probe sees the saturated bucket exactly as the inserts left
    // it: capacity bound untouched by the probing path
    assert(byDoc(9L).exists(h =>
      h.probe_dist == 1 && h.n_prior == 1 && h.saturated &&
        h.min_ref.contains(1L)))
  }

  test("band derivation is the batch construction (stream/batch parity)") {
    import spark.implicits._
    // the SAME documents through bandFrame (batch) vs the streamed screen:
    // per-bucket first-arrival counts must agree
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
      .limit(50)
      .withColumn("ts", org.apache.spark.sql.functions.lit(b))
    val batchBands = NearDupStream.bandFrame(docs)
      .select("band_pos", "bkey", "doc_id").as[(Int, String, Long)]
      .collect().toSeq
    val expectHits = batchBands.groupBy(t => (t._1, t._2)).values
      .flatMap { rows =>
        rows.map(_._3).sorted.zipWithIndex.map { case (id, i) =>
          (id, rows.head._1, i) // (doc, band, n_prior) with ts ties → id order
        }
      }.toSeq.sorted
    val rows = docs.select("doc_id", "ts", "text")
      .as[(Long, Long, String)].collect().toSeq
    val out = run() { (input, query) =>
      input.addData(rows)
      query.processAllAvailable()
    }
    val gotHits = out.map(h => (h.doc_id, h.band_pos, h.n_prior)).sorted
    assert(gotHits == expectHits)
  }
}
