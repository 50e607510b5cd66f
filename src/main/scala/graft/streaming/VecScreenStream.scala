package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming EMBEDDING near-dup screen — the semantic-dedup twin of
  * [[NearDupStream]] (which screens text): as vectors stream in, each is
  * checked by cosine against the bounded set of references already seen in
  * its IVF cell, so ingest-time "have we semantically seen this before?"
  * costs `capacity` dot products instead of a corpus scan. This is the
  * streaming form of the batch q130 (SemDeDup: cluster first, compare only
  * within the cluster), with the cell assignment done by the same
  * codegen'd [[graft.functions.NearestCentroidExpression]] kernel the
  * batch IVF tier (q43/q84/q179/q180) runs.
  *
  * Shape: the static codebook joins the stream per micro-batch on a
  * column-derived equi key (stream-static broadcast, the EnrichStream
  * pattern — no collect, re-resolved per batch), each vector is assigned
  * its nearest and second-nearest cells, and a stateful operator KEYED BY
  * cell holds per-cell reference vectors. Per-cell state is doubly bounded
  * exactly like [[NearDupStream]]: `capacity` lowest-id references, and
  * watermark-horizon eviction of idle cells.
  *
  * Multi-probe (this round's q179/q129 lesson applied at ingest): a
  * vector near a cell BOUNDARY dups against a reference assigned to the
  * neighboring cell — a single-cell lookup misses it (q176 measured that
  * recall cost in batch). So each vector ALSO probes its second-nearest
  * cell, lookup-only: a probe row never inserts, never re-arms the cell's
  * timer, never mints state — state size and capacity bounds are
  * identical to a probe-less run, the probe pays only its `capacity`
  * extra dot products.
  */
object VecScreenStream {

  final case class VecRow(cid: Long, probe: Boolean, vec_id: Long,
      v: Seq[Double], ts_us: Long, event_time: java.sql.Timestamp)

  /** One screen report: best cosine among the references checked in this
    * cell (None if the cell was empty), `probe_dist` 0 = own cell,
    * 1 = second-nearest-cell probe (emitted only on a hit).
    */
  final case class VecHit(vec_id: Long, cid: Long, probe_dist: Int,
      n_checked: Int, best_ref: Option[Long], best_cos: Option[Double],
      saturated: Boolean)

  final case class CellState(refs: Seq[(Long, Seq[Double])], maxSeenUs: Long)

  private def cosine(a: Seq[Double], b: Seq[Double]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) {
      dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Assign each streaming vector its nearest and second-nearest cells
    * against the static codebook frame (`cid`, `cv` ARRAY<DOUBLE> — one
    * row per centroid). Second-nearest = the kernel re-run on the codebook
    * with the winner filtered out: two O(cells·dim) folds per row, no
    * row expansion, no window.
    */
  def assignFrame(vecs: DataFrame, codebook: DataFrame): DataFrame = {
    val cbRow = codebook
      .agg(array_sort(collect_list(struct(col("cid"), col("cv")))).as("cb"))
      .withColumn("jk", pmod(size(col("cb")), size(col("cb"))))
    val vd = vecs.withColumn("vd", transform(col("embedding"),
      x => x.cast("double")))
    val best = graft.functions.NearestCentroidExpression.nearest(
      col("vd"), col("cb"))
    val second = graft.functions.NearestCentroidExpression.nearest(
      col("vd"),
      filter(col("cb"), c => c.getField("cid") =!= col("best").getField("cid")))
    vd.withColumn("jk", pmod(col("vec_id"), lit(1)))
      .join(broadcast(cbRow), Seq("jk"))
      .withColumn("best", best)
      .withColumn("second", second)
      .select(col("vec_id"), expr("ts DIV 1000").as("ts_us"), col("vd"),
        posexplode(array(
          struct(col("best").getField("cid").as("cid"),
            lit(false).as("probe")),
          struct(col("second").getField("cid").as("cid"),
            lit(true).as("probe")))).as(Seq("pos", "p")))
      .select(col("p.cid").as("cid"), col("p.probe").as("probe"),
        col("vec_id"), col("vd").as("v"), col("ts_us"))
  }

  private def update(capacity: Int, horizonUs: Long, minCos: Double)(
      key: Long,
      rows: Iterator[VecRow],
      state: GroupState[CellState]): Iterator[VecHit] = {
    if (state.hasTimedOut) {
      state.remove()
      Iterator.empty
    } else {
      var refs = state.getOption.map(_.refs).getOrElse(Seq.empty)
      var maxUs = state.getOption.map(_.maxSeenUs).getOrElse(Long.MinValue)
      var inserted = false
      val hits = rows.toSeq.sortBy(r => (r.ts_us, r.vec_id, r.probe))
        .flatMap { r =>
          val scored = refs.iterator
            .filter(_._1 != r.vec_id)
            .map { case (id, rv) => (id, cosine(r.v, rv)) }
            .toSeq
          // deterministic best: highest cosine, lowest id on ties
          val bst = scored.sortBy { case (id, c) => (-c, id) }.headOption
          val hit = VecHit(r.vec_id, key, if (r.probe) 1 else 0,
            scored.size, bst.map(_._1),
            bst.map(t => math.rint(t._2 * 1e6) / 1e6),
            saturated = refs.size >= capacity)
          if (r.probe) {
            // lookup-only: emit only a qualifying hit, touch nothing
            if (bst.exists(_._2 >= minCos)) Some(hit) else None
          } else {
            maxUs = math.max(maxUs, r.ts_us)
            inserted = true
            val out =
              if (refs.exists(_._1 == r.vec_id)) None // exact re-arrival
              else {
                // keep the `capacity` lowest vec_ids — deterministic under
                // any arrival interleaving once saturated (NearDupStream's
                // bound, vectors alongside the ids)
                refs = ((r.vec_id, r.v) +: refs).sortBy(_._1).take(capacity)
                Some(hit)
              }
            out
          }
        }
      // probe-only visits leave state (and its timer) untouched; an
      // empty cell visited only by probes mints no state at all
      if (inserted) {
        state.update(CellState(refs, maxUs))
        state.setTimeoutTimestamp(math.max(maxUs / 1000 + horizonUs / 1000,
          state.getCurrentWatermarkMs() + 1))
      }
      hits.iterator
    }
  }

  /** Wire a raw streaming vector frame (`vec_id` long, `ts` long ns,
    * `embedding` array) into the screen against a static codebook
    * (`cid` long, `cv` ARRAY<DOUBLE>).
    *
    * @param minCos cosine at or above which a PROBE visit reports (own-cell
    *               visits always report their best, screen semantics)
    */
  def attach(vecs: DataFrame, codebook: DataFrame, horizon: String = "1 hour",
      capacity: Int = 64, minCos: Double = 0.9): Dataset[VecHit] = {
    val spark = vecs.sparkSession
    import spark.implicits._
    val horizonUs = org.apache.spark.sql.catalyst.util.IntervalUtils
      .stringToInterval(
        org.apache.spark.unsafe.types.UTF8String.fromString(horizon))
    require(horizonUs.months == 0,
      s"horizon must not contain month/year units (got '$horizon'): " +
        "state eviction needs a fixed-width duration")
    val hUs = horizonUs.days * 86400000000L + horizonUs.microseconds
    assignFrame(vecs, codebook)
      .withColumn("event_time", timestamp_micros(col("ts_us")))
      .withWatermark("event_time", horizon)
      .as[VecRow]
      .groupByKey(_.cid)
      .flatMapGroupsWithState[CellState, VecHit](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(
        update(capacity, hUs, minCos))
  }
}
