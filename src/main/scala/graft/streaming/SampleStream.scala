package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming weighted sampling without replacement — the perpetual-ingest
  * twin of q219's Gumbel-top-k resampler: maintain, over an unbounded
  * document stream, the k-item importance-weighted sample of EVERYTHING
  * ingested so far, with O(k) state per shard forever.
  *
  * The sampling key is the same deterministic Gumbel construction as the
  * batch query (`log w − ln(−ln u)`, `u` = the q138 md5-of-id uniform), so
  * the maintained sample is not merely "a" valid sample — it is EXACTLY the
  * batch Gumbel-top-k of the union of all batches seen, whatever the batch
  * boundaries ([[SampleStreamSpec]] pins stream == batch equality). Two
  * consequences a production ingest cares about:
  *   - at-least-once replay is a NO-OP: a re-delivered item regenerates an
  *     identical (id, key) entry and merges into the kept set by id, so
  *     the sample never skews toward replayed data; a re-delivery with an
  *     UPDATED weight resolves deterministically to the max-key version
  *     per id (commutative + idempotent, so delivery order cannot matter);
  *   - restart recovery is free: the checkpointed kept-set IS the sample.
  *
  * Sharding: items hash into `shards` groups before the stateful operator
  * (state distributes across the cluster; per-shard state stays k entries).
  * The global sample is the top-k of the union of shard snapshots — k·shards
  * rows, merged driver- or consumer-side via [[globalTopK]]. Each shard's
  * snapshot is emitted refreshed after every micro-batch (Update mode).
  *
  * Score ordering goes through [[graft.queries.Keys.scoreCompare]] (the
  * catalog-wide total-order rule: NaN-safe, signed-zero-collapsed) with id
  * as the tie-break.
  */
object SampleStream {

  final case class Item(shard: Int, id: Long, logWeight: Double)
  final case class Kept(id: Long, key: Double)
  final case class ShardSample(shard: Int, kept: Seq[Kept])
  final case class SampleState(kept: Seq[Kept])

  /** Deterministic Gumbel key — the Scala twin of q219's column expression
    * (md5 of the decimal id string, first 8 hex digits as a 32-bit uniform).
    */
  def gumbelKey(id: Long, logWeight: Double): Double = {
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest(id.toString.getBytes("UTF-8"))
    val hv = ((h(0) & 0xffL) << 24) | ((h(1) & 0xffL) << 16) |
      ((h(2) & 0xffL) << 8) | (h(3) & 0xffL)
    val u = (hv + 0.5) / 4294967296.0
    logWeight - math.log(-math.log(u))
  }

  /** Descending key, ascending id — the deterministic sample order. */
  val keptOrdering: Ordering[Kept] = new Ordering[Kept] {
    def compare(a: Kept, b: Kept): Int = {
      val c = -graft.queries.Keys.scoreCompare(a.key, b.key)
      if (c != 0) c else java.lang.Long.compare(a.id, b.id)
    }
  }

  private def update(k: Int)(
      shard: Int,
      items: Iterator[Item],
      state: GroupState[SampleState]): Iterator[ShardSample] = {
    val prev = state.getOption.map(_.kept).getOrElse(Seq.empty)
    // dedup by id, keeping the BEST entry per id (max key under the total
    // order): an exact replay regenerates an identical entry (no-op), and a
    // re-delivery with an UPDATED weight resolves to the max-key version —
    // a commutative, idempotent merge, so the maintained sample is
    // independent of delivery order and replay count either way.
    val kept = (prev.iterator ++
        items.map(it => Kept(it.id, gumbelKey(it.id, it.logWeight))))
      .toSeq.groupBy(_.id).valuesIterator.map(_.min(keptOrdering))
      .toSeq
      .sorted(keptOrdering)
      .take(k)
    state.update(SampleState(kept))
    Iterator(ShardSample(shard, kept))
  }

  /** Stateful per-shard Gumbel top-k over a pre-sharded item stream. */
  def sample(items: Dataset[Item], k: Int = 16): Dataset[ShardSample] = {
    import items.sparkSession.implicits._
    items
      .groupByKey(_.shard)
      .flatMapGroupsWithState[SampleState, ShardSample](
        OutputMode.Update(), GroupStateTimeout.NoTimeout())(update(k))
  }

  /** Wire a raw streaming frame (`doc_id`, `log_weight`): shard by id hash,
    * sample k per shard.
    */
  def attach(docs: DataFrame, shards: Int = 16, k: Int = 16): Dataset[ShardSample] = {
    import docs.sparkSession.implicits._
    docs
      .selectExpr(s"pmod(hash(doc_id), $shards) AS shard",
        "doc_id AS id", "log_weight AS logWeight")
      .as[Item]
      .transform(sample(_, k))
  }

  /** Consumer-side merge: the global k-sample from the latest shard
    * snapshots (k·shards rows in, k out).
    */
  def globalTopK(snapshots: Seq[ShardSample], k: Int): Seq[Kept] =
    snapshots.flatMap(_.kept)
      .groupBy(_.id).valuesIterator.map(_.min(keptOrdering))
      .toSeq.sorted(keptOrdering).take(k)
}
