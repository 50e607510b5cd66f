package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming heavy hitters — the perpetual-ingest twin of the batch
  * space-saving aggregation (q53 / [[graft.functions.HeavyHitters]]): track
  * the most frequent tokens of an unbounded document stream with BOUNDED
  * state, emitting each hash-group's refreshed top-k after every
  * micro-batch.
  *
  * Tokens are sharded into `groups` hash groups BEFORE the stateful
  * operator, so sketch state distributes across the cluster (one
  * space-saving counter table per group, capacity-capped) instead of
  * funneling the whole stream through one task — the same reason the batch
  * Aggregator runs as partial sketches merged at the end. Per-group state
  * is O(capacity) forever; a token displacing the minimum counter inherits
  * its count as the overestimation bound (standard space-saving), so
  * `count − err` is always a lower bound on the true frequency and any
  * token with true count > min-counter is guaranteed present — per-group,
  * and therefore globally for the sharded union, since each token lives in
  * exactly one group.
  *
  * Not oracle-checkable (DuckDB has no streams); `TopKStreamSpec` pins
  * exact-regime parity against the batch groupBy truth and the bounded
  * state + overestimation invariants in the eviction regime.
  */
object TopKStream {

  final case class Tok(group: Int, token: String)

  /** One counter of a group's snapshot: count overestimates the true
    * frequency by at most err.
    */
  final case class Counter(token: String, count: Long, err: Long)

  final case class GroupTopK(group: Int, counters: Seq[Counter])

  final case class SketchState(counters: Map[String, (Long, Long)])

  /** Space-saving update of one group's counter table. */
  private def update(capacity: Int, k: Int)(
      group: Int,
      toks: Iterator[Tok],
      state: GroupState[SketchState]): Iterator[GroupTopK] = {
    var m = state.getOption.map(_.counters).getOrElse(Map.empty[String, (Long, Long)])
    toks.foreach { t =>
      m.get(t.token) match {
        case Some((c, e)) => m = m.updated(t.token, (c + 1, e))
        case None if m.size < capacity => m = m.updated(t.token, (1L, 0L))
        case None =>
          // evict the minimum counter (token tie-break for determinism);
          // the newcomer inherits its count as the overestimation bound
          val (minTok, (minC, _)) =
            m.minBy { case (tk, (c, _)) => (c, tk) }
          m = (m - minTok).updated(t.token, (minC + 1, minC))
      }
    }
    state.update(SketchState(m))
    val top = m.toSeq
      .map { case (tk, (c, e)) => Counter(tk, c, e) }
      .sortBy(c => (-c.count, c.token))
      .take(k)
    Iterator(GroupTopK(group, top))
  }

  /** Stateful top-k over a pre-sharded token stream. */
  def topK(toks: Dataset[Tok], capacity: Int = 1024, k: Int = 5): Dataset[GroupTopK] = {
    import toks.sparkSession.implicits._
    toks
      .groupByKey(_.group)
      .flatMapGroupsWithState[SketchState, GroupTopK](
        OutputMode.Update(), GroupStateTimeout.NoTimeout())(update(capacity, k))
  }

  /** Wire a raw streaming document frame (`doc_id`, `text`): tokenize,
    * shard by token hash, sketch.
    */
  def attach(docs: DataFrame, groups: Int = 16, capacity: Int = 1024,
      k: Int = 5): Dataset[GroupTopK] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val toks = docs
      .select(explode(split(trim(col("text")), "\\s+")).as("token"))
      .filter(length(col("token")) > 0)
      .select(pmod(hash(col("token")), lit(groups)).cast("int").as("group"),
        col("token"))
      .as[Tok]
    topK(toks, capacity, k)
  }
}
