package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.queries.Events

/** Streaming SPRT monitor — the perpetual-ingest twin of the batch q318
  * sequential test: maintain, per experiment arm, the cumulative
  * (trials, conversions) walk and emit the refreshed log-likelihood
  * ratio + accept/continue decision after every micro-batch. This is
  * the release-gate shape at ingest time: the decision updates the
  * moment a day's trial results land, instead of on a batch recompute.
  *
  * Input rows are COMPLETED user-day trial outcomes — the production
  * feed an upstream day-close aggregation (the [[SessionizeStream]] /
  * watermark pattern) emits exactly once per (user, day); this operator
  * deliberately stays downstream of that contract, which is what keeps
  * its state O(1) PER ARM forever (two longs), with no per-user or
  * per-day key growth to collect. The LLR algebra reuses the batch
  * query's compile-time integer-snapped constants
  * ([[Events.SprtLa]]/[[Events.SprtLb]]/[[Events.SprtUp]]), so the
  * streamed walk is the SAME exact-int64 sum the batch computes —
  * `SprtStreamSpec` pins prefix-equality against q318 on the real
  * events table at every micro-batch boundary.
  *
  * Not oracle-checkable (DuckDB has no streams); spec-verified by
  * batch parity + the O(1)-state bound.
  */
object SprtStream {

  /** One completed user-day trial: arm + whether it converted. */
  final case class Trial(arm: String, conv: Long)

  final case class SprtState(nCum: Long, convCum: Long)

  /** One arm's walk position after a micro-batch. */
  final case class SprtSnap(arm: String, n_cum: Long, conv_cum: Long,
      llr: Double, decision: String)

  def llrLi(nCum: Long, convCum: Long): Long =
    convCum * Events.SprtLa + (nCum - convCum) * Events.SprtLb

  def decide(li: Long): String =
    if (li >= Events.SprtUp) "accept_h1"
    else if (li <= -Events.SprtUp) "accept_h0"
    else "continue"

  private def update(
      arm: String,
      rows: Iterator[Trial],
      state: GroupState[SprtState]): Iterator[SprtSnap] = {
    var st = state.getOption.getOrElse(SprtState(0L, 0L))
    rows.foreach { t =>
      st = SprtState(st.nCum + 1L, st.convCum + t.conv)
    }
    state.update(st)
    val li = llrLi(st.nCum, st.convCum)
    Iterator(SprtSnap(arm, st.nCum, st.convCum, li.toDouble / 1e6,
      decide(li)))
  }

  /** Stateful walk over a completed-trial stream. */
  def monitor(trials: Dataset[Trial]): Dataset[SprtSnap] = {
    import trials.sparkSession.implicits._
    trials
      .groupByKey(_.arm)
      .flatMapGroupsWithState[SprtState, SprtSnap](
        OutputMode.Update(), GroupStateTimeout.NoTimeout())(update)
  }
}
