package graft.queries

import java.util.concurrent.atomic.AtomicBoolean

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** Scopes a query's persisted intermediates to its consuming action.
  *
  * Query bodies persist() subtrees that their returned plan references more
  * than once (signature tables, tf tables — the materialize-once stance).
  * Under Bench/Verify the harness clears caches between queries, but an
  * INTERACTIVE session that calls one catalog query has no such hook: the
  * blocks stayed pinned until session end (round-5 VERDICT #8).
  *
  * [[scopedTo]] registers a one-shot [[QueryExecutionListener]] that
  * unpersists the intermediates (and unregisters itself) after the next
  * completed action on the session — which, for the contract's
  * build-then-write usage, is the action that consumed the cache. Because
  * these are persist()s (lineage intact), an early release by an unrelated
  * interleaved action can only cost recomputation, never correctness; and
  * within the consuming action itself the cache is already materialized
  * block-by-block, so release-after-completion never races the run.
  *
  * localCheckpoint frames are deliberately NOT scoped: their lineage is
  * truncated, so unpersisting them would break a second action on the same
  * returned frame instead of merely slowing it.
  */
object Cached {

  def scopedTo(result: DataFrame, intermediates: DataFrame*): DataFrame = {
    val session = result.sparkSession
    val done = new AtomicBoolean(false)
    val frames = intermediates.toIndexedSeq
    object listener extends QueryExecutionListener {
      private def release(): Unit = if (done.compareAndSet(false, true)) {
        frames.foreach { f =>
          try f.unpersist(false) catch { case _: Throwable => () }
        }
        session.listenerManager.unregister(this)
      }
      override def onSuccess(funcName: String, qe: QueryExecution,
          durationNs: Long): Unit = release()
      override def onFailure(funcName: String, qe: QueryExecution,
          exception: Exception): Unit = release()
    }
    session.listenerManager.register(listener)
    result
  }
}
