package graft.ner

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions.udf
import org.apache.spark.sql.graft.GraftSqlShim

/** One row of the `ner()` result list:
  * `ARRAY<STRUCT<entity: STRING, label: STRING>>`
  * (reference type construction: `src/ner_extension.cpp:191-195`).
  */
final case class NerEntity(entity: String, label: String)

/** The `ner` / `ner_extract` scalar function family on Spark.
  *
  * Observable semantics replicated from the reference extension:
  *
  *   - both names, both arities (`ner(text)`, `ner(text, truncate)`)
  *     registered under one function name (`src/ner_extension.cpp:197-213`);
  *   - model configured via session conf `spark.ner.model_path`
  *     (`SET spark.ner.model_path = '...'`), default unset — the analogue of
  *     the `ner_model_path` extension option (`src/ner_extension.cpp:215-217`).
  *     The reference loads eagerly in the SET callback; Spark confs have no
  *     callbacks, so we check-and-load lazily at first evaluation per
  *     executor. Observable behavior is identical: a bad / unset path silently
  *     yields `[]` for every row (`test/sql/ner.test:38-51`);
  *   - with no model, even NULL input maps to `[]`
  *     (`src/ner_extension.cpp:68-76`); with a model, NULL maps to NULL
  *     (`:100-103`);
  *   - `truncate = false` with an input that fills the token budget throws
  *     with the reference's exact message (`src/ner_extension.cpp:112-115`);
  *   - functions are non-deterministic-marked so Catalyst never constant-folds
  *     a call on a literal — the analogue of `FunctionStability::VOLATILE`
  *     (`src/ner_extension.cpp:201-203`).
  *
  * Scale notes: the model is loaded once per executor JVM and cached keyed by
  * the configured path (the reference equivalently holds one process-global
  * model, `src/ner_extension.cpp:16-22`, but without a lock; ours
  * synchronizes). Inference is row-parallel across Spark tasks — each task
  * runs the single-threaded encoder, replacing the reference's 4 ggml threads
  * per call with inter-row parallelism, which is the right trade at cluster
  * scale (no oversubscription, linear scaling with cores).
  */
object Ner {
  val ConfKey = "spark.ner.model_path"

  final case class Loaded(model: NerModel, encoder: BertEncoder)

  /** Per-JVM model cache keyed by the conf path currently in effect.
    * Immutable snapshot behind a @volatile: the steady-state read path is a
    * single volatile load + key compare — no monitor — so concurrent NER
    * tasks never serialize through a lock per row (the reference holds one
    * unlocked process-global, `src/ner_extension.cpp:16-22`; we keep its
    * throughput without its race). The lock is only taken on key change.
    */
  private final case class CacheState(key: Option[String], value: Option[Loaded])
  @volatile private var cache: CacheState = null
  private val cacheLock = new Object

  private[graft] def currentModel(): Option[Loaded] = {
    val path = GraftSqlShim.confString(ConfKey)
    val snap = cache
    if (snap != null && snap.key == path) snap.value
    else cacheLock.synchronized {
      val again = cache
      if (again != null && again.key == path) again.value
      else {
        val loaded = path.flatMap { p =>
          ModelFormat.loadFile(p).map(m => Loaded(m, new BertEncoder(m)))
        }
        cache = CacheState(path, loaded)
        loaded
      }
    }
  }

  /** Test hook: drop the cached model so a changed conf value re-loads. */
  private[graft] def resetCache(): Unit = cacheLock.synchronized {
    cache = null
  }

  /** Full per-row evaluation: tokenize -> truncate guard -> encoder ->
    * argmax -> BIO merge. Mirrors the reference row loop
    * (`src/ner_extension.cpp:99-167`).
    */
  private[graft] def evalRow(text: String, truncate: Boolean): Array[NerEntity] =
    evalWith(currentModel(), text, truncate)

  private[graft] def evalWith(model: Option[Loaded], text: String,
      truncate: Boolean): Array[NerEntity] =
    model match {
      case None =>
        // no-model branch: every row, including NULL, gets an empty list
        Array.empty[NerEntity]
      case Some(Loaded(model, encoder)) =>
        if (text == null) null
        else {
          val hp = model.hparams
          val tokens = WordPiece.tokenize(model.vocab, text, hp.nMaxTokens)
          if (!truncate && tokens.length >= hp.nMaxTokens)
            throw new IllegalArgumentException(
              "Input string exceeds model token limit and truncate=false")
          entitiesOf(model, tokens, encoder.eval(tokens))
        }
    }

  /** Entity extraction from already-computed logits — the shared tail of
    * [[evalWith]] and [[evalBatchWith]] (argmax -> label collapse -> BIO
    * merge, `src/ner_extension.cpp:117-167`).
    */
  private def entitiesOf(model: NerModel, tokens: Array[Int],
      logits: Array[Float]): Array[NerEntity] = {
    val nLabels = model.hparams.nLabels
    val labels = new Array[Int](tokens.length)
    var t = 0
    while (t < tokens.length) {
      labels(t) = BioMerge.argmax(logits, t * nLabels, nLabels)
      t += 1
    }
    val tokenStrs = tokens.map(model.vocab.tokenOf)
    BioMerge.merge(
      scala.collection.immutable.ArraySeq.unsafeWrapArray(tokenStrs),
      scala.collection.immutable.ArraySeq.unsafeWrapArray(labels))
      .map(e => NerEntity(e.entity, e.label)).toArray
  }

  /** Token budget per encoder batch. Batching trades activation-cache
    * residency for weight-cache amortization, so the right size depends on
    * the model (profiled on the synthetic model, ProfileNer): when a
    * layer's weight panels fit in L2 (bert-tiny class), weights never
    * leave cache and big batches only evict the activations — per-document
    * batches win. When weights are L2-resident-impossible (bert-base
    * class, ~7 MB/layer), streaming them once per multi-document batch is
    * the win, bounded so scratch stays ~16 MB/thread.
    */
  private[graft] def batchTokenBudget(hp: NerHparams): Int = {
    val layerWeightBytes =
      4L * (4L * hp.nEmbd * hp.nEmbd + 2L * hp.nEmbd * hp.nIntermediate)
    if (layerWeightBytes <= (1L << 20)) hp.nMaxTokens
    else {
      val perTokenFloats = hp.nIntermediate + 8 * hp.nEmbd
      math.max(hp.nMaxTokens, (4 << 20) / math.max(perTokenFloats, 1))
    }
  }

  /** Batched partition evaluation: tokenizes each row, packs rows into
    * token-budgeted batches, and runs the encoder once per batch
    * ([[BertEncoder.evalBatch]] — one matmul stream per batch instead of
    * per document). Null/no-model semantics and the truncate guard are
    * per-row, identical to [[evalWith]]; results stream lazily so a long
    * partition never materializes beyond one batch of logits.
    */
  private[graft] def evalPartition[A](model: Option[Loaded],
      rows: Iterator[(A, String)], truncate: Boolean)
      : Iterator[(A, Array[NerEntity])] =
    model match {
      case None => rows.map { case (a, _) => (a, Array.empty[NerEntity]) }
      case Some(Loaded(m, encoder)) =>
        val hp = m.hparams
        val budget = batchTokenBudget(hp)
        val tokenized = rows.map { case (a, text) =>
          if (text == null) (a, null: Array[Int])
          else {
            val tokens = WordPiece.tokenize(m.vocab, text, hp.nMaxTokens)
            if (!truncate && tokens.length >= hp.nMaxTokens)
              throw new IllegalArgumentException(
                "Input string exceeds model token limit and truncate=false")
            (a, tokens)
          }
        }
        // group by token budget, preserving order (nulls ride along free)
        val batches = new Iterator[Seq[(A, Array[Int])]] {
          private val it = tokenized.buffered
          def hasNext: Boolean = it.hasNext
          def next(): Seq[(A, Array[Int])] = {
            val buf = Seq.newBuilder[(A, Array[Int])]
            var used = 0
            var continue = true
            while (continue && it.hasNext) {
              val nTok = if (it.head._2 == null) 0 else it.head._2.length
              if (used > 0 && used + nTok > budget) continue = false
              else { buf += it.next(); used += nTok }
            }
            buf.result()
          }
        }
        batches.flatMap { batch =>
          val live = batch.collect { case (_, t) if t != null => t }.toArray
          val logits = encoder.evalBatch(live)
          var i = -1
          batch.map { case (a, tokens) =>
            if (tokens == null) (a, null: Array[NerEntity])
            else { i += 1; (a, entitiesOf(m, tokens, logits(i))) }
          }
        }
    }

  /** Executor-side holder for a broadcast model: the encoder is rebuilt at
    * most once per executor JVM from the broadcast bytes (transient lazy),
    * removing the path-based variant's every-node-has-the-file assumption —
    * the cluster analogue of the reference's in-memory loader
    * (`ner_load_from_memory`, `src/ner_model.cpp:300-304`).
    */
  private final class BroadcastHolder(
      bc: org.apache.spark.broadcast.Broadcast[Array[Byte]])
      extends Serializable {
    @transient lazy val loaded: Option[Loaded] =
      ModelFormat.loadBytes(bc.value).map(m => Loaded(m, new BertEncoder(m)))
  }

  /** Register `ner`/`ner_extract` bound to a model whose bytes are read once
    * on the driver and shipped to executors via `SparkContext.broadcast` —
    * no shared filesystem needed. An unreadable path keeps the reference's
    * silent no-model semantics (`[]` per row).
    */
  def registerBroadcast(spark: SparkSession, path: String): Unit = {
    val bytes =
      try java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path))
      catch { case _: Exception => Array.emptyByteArray }
    val holder = new BroadcastHolder(spark.sparkContext.broadcast(bytes))
    val u1 = udf((text: String) =>
      evalWith(holder.loaded, text, truncate = true)).asNondeterministic()
    val u2 = udf((text: String, tr: java.lang.Boolean) =>
      evalWith(holder.loaded, text, tr == null || tr.booleanValue()))
      .asNondeterministic()
    def builder(name: String)(children: Seq[Expression]): Expression =
      children match {
        case Seq(a) => GraftSqlShim.udfExpression(u1, Seq(a))
        case Seq(a, b) => GraftSqlShim.udfExpression(u2, Seq(a, b))
        case other =>
          throw new IllegalArgumentException(
            s"$name expects 1 or 2 arguments, got ${other.size}")
      }
    GraftSqlShim.registerBuilder(spark, "ner", builder("ner"))
    GraftSqlShim.registerBuilder(spark, "ner_extract", builder("ner_extract"))
  }

  /** 1-arg form: truncate defaults to true (`src/ner_extension.cpp:53`).
    *
    * Fidelity note: the reference reads the 2-arg `truncate` flag once per
    * 2048-row chunk from row 0 (`src/ner_extension.cpp:54-61`) — passing a
    * boolean *column* there applies row 0's value to the whole chunk. Our
    * UDF evaluates the flag per row, which is strictly more precise; with the
    * literal/constant arguments the reference's tests and docs use, behavior
    * is identical.
    */
  lazy val nerUdf1: UserDefinedFunction =
    udf((text: String) => evalRow(text, truncate = true)).asNondeterministic()

  /** 2-arg form; a NULL truncate argument keeps the default, as the
    * reference's row-0 validity check does (`src/ner_extension.cpp:58-60`).
    */
  lazy val nerUdf2: UserDefinedFunction =
    udf((text: String, tr: java.lang.Boolean) =>
      evalRow(text, tr == null || tr.booleanValue())).asNondeterministic()

  /** DataFrame-API entry points (native Catalyst expression — no encoder
    * round-trip; see [[NerExtractExpression]]).
    */
  def ner(text: Column): Column =
    GraftSqlShim.column(NerExtractExpression(
      GraftSqlShim.expression(text),
      org.apache.spark.sql.catalyst.expressions.Literal.TrueLiteral))
  def ner(text: Column, truncate: Column): Column =
    GraftSqlShim.column(NerExtractExpression(
      GraftSqlShim.expression(text), GraftSqlShim.expression(truncate)))

  /** Arity-dispatching builder shared by [[register]] and
    * `graft.GraftExtensions` — DuckDB `ScalarFunctionSet` overload semantics
    * (`src/ner_extension.cpp:197-204`) over one native expression.
    */
  def expressionBuilder(name: String)(children: Seq[Expression]): Expression =
    children match {
      case Seq(a) => NerExtractExpression(a,
        org.apache.spark.sql.catalyst.expressions.Literal.TrueLiteral)
      case Seq(a, b) => NerExtractExpression(a, b)
      case other =>
        throw new IllegalArgumentException(
          s"$name expects 1 or 2 arguments, got ${other.size}")
    }

  /** Register `ner` and `ner_extract` (exact alias, both arities) on the
    * session — the analogue of the extension's `LoadInternal`
    * (`src/ner_extension.cpp:188-218`).
    */
  def register(spark: SparkSession): Unit = {
    GraftSqlShim.registerBuilder(spark, "ner", expressionBuilder("ner"))
    GraftSqlShim.registerBuilder(spark, "ner_extract",
      expressionBuilder("ner_extract"))
  }
}
