package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Ascending, Attribute, AttributeReference, BindReferences, Expression,
  GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{
  ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Native AS-OF join — the whole-operator Catalyst extension tier (SURVEY §7
  * "custom vs built-in" option (c)): a logical node, a planner strategy, and
  * a physical operator registered through `spark.experimental.extraStrategies`
  * (and `GraftExtensions`).
  *
  * Semantics: for every left row, attach the `value` of the right row with
  * the same key and the LARGEST time strictly BEFORE the left row's time
  * (NULL if none) — the "latest prior quote/view/state" lookup. Stock Spark
  * expresses this as a window over a unioned stream (q51) or an exploded
  * range join; this operator is the direct form: both sides hash-partitioned
  * on the key and sorted by (key, time) — requirements DECLARED to Catalyst,
  * which plans the exchanges/sorts and elides them when a child is already
  * partitioned right (same machinery SortMergeJoin rides) — then a single
  * forward merge pass per partition. O(1) state per partition, no row
  * expansion, no window buffering: the at-scale join strategy for temporal
  * enrichment.
  *
  * Preconditions (documented, asserted by the driver query's oracle): key
  * and time expressions are non-null BIGINTs on both sides.
  */
object AsOfJoin {

  /** Logical node. `outAttr` is the appended result column; `toleranceUs`
    * bounds match staleness (None = unbounded lookback).
    */
  final case class AsOfJoinPlan(
      left: LogicalPlan, right: LogicalPlan,
      leftKey: Expression, rightKey: Expression,
      leftTime: Expression, rightTime: Expression,
      rightValue: Expression, outAttr: AttributeReference,
      toleranceUs: Option[Long])
      extends BinaryNode {
    override def output: Seq[Attribute] = left.output :+ outAttr
    // outAttr originates HERE, not from a child — without this,
    // CheckAnalysis reports it "missing from input"
    override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
      org.apache.spark.sql.catalyst.expressions.AttributeSet(outAttr)
    override protected def withNewChildrenInternal(
        newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
      copy(left = newLeft, right = newRight)
  }

  /** Planner strategy: logical AsOfJoinPlan → physical AsOfJoinExec. */
  object Strategy extends SparkStrategy {
    override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
      case j: AsOfJoinPlan =>
        AsOfJoinExec(j.leftKey, j.rightKey, j.leftTime, j.rightTime,
          j.rightValue, j.outAttr, j.toleranceUs,
          planLater(j.left), planLater(j.right)) :: Nil
      case _ => Nil
    }
  }

  /** Physical operator. Declares per-child hash distribution on the key and
    * (key, time) sort order — EnsureRequirements inserts (or elides)
    * co-partitioned exchanges and sorts exactly as for a shuffled join —
    * then merges each co-partition pair in one forward pass.
    */
  final case class AsOfJoinExec(
      leftKey: Expression, rightKey: Expression,
      leftTime: Expression, rightTime: Expression,
      rightValue: Expression, outAttr: AttributeReference,
      toleranceUs: Option[Long],
      left: SparkPlan, right: SparkPlan)
      extends BinaryExecNode {

    override def output: Seq[Attribute] = left.output :+ outAttr
    override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
      org.apache.spark.sql.catalyst.expressions.AttributeSet(outAttr)
    override def outputPartitioning: Partitioning = left.outputPartitioning

    override def requiredChildDistribution: Seq[Distribution] =
      ClusteredDistribution(Seq(leftKey)) ::
        ClusteredDistribution(Seq(rightKey)) :: Nil

    // the right side additionally sorts on the VALUE: the merge pass keeps
    // the last row it consumed per (key, time <= t), so without a tie-break
    // two right rows at the same (key, time) would yield whichever happened
    // to sort last (round-5 ADVICE). Value-ascending makes the winner the
    // greatest value among tied times — deterministic under any schedule.
    override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
      Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
      Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending),
        SortOrder(rightValue, Ascending)))

    override protected def withNewChildrenInternal(
        newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
      copy(left = newLeft, right = newRight)

    override protected def doExecute(): RDD[InternalRow] = {
      val lOut = left.output
      val rOut = right.output
      val outAttrs = output
      val lk = leftKey
      val lt = leftTime
      val rk = rightKey
      val rt = rightTime
      val rv = rightValue
      left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
        val lKeyEval = BindReferences.bindReference(lk, lOut)
        val lTimeEval = BindReferences.bindReference(lt, lOut)
        val rKeyEval = BindReferences.bindReference(rk, rOut)
        val rTimeEval = BindReferences.bindReference(rt, rOut)
        val rValEval = BindReferences.bindReference(rv, rOut)
        val project = UnsafeProjection.create(outAttrs, lOut :+ outAttr)
        val joined = new JoinedRow
        val valRow = new GenericInternalRow(1)

        // one-row lookahead; ONLY the buffered right row needs a copy (left
        // rows are consumed within their iteration)
        var rRow: InternalRow = if (rIter.hasNext) rIter.next().copy() else null
        var curKey = 0L
        var hasKey = false
        var lastVal: Any = null
        var lastTime = 0L
        var hasVal = false
        val tol = toleranceUs

        lIter.map { l =>
          val key = lKeyEval.eval(l).asInstanceOf[Long]
          val time = lTimeEval.eval(l).asInstanceOf[Long]
          var rKeyV = 0L
          while (rRow != null && {
            rKeyV = rKeyEval.eval(rRow).asInstanceOf[Long]
            rKeyV < key ||
              (rKeyV == key &&
                rTimeEval.eval(rRow).asInstanceOf[Long] < time)
          }) {
            if (!hasKey || rKeyV != curKey) {
              curKey = rKeyV; hasKey = true; hasVal = false
            }
            lastVal = rValEval.eval(rRow)
            lastTime = rTimeEval.eval(rRow).asInstanceOf[Long]
            hasVal = true
            rRow = if (rIter.hasNext) rIter.next().copy() else null
          }
          val matched = hasKey && curKey == key && hasVal &&
            tol.forall(t => time - lastTime <= t)
          valRow.update(0, if (matched) lastVal else null)
          project(joined(l, valRow))
        }
      }
    }
  }

  /** Register the strategy + pushdown rule on the session (idempotent). */
  def install(spark: SparkSession): Unit = {
    val cur = spark.experimental.extraStrategies
    if (!cur.contains(Strategy))
      spark.experimental.extraStrategies = cur :+ Strategy
    GraftPushdown.install(spark)
  }

  /** The user API: as-of join `left` to `right` by column NAMES (resolved
    * against each side), appending `right`'s `valueCol` at the latest
    * strictly-prior `timeCol` as `as`. `toleranceUs` excludes matches
    * staler than the bound (the "no quotes older than X" production knob);
    * None = unbounded lookback.
    */
  def joinPrior(
      left: DataFrame, right: DataFrame,
      keyCol: String, timeCol: String, valueCol: String,
      as: String, toleranceUs: Option[Long] = None): DataFrame = {
    val spark = left.sparkSession
    install(spark)
    def resolve(plan: LogicalPlan, name: String): Attribute =
      plan.output.find(_.name == name)
        .getOrElse(throw new IllegalArgumentException(
          s"column $name not found in ${plan.output}"))
    val lPlan = left.queryExecution.analyzed
    // re-alias the right side with FRESH exprIds: an as-of self-join (both
    // sides derived from one DataFrame) otherwise carries duplicate ids,
    // and the analyzer's DeduplicateRelations rewrites the child without
    // rewriting this custom node's key/time/value expressions
    val rPlan = org.apache.spark.sql.catalyst.plans.logical.Project(
      right.queryExecution.analyzed.output.map(a =>
        org.apache.spark.sql.catalyst.expressions.Alias(a, a.name)()),
      right.queryExecution.analyzed)
    val valExpr = resolve(rPlan, valueCol)
    val outAttr =
      AttributeReference(as, valExpr.dataType, nullable = true)()
    org.apache.spark.sql.GraftShims.ofRows(spark,
      AsOfJoinPlan(
        lPlan, rPlan,
        resolve(lPlan, keyCol), resolve(rPlan, keyCol),
        resolve(lPlan, timeCol), resolve(rPlan, timeCol),
        valExpr, outAttr, toleranceUs))
  }
}
