package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{And, Expression}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

/** Predicate pushdown THROUGH the custom join nodes — the optimizer-rule
  * tier of the Catalyst extension stack (logical node + strategy + exec +
  * now a `Rule[LogicalPlan]`, injected by [[graft.GraftExtensions]] and the
  * nodes' own `install`).
  *
  * Why it exists: Catalyst's own `PushDownPredicates` only understands the
  * operators it knows. A `Filter` sitting above an [[AsOfJoin.AsOfJoinPlan]]
  * or [[IntervalJoin.IntervalJoinPlan]] is a black-box boundary, so
  * `df.filter` applied after the join strands the predicate ABOVE the join:
  * the scan reads and shuffles the full fact table, the merge pass joins it
  * all, and only then do rows drop. At 100 TB that is the difference between
  * shuffling a pruned slice and shuffling the corpus. This rule splits the
  * conjunction and moves every deterministic single-side predicate beneath
  * the custom node, where the built-in rules take over and carry it down to
  * the parquet scan (`PushedFilters` — pinned by `GraftPushdownSpec`).
  *
  * What may move:
  *   - as-of join: LEFT-only predicates (each left row yields exactly one
  *     output row, so filtering left before == filtering output after).
  *     Right-side predicates MUST stay: dropping right rows changes which
  *     row is "latest prior" (they select state, not output).
  *   - interval join: predicates on EITHER single side (a pure pair
  *     predicate join — dropping a row drops exactly its pairs).
  *   - predicates referencing both sides, the as-of output column, or
  *     anything nondeterministic stay above the join, preserving
  *     evaluation-count semantics.
  */
object GraftPushdown extends Rule[LogicalPlan] {

  private def conjuncts(cond: Expression): Seq[Expression] = cond match {
    case And(l, r) => conjuncts(l) ++ conjuncts(r)
    case e => Seq(e)
  }

  private def pushable(p: Expression, side: LogicalPlan): Boolean =
    p.deterministic && p.references.nonEmpty &&
      p.references.subsetOf(side.outputSet)

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, j: AsOfJoin.AsOfJoinPlan) =>
      val (push, keep) = conjuncts(cond).partition(pushable(_, j.left))
      if (push.isEmpty) f
      else {
        val pushed = j.copy(left = Filter(push.reduce(And), j.left))
        keep.reduceOption(And).map(Filter(_, pushed)).getOrElse(pushed)
      }
    case f @ Filter(cond, j: IntervalJoin.IntervalJoinPlan) =>
      val (leftPush, rest) = conjuncts(cond).partition(pushable(_, j.left))
      val (rightPush, keep) = rest.partition(pushable(_, j.right))
      if (leftPush.isEmpty && rightPush.isEmpty) f
      else {
        val nl = leftPush.reduceOption(And)
          .map(Filter(_, j.left): LogicalPlan).getOrElse(j.left)
        val nr = rightPush.reduceOption(And)
          .map(Filter(_, j.right): LogicalPlan).getOrElse(j.right)
        val pushed = j.copy(left = nl, right = nr)
        keep.reduceOption(And).map(Filter(_, pushed)).getOrElse(pushed)
      }
  }

  /** Register on the session (idempotent) — the `experimental` twin of
    * `GraftExtensions`' `injectOptimizerRule`, for sessions that call the
    * nodes' `install` instead of configuring the extension.
    */
  def install(spark: SparkSession): Unit = {
    val cur = spark.experimental.extraOptimizations
    if (!cur.contains(GraftPushdown)) {
      spark.experimental.extraOptimizations =
        cur :+ GraftPushdown :+ GraftPruning
    }
  }
}

/** Column pruning THROUGH the custom join nodes — [[GraftPushdown]]'s
  * projection twin. Catalyst's `ColumnPruning` likewise stops at operators
  * it doesn't know, so without this rule every column of both inputs rides
  * the join's hash exchange even when the consumer reads two of them — at
  * 100 TB that is an unread VARCHAR `props` column shuffled corpus-wide.
  *
  * Two prunes, both semantics-free:
  *   - as-of RIGHT side: the exec only ever evaluates `rightKey`,
  *     `rightTime`, `rightValue` against right rows (nothing else can
  *     escape — the output is `left.output :+ outAttr`), so the right
  *     child always narrows to those references.
  *   - as-of LEFT side under a `Project`: narrow the left child to the
  *     columns the projection reads plus the join's own key/time
  *     references, re-wrapping with the original projection (the node's
  *     `output` derives from `left.output`, so the outer Project keeps the
  *     shape contract).
  * The interval join needs no rule: its whole point is carrying both
  * sides' columns verbatim, and its inputs are user-projected frames.
  */
object GraftPruning extends Rule[LogicalPlan] {
  import org.apache.spark.sql.catalyst.expressions.AttributeSet
  import org.apache.spark.sql.catalyst.plans.logical.Project

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case p @ Project(projList, j: AsOfJoin.AsOfJoinPlan) =>
      val leftNeeded = AttributeSet(projList.flatMap(_.references)) ++
        j.leftKey.references ++ j.leftTime.references
      val newLeft =
        if (j.left.output.forall(leftNeeded.contains)) j.left
        else Project(j.left.output.filter(leftNeeded.contains), j.left)
      val nj = pruneRight(j.copy(left = newLeft))
      if (newLeft.eq(j.left) && nj.right.eq(j.right)) p
      else Project(projList, nj)
    case j: AsOfJoin.AsOfJoinPlan if {
      val needed = rightNeeded(j)
      !j.right.output.forall(needed.contains)
    } => pruneRight(j)
  }

  private def rightNeeded(j: AsOfJoin.AsOfJoinPlan): AttributeSet =
    j.rightKey.references ++ j.rightTime.references ++ j.rightValue.references

  private def pruneRight(j: AsOfJoin.AsOfJoinPlan): AsOfJoin.AsOfJoinPlan = {
    val needed = rightNeeded(j)
    if (j.right.output.forall(needed.contains)) j
    else j.copy(right = Project(j.right.output.filter(needed.contains),
      j.right))
  }
}
