package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Ascending, Attribute, BindReferences, Expression, JoinedRow, SortOrder,
  UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{
  ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Native INTERVAL join — the second whole-operator Catalyst extension
  * (SURVEY §7 option (c), alongside [[AsOfJoin]]): all (left, right) pairs
  * with equal keys and `l.time < r.time <= l.time + window`. Stock Spark
  * either plans the raw inequality as a nested loop or needs the
  * bucket-explosion reformulation (q07: explode each left row into two
  * window buckets, equi-join, re-filter — 2x row expansion plus duplicate
  * candidate work). This operator is the direct form: both sides
  * hash-partitioned on the key and sorted by (key, time) — requirements
  * DECLARED to Catalyst, which plans/elides the exchanges exactly as for
  * SortMergeJoin — then one forward sweep per co-partition with a sliding
  * buffer of in-window right rows.
  *
  * State per partition is the maximum number of right rows inside any
  * single window — the event-density bound, the same quantity the
  * streaming interval join (JoinStream) retains per key — NOT the
  * partition size. Output order and content are deterministic (a set
  * join, no per-row argmax to tie-break).
  *
  * Preconditions: key and time expressions are non-null BIGINTs; `window`
  * is in the time expressions' own unit.
  */
object IntervalJoin {

  final case class IntervalJoinPlan(
      left: LogicalPlan, right: LogicalPlan,
      leftKey: Expression, rightKey: Expression,
      leftTime: Expression, rightTime: Expression,
      window: Long)
      extends BinaryNode {
    override def output: Seq[Attribute] = left.output ++ right.output
    override protected def withNewChildrenInternal(
        newLeft: LogicalPlan, newRight: LogicalPlan): IntervalJoinPlan =
      copy(left = newLeft, right = newRight)
  }

  object Strategy extends SparkStrategy {
    override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
      case j: IntervalJoinPlan =>
        IntervalJoinExec(j.leftKey, j.rightKey, j.leftTime, j.rightTime,
          j.window, planLater(j.left), planLater(j.right)) :: Nil
      case _ => Nil
    }
  }

  final case class IntervalJoinExec(
      leftKey: Expression, rightKey: Expression,
      leftTime: Expression, rightTime: Expression,
      window: Long,
      left: SparkPlan, right: SparkPlan)
      extends BinaryExecNode {

    override def output: Seq[Attribute] = left.output ++ right.output
    override def outputPartitioning: Partitioning = left.outputPartitioning

    override def requiredChildDistribution: Seq[Distribution] =
      ClusteredDistribution(Seq(leftKey)) ::
        ClusteredDistribution(Seq(rightKey)) :: Nil

    override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
      Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
      Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)))

    override protected def withNewChildrenInternal(
        newLeft: SparkPlan, newRight: SparkPlan): IntervalJoinExec =
      copy(left = newLeft, right = newRight)

    override protected def doExecute(): RDD[InternalRow] = {
      val lOut = left.output
      val rOut = right.output
      val outAttrs = output
      val lk = leftKey
      val lt = leftTime
      val rk = rightKey
      val rt = rightTime
      val w = window
      left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
        val lKeyEval = BindReferences.bindReference(lk, lOut)
        val lTimeEval = BindReferences.bindReference(lt, lOut)
        val rKeyEval = BindReferences.bindReference(rk, rOut)
        val rTimeEval = BindReferences.bindReference(rt, rOut)
        val project = UnsafeProjection.create(outAttrs, lOut ++ rOut)
        val joined = new JoinedRow

        // sliding buffer of right rows for the CURRENT left key whose
        // times may still fall in some future left row's window: bounded
        // by per-window event density, never by partition size. Right
        // rows are copied exactly once, on buffering (the lookahead row
        // included); left rows are never copied — each inner iterator is
        // exhausted before flatMap advances the left iterator.
        val buf = new java.util.ArrayDeque[InternalRow]()
        var bufKey = 0L
        var hasBufKey = false
        var rRow: InternalRow =
          if (rIter.hasNext) rIter.next().copy() else null

        lIter.flatMap { l =>
          val key = lKeyEval.eval(l).asInstanceOf[Long]
          val t = lTimeEval.eval(l).asInstanceOf[Long]
          if (!hasBufKey || bufKey != key) {
            buf.clear()
            bufKey = key
            hasBufKey = true
          }
          // advance the right side: discard keys already passed, buffer
          // same-key rows up to t + w, stop at the first row beyond
          var advance = true
          while (rRow != null && advance) {
            val rKeyV = rKeyEval.eval(rRow).asInstanceOf[Long]
            if (rKeyV < key) {
              rRow = if (rIter.hasNext) rIter.next().copy() else null
            } else if (rKeyV == key &&
                rTimeEval.eval(rRow).asInstanceOf[Long] <= t + w) {
              buf.addLast(rRow)
              rRow = if (rIter.hasNext) rIter.next().copy() else null
            } else {
              advance = false
            }
          }
          // evict rows at or before t: the lower bound is strict, and
          // left times ascend within the key, so they are dead for every
          // later left row too
          while (!buf.isEmpty &&
              rTimeEval.eval(buf.peekFirst()).asInstanceOf[Long] <= t) {
            buf.pollFirst()
          }
          // every remaining buffered row r satisfies t < r.time <= t + w:
          // the eviction handled the lower bound, and each row was
          // admitted at some l' <= l with r.time <= l'.time + w <= t + w
          val it = buf.iterator()
          new Iterator[InternalRow] {
            override def hasNext: Boolean = it.hasNext
            override def next(): InternalRow = project(joined(l, it.next()))
          }
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

  /** The user API: all (left, right) pairs with equal keys and
    * `leftTime < rightTime <= leftTime + window` (window in the time
    * columns' unit). Column names are resolved per side and must be
    * DISJOINT across the two frames (rename before joining — the output
    * carries both sides' columns verbatim).
    */
  def joinWithin(
      left: DataFrame, right: DataFrame,
      leftKeyCol: String, rightKeyCol: String,
      leftTimeCol: String, rightTimeCol: String,
      window: Long): DataFrame = {
    val spark = left.sparkSession
    install(spark)
    val overlap = left.columns.toSet.intersect(right.columns.toSet)
    require(overlap.isEmpty,
      s"joinWithin output carries both sides' columns: rename the " +
        s"overlapping columns first ($overlap)")
    def resolve(plan: LogicalPlan, name: String): Attribute =
      plan.output.find(_.name == name)
        .getOrElse(throw new IllegalArgumentException(
          s"column $name not found in ${plan.output}"))
    val lPlan = left.queryExecution.analyzed
    // fresh exprIds on the right for the self-join case (see AsOfJoin)
    val rPlan = org.apache.spark.sql.catalyst.plans.logical.Project(
      right.queryExecution.analyzed.output.map(a =>
        org.apache.spark.sql.catalyst.expressions.Alias(a, a.name)()),
      right.queryExecution.analyzed)
    org.apache.spark.sql.GraftShims.ofRows(spark,
      IntervalJoinPlan(
        lPlan, rPlan,
        resolve(lPlan, leftKeyCol), resolve(rPlan, rightKeyCol),
        resolve(lPlan, leftTimeCol), resolve(rPlan, rightTimeCol),
        window))
  }
}
