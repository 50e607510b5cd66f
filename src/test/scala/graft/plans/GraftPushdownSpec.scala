package graft.plans

import org.apache.spark.sql.catalyst.plans.logical.Filter
import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.queries.Tables

/** Pins the optimizer tier of the custom-join stack: single-side
  * deterministic filters written ABOVE `joinPrior`/`joinWithin` must end up
  * BENEATH the custom logical node (and from there in the parquet scan's
  * PushedFilters), while as-of right-side state selection, mixed-side
  * predicates, and nondeterministic predicates stay above. Each plan
  * assertion is paired with a result-parity check against the manually
  * pre-filtered construction, so the rule is proven semantics-preserving,
  * not just plan-shaping.
  */
class GraftPushdownSpec extends SparkTestBase {

  private def events = Tables.events(spark, sf())
    .select(col("event_id"), col("user_id"), col("ts"), col("value"))

  test("as-of join: left-only filter pushes beneath the node to the scan") {
    val left = events
    val right = events
      .select(col("user_id"), col("ts"), col("value").as("v"))
    val joined = AsOfJoin
      .joinPrior(left, right, "user_id", "ts", "v", "prior")
      .filter(col("user_id") <= 5 && col("prior").isNotNull)
    val opt = joined.queryExecution.optimizedPlan
    val aj = opt.collectFirst { case j: AsOfJoin.AsOfJoinPlan => j }.get
    // user_id predicate moved INTO the left subtree
    assert(aj.left.collectFirst {
      case f: Filter
          if f.condition.references.exists(_.name == "user_id") => f
    }.isDefined, s"left-side predicate not pushed:\n$opt")
    // the right subtree stays untouched (no filter materialized there)
    assert(aj.right.collectFirst { case f: Filter => f }.isEmpty)
    // the residual above the join references only the produced column
    opt.collectFirst {
      case f: Filter if f.child.isInstanceOf[AsOfJoin.AsOfJoinPlan] => f
    }.foreach { residual =>
      assert(residual.condition.references.forall(_.name == "prior"),
        residual.toString)
    }
    // and the pushed predicate reaches the parquet scan itself
    val physical = joined.queryExecution.executedPlan.toString
    assert(
      "PushedFilters: \\[[^\\]]*user_id".r.findFirstIn(physical).isDefined,
      physical)
    // semantics parity vs the manually pre-filtered construction
    val expect = AsOfJoin
      .joinPrior(left.filter(col("user_id") <= 5), right,
        "user_id", "ts", "v", "prior")
      .filter(col("prior").isNotNull)
      .orderBy("event_id").collect().toSeq
    assert(joined.orderBy("event_id").collect().toSeq == expect)
    assert(expect.nonEmpty)
  }

  test("as-of join: nondeterministic predicates are not pushed") {
    val left = events
    val right = events
      .select(col("user_id"), col("ts"), col("value").as("v"))
    val joined = AsOfJoin
      .joinPrior(left, right, "user_id", "ts", "v", "prior")
      .filter(rand(7) > 0.5 && col("user_id") >= 0L)
    val aj = joined.queryExecution.optimizedPlan
      .collectFirst { case j: AsOfJoin.AsOfJoinPlan => j }.get
    // the deterministic conjunct still pushes; the rand() one must not
    aj.left.collectFirst { case f: Filter => f }.foreach { f =>
      assert(f.condition.deterministic, f.toString)
    }
    val above = joined.queryExecution.optimizedPlan.collectFirst {
      case f: Filter if f.child.isInstanceOf[AsOfJoin.AsOfJoinPlan] => f
    }
    assert(above.exists(!_.condition.deterministic),
      joined.queryExecution.optimizedPlan.toString)
  }

  test("as-of join: unused columns are pruned from both sides to the scan") {
    val fatLeft = Tables.events(spark, sf()) // 6 cols incl. props
    val fatRight = Tables.events(spark, sf())
      .select(col("user_id"), col("ts"), col("value").as("v"),
        col("props").as("rprops"))
    val joined = AsOfJoin
      .joinPrior(fatLeft, fatRight, "user_id", "ts", "v", "prior")
      .select(col("event_id"), col("prior"))
    val opt = joined.queryExecution.optimizedPlan
    val aj = opt.collectFirst { case j: AsOfJoin.AsOfJoinPlan => j }.get
    // right narrows to exactly the key/time/value references
    assert(aj.right.output.map(_.name).toSet == Set("user_id", "ts", "v"),
      s"right not pruned:\n$opt")
    // left narrows to the projection's needs + the join's key/time
    assert(aj.left.output.map(_.name).toSet ==
      Set("event_id", "user_id", "ts"), s"left not pruned:\n$opt")
    // and the scans themselves no longer read the fat columns
    val physical = joined.queryExecution.executedPlan.toString
    assert(!physical.contains("props"), physical)
    // parity with the manually pre-projected construction
    val expect = AsOfJoin
      .joinPrior(
        fatLeft.select(col("event_id"), col("user_id"), col("ts")),
        fatRight.select(col("user_id"), col("ts"), col("v")),
        "user_id", "ts", "v", "prior")
      .select(col("event_id"), col("prior"))
      .orderBy("event_id").collect().toSeq
    assert(joined.orderBy("event_id").collect().toSeq == expect)
    assert(expect.nonEmpty)
  }

  test("interval join: filters push to BOTH sides; parity with pre-filtered") {
    val left = events.select(col("event_id").as("l_id"),
      col("user_id").as("l_user"), col("ts").as("l_ts"),
      col("value").as("l_val"))
    val right = events.select(col("event_id").as("r_id"),
      col("user_id").as("r_user"), col("ts").as("r_ts"))
    val win = 600L * 1000000L * 1000L // 10 min in ns
    val joined = IntervalJoin
      .joinWithin(left, right, "l_user", "r_user", "l_ts", "r_ts", win)
      .filter(col("l_val") > 0.0 && col("r_id") % 2 === 0 &&
        col("l_ts") < col("r_ts")) // mixed-side conjunct stays above
    val opt = joined.queryExecution.optimizedPlan
    val ij = opt.collectFirst { case j: IntervalJoin.IntervalJoinPlan => j }.get
    assert(ij.left.collectFirst {
      case f: Filter if f.condition.references.exists(_.name == "l_val") => f
    }.isDefined, s"left predicate not pushed:\n$opt")
    assert(ij.right.collectFirst {
      case f: Filter if f.condition.references.exists(_.name == "r_id") => f
    }.isDefined, s"right predicate not pushed:\n$opt")
    opt.collectFirst {
      case f: Filter if f.child.isInstanceOf[IntervalJoin.IntervalJoinPlan] =>
        f
    }.foreach { residual =>
      val names = residual.condition.references.map(_.name).toSet
      assert(names == Set("l_ts", "r_ts"), residual.toString)
    }
    val expect = IntervalJoin
      .joinWithin(left.filter(col("l_val") > 0.0),
        right.filter(col("r_id") % 2 === 0),
        "l_user", "r_user", "l_ts", "r_ts", win)
      .filter(col("l_ts") < col("r_ts"))
      .orderBy("l_id", "r_id").collect().toSeq
    assert(joined.orderBy("l_id", "r_id").collect().toSeq == expect)
    assert(expect.nonEmpty)
  }
}
