package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Pins the native as-of join: exact strict-prior semantics on a hand-built
  * case set, the physical plan actually containing AsOfJoinExec with
  * exchanges+sorts planned by Catalyst, partition-boundary safety (every
  * key lands wholly in one partition), and parity with an independent
  * window-based computation on the real events table.
  */
class AsOfJoinSpec extends SparkTestBase {
  import spark.implicits._

  test("strict-prior semantics on crafted cases") {
    // key 1: normal priors; key 2: no views; key 3: view exactly AT the
    // purchase time (strictly-before => not matched), plus one before
    val purchases = Seq((100L, 1L, 50L), (101L, 1L, 10L), (102L, 2L, 50L),
      (103L, 3L, 30L))
      .toDF("event_id", "user_id", "ts_us")
    val views = Seq((1L, 20L), (1L, 40L), (1L, 60L), (3L, 30L), (3L, 10L))
      .toDF("user_id", "vt")
      .select(col("user_id"), col("vt").as("ts_us"), col("vt").as("view_us"))
    val got = AsOfJoin
      .joinPrior(purchases, views, "user_id", "ts_us", "view_us", "prior")
      .orderBy("event_id")
      .collect()
      .map(r => (r.getLong(0), if (r.isNullAt(3)) None else Some(r.getLong(3))))
      .toSeq
    assert(got == Seq(
      (100L, Some(40L)), // 20,40 < 50; 60 is after
      (101L, None),      // no view strictly before 10
      (102L, None),      // user 2 has no views at all
      (103L, Some(10L)))) // the view AT 30 is not strictly before
  }

  test("staleness tolerance excludes matches older than the bound") {
    val purchases = Seq((100L, 1L, 50L), (101L, 1L, 41L))
      .toDF("event_id", "user_id", "ts_us")
    val views = Seq((1L, 40L)).toDF("user_id", "vt")
      .select(col("user_id"), col("vt").as("ts_us"), col("vt").as("view_us"))
    val got = AsOfJoin
      .joinPrior(purchases, views, "user_id", "ts_us", "view_us", "prior",
        toleranceUs = Some(5L))
      .orderBy("event_id")
      .collect()
      .map(r => (r.getLong(0), if (r.isNullAt(3)) None else Some(r.getLong(3))))
      .toSeq
    // view at 40: within 5 of the purchase at 41, too stale for the one at 50
    assert(got == Seq((100L, None), (101L, Some(40L))))
  }

  test("right-side time ties resolve deterministically to the greatest value") {
    // two right rows at the SAME (key, time): the declared right ordering
    // includes the value as a tie-break (round-5 ADVICE), so the winner is
    // the greatest value among tied times under any partition schedule
    val purchases = Seq((100L, 1L, 50L)).toDF("event_id", "user_id", "ts_us")
    val views = Seq((1L, 40L, 7L), (1L, 40L, 9L), (1L, 40L, 3L))
      .toDF("user_id", "ts_us", "view_us")
    for (_ <- 1 to 3) {
      val got = AsOfJoin
        .joinPrior(purchases, views, "user_id", "ts_us", "view_us", "prior")
        .collect().map(_.getLong(3)).toSeq
      assert(got == Seq(9L))
    }
  }

  test("plan contains AsOfJoinExec with Catalyst-planned exchanges and sorts") {
    val purchases = Seq((1L, 1L, 5L)).toDF("event_id", "user_id", "ts_us")
    val views = Seq((1L, 1L, 1L)).toDF("user_id", "ts_us", "view_us")
    val df = AsOfJoin
      .joinPrior(purchases, views, "user_id", "ts_us", "view_us", "prior")
    df.collect() // materialize so AQE's final plan is the one inspected
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"), plan)
    assert(plan.contains("Exchange hashpartitioning"), plan)
    assert(plan.contains("Sort ["), plan)
  }

  test("agrees with an independent window formulation on real events") {
    val ev = graft.queries.Tables.events(spark, sf())
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"),
        expr("ts DIV 1000").as("ts_us"))
    val views = ev.filter(col("event_type") === "view")
      .select(col("user_id"), expr("ts DIV 1000").as("ts_us"),
        expr("ts DIV 1000").as("view_us"))
    val got = AsOfJoin
      .joinPrior(purchases, views, "user_id", "ts_us", "view_us", "prior")
      .orderBy("event_id")
      .collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(3)) -1L else r.getLong(3))).toSeq
    // independent truth: per purchase, max strictly-earlier view time, via
    // a join + groupBy (quadratic-ish but fine at spec scale)
    val expect = purchases.as("p")
      .join(views.as("v"),
        col("p.user_id") === col("v.user_id") &&
          col("v.ts_us") < col("p.ts_us"), "left")
      .groupBy(col("p.event_id"))
      .agg(max(col("v.view_us")).as("prior"))
      .orderBy("event_id")
      .collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) -1L else r.getLong(1))).toSeq
    assert(got == expect)
    assert(got.nonEmpty)
  }
}
