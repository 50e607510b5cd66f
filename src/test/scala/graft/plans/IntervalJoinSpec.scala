package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Pins the native interval join: exact (lower-exclusive, upper-inclusive)
  * pair semantics on crafted cases, the physical plan actually containing
  * IntervalJoinExec with Catalyst-planned exchanges+sorts, the overlap
  * guard, and parity with the bucket-explosion reformulation (q07's) on
  * the real events table.
  */
class IntervalJoinSpec extends SparkTestBase {
  import spark.implicits._

  private def crafted = (
    Seq((1L, 10L, 100L), (1L, 25L, 101L), (2L, 10L, 102L))
      .toDF("u", "ta", "aid"),
    Seq((1L, 10L, 200L), (1L, 15L, 201L), (1L, 20L, 202L), (1L, 26L, 203L),
      (2L, 20L, 204L), (3L, 11L, 205L))
      .toDF("u2", "tb", "bid"))

  test("pair semantics: strict lower, inclusive upper, key isolation") {
    val (a, b) = crafted
    val got = IntervalJoin.joinWithin(a, b, "u", "u2", "ta", "tb", 10L)
      .select("aid", "bid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set(
      (100L, 201L), // 10 < 15 <= 20
      (100L, 202L), // 10 < 20 <= 20: inclusive upper boundary
      // (100, 200) excluded: 10 is NOT strictly after 10
      // (100, 203): 26 > 20, outside
      (101L, 203L), // 25 < 26 <= 35
      (102L, 204L)) // key 2: 10 < 20 <= 20; key 3's row pairs with nothing
    )
  }

  test("plan contains IntervalJoinExec with planned exchanges") {
    val (a, b) = crafted
    val plan = IntervalJoin.joinWithin(a, b, "u", "u2", "ta", "tb", 10L)
      .queryExecution.executedPlan.toString
    assert(plan.contains("IntervalJoin")) // nodeName strips the Exec suffix
    assert("Exchange hashpartitioning".r.findAllIn(plan).size >= 2)
  }

  test("overlapping column names are rejected") {
    val (a, _) = crafted
    val e = intercept[IllegalArgumentException] {
      IntervalJoin.joinWithin(a, a, "u", "u", "ta", "ta", 10L)
    }
    assert(e.getMessage.contains("rename"))
  }

  test("property: operator equals the brute-force pair set on random " +
    "multi-key data") {
    // the sweep's subtle invariants — buffer admission at l'+w still valid
    // at later l, strict-lower eviction, key-change reset, right rows
    // consumed exactly once across keys — all fall out of comparing
    // against the O(n^2) definition on adversarially small random data
    // (dense key collisions, duplicate times, empty keys on either side)
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    import spark.implicits._
    val genRows: Gen[List[(Long, Long, Long)]] = for {
      n <- Gen.chooseNum(0, 25)
      rows <- Gen.listOfN(n, for {
        k <- Gen.chooseNum(1L, 4L)
        t <- Gen.chooseNum(0L, 60L)
      } yield (k, t))
    } yield rows.zipWithIndex.map { case ((k, t), i) => (k, t, i.toLong) }
    val w = 10L
    val prop = Prop.forAll(genRows, genRows) { (ls, rs) =>
      val expected = (for {
        (lk, lt, lid) <- ls
        (rk, rt, rid) <- rs
        if lk == rk && rt > lt && rt <= lt + w
      } yield (lid, rid)).toSet
      val got = IntervalJoin.joinWithin(
          ls.toDF("u", "ta", "aid"), rs.toDF("u2", "tb", "bid"),
          "u", "u2", "ta", "tb", w)
        .select("aid", "bid").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      got == expected
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(12), prop)
    assert(res.passed, s"interval-join property: ${res.status}")
  }

  test("parity with the bucket-explosion reformulation on real events") {
    val e = graft.queries.Tables.events(spark, sf())
      .select(col("event_id"), col("ts"), col("user_id"))
    val bucketNs = 300000000000L
    val native = IntervalJoin.joinWithin(
        e.select(col("user_id").as("u"), col("ts").as("ts_a"),
          col("event_id").as("ea")),
        e.select(col("user_id").as("u2"), col("ts").as("ts_b"),
          col("event_id").as("eb")),
        "u", "u2", "ts_a", "ts_b", bucketNs)
      .select("ea", "eb").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val left = e
      .withColumn("b0", expr(s"ts DIV ${bucketNs}L"))
      .withColumn("bkt", explode(array(col("b0"), col("b0") + 1)))
      .select(col("user_id").as("u"), col("ts").as("ts_a"),
        col("event_id").as("ea"), col("bkt"))
    val right = e.select(col("user_id").as("u2"), col("ts").as("ts_b"),
      col("event_id").as("eb"), expr(s"ts DIV ${bucketNs}L").as("bkt2"))
    val exploded = left.join(right,
        col("u") === col("u2") && col("bkt") === col("bkt2") &&
        col("ts_b") > col("ts_a") &&
        col("ts_b") <= col("ts_a") + lit(bucketNs))
      .select("ea", "eb").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(native == exploded)
    assert(native.nonEmpty)
  }
}
