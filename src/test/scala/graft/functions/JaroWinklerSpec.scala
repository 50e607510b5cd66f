package graft.functions

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.SparkTestBase
import graft.queries.Tables

class JaroWinklerSpec extends SparkTestBase {

  private def jw(a: String, b: String): Double =
    JaroWinklerExpression.compute(
      UTF8String.fromString(a), UTF8String.fromString(b))

  test("kernel matches DuckDB 1.0 jaro_winkler_similarity on probed cases") {
    // every expected value below was read off DuckDB's built-in during the
    // semantics probe (q281's oracle function) — this pins the exact
    // variant: empty→0, greedy windowed matching, INTEGER
    // half-transpositions, boost only above 0.7, prefix cap 4
    val cases = Seq(
      ("", "", 0.0),
      ("a", "", 0.0),
      ("abc", "abc", 1.0),
      ("martha", "marhta", 0.9611111111111111),
      ("dixon", "dicksonx", 0.8133333333333332),
      ("jellyfish", "smellyfish", 0.8962962962962964),
      ("dwayne", "duane", 0.8400000000000001),
      ("aaapppp", "ap", 0.7857142857142857),
      ("abcdefgh", "hgfedcba", 0.5),
      ("x", "y", 0.0),
      ("ab", "ba", 0.0),
      ("crate", "trace", 0.7333333333333334),
      ("prefix", "prefixxxxlong", 0.8923076923076924),
      ("ABC", "abc", 0.0),
      ("ab", "ac", 0.6666666666666666), // 0.7-gate: jaro ≤ 0.7 unboosted
      ("abcd", "abee", 0.6666666666666666),
      ("ab", "abcdefghij", 0.7866666666666667),
      ("abcde", "abxxx", 0.6),
      ("abcdefghij", "abcdefghijklmnopqrst", 0.9),
      ("aabbcc", "ccbbaa", 0.5555555555555555),
      ("special", "spaecial", 0.8904761904761905),
      // 3 pairwise mismatches → t = 3/2 = 1 INTEGER (0.944̄, not 0.916̄)
      ("abcqqq", "bcaqqq", 0.9444444444444445),
      ("abq", "baq", 0.5555555555555555))
    for ((a, b, want) <- cases)
      assert(math.abs(jw(a, b) - want) < 1e-12, s"jw($a, $b)")
  }

  test("symmetric, bounded to [0,1], and exact-match is 1") {
    val words = Seq("goldenrod", "lavender", "spring", "chocolate", "lace",
      "golden", "laces", "", "a")
    for (a <- words; b <- words) {
      val s = jw(a, b)
      assert(s >= 0.0 && s <= 1.0)
      assert(s == jw(b, a), s"asymmetric on ($a, $b)")
      if (a == b && a.nonEmpty) assert(s == 1.0)
    }
  }

  test("expression stays in whole-stage codegen and null yields null") {
    val alone = Tables.part(spark, sf())
      .select(JaroWinklerExpression.jaroWinkler(col("p_name"),
        reverse(col("p_name"))).as("s"))
    val plan = alone.queryExecution.executedPlan
    assert(plan.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }.nonEmpty, plan.toString)
    assert(alone.filter(col("s") < 0 || col("s") > 1).count() == 0)
    val r = spark.sql("SELECT 1")
      .select(JaroWinklerExpression.jaroWinkler(
        lit(null.asInstanceOf[String]), lit("x")))
      .head
    assert(r.isNullAt(0))
  }
}
