package graft.functions

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.SparkTestBase
import graft.queries.Tables

class DamerauLevenshteinSpec extends SparkTestBase {

  private def dl(a: String, b: String): Int =
    DamerauLevenshteinExpression.compute(
      UTF8String.fromString(a), UTF8String.fromString(b))

  test("kernel matches DuckDB 1.0 damerau_levenshtein on probed cases") {
    // every expected value below was read off DuckDB's built-in during the
    // semantics probe (q322's oracle function) — this pins the VARIANT:
    // DL("CA","ABC") = 2 is the full Lowrance–Wagner distance; the
    // restricted OSA variant would read 3 (it forbids edits inside a
    // transposed pair)
    val cases = Seq(
      ("CA", "ABC", 2), // the OSA-discriminating case
      ("a", "b", 1),
      ("ab", "ba", 1),
      ("abc", "", 3),
      ("", "xy", 2),
      ("", "", 0),
      ("abcdef", "abcfed", 2),
      ("kitten", "sitting", 3),
      ("ab", "ab", 0),
      ("abcde", "baced", 2),
      ("xabx", "xbax", 1),
      ("aXbXc", "abc", 2))
    for ((a, b, want) <- cases)
      assert(dl(a, b) == want, s"dl($a, $b) = ${dl(a, b)}, want $want")
  }

  test("metric properties: symmetric, identity, length bounds, triangle") {
    val words = Seq("goldenrod", "lavender", "spring", "chocolate", "lace",
      "golden", "laces", "", "a", "ba", "ab", "abba")
    for (a <- words; b <- words) {
      val d = dl(a, b)
      assert(d == dl(b, a), s"asymmetric on ($a, $b)")
      assert(d >= math.abs(a.length - b.length))
      assert(d <= math.max(a.length, b.length))
      if (a == b) assert(d == 0)
      for (c <- words)
        assert(dl(a, c) <= d + dl(b, c), s"triangle ($a, $b, $c)")
    }
  }

  test("bounded above by plain Levenshtein on the part-name vocabulary") {
    val frame = Tables.part(spark, sf())
      .select(col("p_name").as("a"),
        // a transposition-rich twin: swap the first two characters
        concat(substring(col("p_name"), 2, 1), substring(col("p_name"), 1, 1),
          substring(col("p_name"), 3, 1000)).as("b"))
      .select(
        DamerauLevenshteinExpression
          .damerauLevenshtein(col("a"), col("b")).as("dl"),
        levenshtein(col("a"), col("b")).as("lev"))
    assert(frame.filter(col("dl") > col("lev")).count() == 0)
    // the swapped twin is exactly 1 full-DL edit away (0 when the first two
    // characters are equal)
    assert(frame.filter(col("dl") > 1).count() == 0)
  }

  test("expression stays in whole-stage codegen and null yields null") {
    val alone = Tables.part(spark, sf())
      .select(DamerauLevenshteinExpression.damerauLevenshtein(col("p_name"),
        reverse(col("p_name"))).as("d"))
    val plan = alone.queryExecution.executedPlan
    assert(plan.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }.nonEmpty, plan.toString)
    assert(alone.filter(col("d") < 0).count() == 0)
    val r = spark.sql("SELECT 1")
      .select(DamerauLevenshteinExpression.damerauLevenshtein(
        lit(null.asInstanceOf[String]), lit("x")))
      .head
    assert(r.isNullAt(0))
  }
}
