package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Pins the codegen'd [[DotProductExpression]] kernel to the interpreted
  * `aggregate(zip_with(a, b, _ * _), 0.0, _ + _)` formulation the DuckDB
  * oracles mirror — including its NULL semantics (null element or length
  * mismatch ⇒ NULL) and its left-to-right IEEE fold order (bit equality,
  * not approximate).
  */
class DotProductSpec extends SparkTestBase {
  import spark.implicits._

  private def hofDot = expr(
    "aggregate(zip_with(a, b, (x, y) -> x * y), CAST(0.0 AS DOUBLE)," +
      " (acc, x) -> acc + x)")

  test("native dot product is bit-identical to the HOF fold") {
    val rows = Seq.tabulate(50) { k =>
      (Array.tabulate(64)(i => math.sin(k * 64 + i)),
        Array.tabulate(64)(i => math.cos(k * 64 + i)))
    }
    val df = rows.toDF("a", "b")
      .withColumn("native", DotProductExpression.dotProduct(col("a"), col("b")))
      .withColumn("hof", hofDot)
    df.collect().foreach { r =>
      // bit equality: same additions in the same order
      assert(java.lang.Double.doubleToLongBits(r.getAs[Double]("native")) ==
        java.lang.Double.doubleToLongBits(r.getAs[Double]("hof")))
    }
  }

  test("null element and length mismatch both yield NULL, like the HOF chain") {
    val df = Seq(
      (Array[java.lang.Double](1.0, null, 3.0),
        Array[java.lang.Double](1.0, 2.0, 3.0)),
      (Array[java.lang.Double](1.0, 2.0),
        Array[java.lang.Double](1.0, 2.0, 3.0)))
      .toDF("a", "b")
      .withColumn("native", DotProductExpression.dotProduct(col("a"), col("b")))
      .withColumn("hof", hofDot)
    df.collect().foreach { r =>
      assert(r.isNullAt(r.fieldIndex("native")), r.toString)
      assert(r.isNullAt(r.fieldIndex("hof")), r.toString)
    }
  }
}
