package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Pins the three r14 kernels to the interpreted higher-order-function
  * formulations they replaced (the formulations the DuckDB oracles
  * mirror), including NULL semantics and bit-exact fold order:
  *
  *   - [[L2SqExpression]] vs
  *     `aggregate(zip_with(a, b, (x,y) -> (x-y)*(x-y)), 0.0, +)`;
  *   - [[VecSubExpression]] vs `zip_with(a, b, (x, y) -> x - y)`;
  *   - [[SignSignatureExpression]] vs the per-32-bit-word
  *     `aggregate(sequence(0, 31), 0L, ...)` sign fold q331/q332 ran.
  */
class L2SqVecSubSignSpec extends SparkTestBase {
  import spark.implicits._

  private def hofL2 = expr(
    "aggregate(zip_with(a, b, (x, y) -> (x - y) * (x - y))," +
      " CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)")

  test("l2sq is bit-identical to the HOF fold") {
    val rows = Seq.tabulate(50) { k =>
      (Array.tabulate(64)(i => math.sin(k * 64 + i)),
        Array.tabulate(64)(i => math.cos(k * 64 + i)))
    }
    Seq(rows).flatten.toDF("a", "b")
      .withColumn("native", L2SqExpression.l2sq(col("a"), col("b")))
      .withColumn("hof", hofL2)
      .collect().foreach { r =>
        assert(java.lang.Double.doubleToLongBits(r.getAs[Double]("native")) ==
          java.lang.Double.doubleToLongBits(r.getAs[Double]("hof")))
      }
  }

  test("l2sq NULL contract matches the HOF chain") {
    val df = Seq(
      (Array[java.lang.Double](1.0, null, 3.0),
        Array[java.lang.Double](1.0, 2.0, 3.0)),
      (Array[java.lang.Double](1.0, 2.0),
        Array[java.lang.Double](1.0, 2.0, 3.0)))
      .toDF("a", "b")
      .withColumn("native", L2SqExpression.l2sq(col("a"), col("b")))
      .withColumn("hof", hofL2)
    df.collect().foreach { r =>
      assert(r.isNullAt(r.fieldIndex("native")), r.toString)
      assert(r.isNullAt(r.fieldIndex("hof")), r.toString)
    }
  }

  test("vec_sub matches zip_with subtraction incl. padding and nulls") {
    val df = Seq(
      (Array[java.lang.Double](1.5, 2.5, 3.5),
        Array[java.lang.Double](0.5, null, 1.0)),
      (Array[java.lang.Double](1.0, 2.0),
        Array[java.lang.Double](1.0, 2.0, 3.0)),
      (Array[java.lang.Double](4.0, 5.0, 6.0, 7.0),
        Array[java.lang.Double](1.0)))
      .toDF("a", "b")
      .withColumn("native", VecSubExpression.vecSub(col("a"), col("b")))
      .withColumn("hof", expr("zip_with(a, b, (x, y) -> x - y)"))
    df.collect().foreach { r =>
      assert(r.getSeq[Any](r.fieldIndex("native")) ==
        r.getSeq[Any](r.fieldIndex("hof")), r.toString)
    }
  }

  test("sign_signature packs exactly the q331 fold's words") {
    def word(off: Int) = expr(
      s"""aggregate(sequence(0, 31), 0L,
          (acc, i) -> acc + CASE WHEN element_at(v, CAST(i + $off AS INT))
                              > CAST(0 AS DOUBLE)
                         THEN shiftleft(1L, CAST(i AS INT))
                         ELSE 0L END)""")
    val rows = Seq.tabulate(40) { k =>
      Tuple1(Array.tabulate(64)(i => math.sin(k * 64 + i + 1)))
    }
    rows.toDF("v")
      .withColumn("sig", SignSignatureExpression.signSignature(col("v")))
      .withColumn("wlo", word(1)).withColumn("whi", word(33))
      .collect().foreach { r =>
        val sig = r.getSeq[Long](r.fieldIndex("sig"))
        assert(sig.length == 2)
        assert(sig(0) == r.getAs[Long]("wlo"), r.toString)
        assert(sig(1) == r.getAs[Long]("whi"), r.toString)
      }
  }

  test("sign_signature: NULL element is a 0 bit, NULL vector is NULL") {
    val df = Seq(
      Tuple1(Array[java.lang.Double](1.0, null, -3.0, 2.0)),
      Tuple1(null.asInstanceOf[Array[java.lang.Double]]))
      .toDF("v")
      .withColumn("sig", SignSignatureExpression.signSignature(col("v")))
    val rows = df.collect()
    // bits: elem1>0 -> bit0, null -> 0, -3 -> 0, 2>0 -> bit3
    assert(rows(0).getSeq[Long](rows(0).fieldIndex("sig")) == Seq(9L))
    assert(rows(1).isNullAt(rows(1).fieldIndex("sig")))
  }
}
