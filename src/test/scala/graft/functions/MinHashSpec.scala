package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Pins the codegen'd [[MinHashSignatureExpression]] kernel to the
  * SQL-expressible formulation the DuckDB oracle runs (q36-q38): permutation
  * j in 0-3 = j-th 8-hex window of md5(shingle), 4-7 = windows of
  * md5('x' || shingle), min over char-5-gram shingles.
  */
class MinHashSpec extends SparkTestBase {
  import spark.implicits._

  private val texts = Seq(
    "hello world this is a test of minhash signatures",
    "the quick brown fox jumps over the lazy dog",
    "aaaaa",
    "héllo wörld ünïcode tèxt €xample", // multi-byte UTF-8 code points
    "exactly5")

  test("kernel matches the SQL higher-order formulation") {
    val df = texts.toDF("text")
      .withColumn("sig",
        MinHashSignatureExpression.minhashSignature(col("text")))
      .withColumn("shingles",
        expr("transform(sequence(1, length(text) - 4), i -> substring(text, i, 5))"))
    val withExpected = (0 until 8).foldLeft(df) { (acc, j) =>
      val src = if (j < 4) "md5(sh)" else "md5(concat('x', sh))"
      acc.withColumn(s"exp$j",
        expr(s"array_min(transform(shingles, sh -> substring($src, ${(j % 4) * 8 + 1}, 8)))"))
    }
    withExpected.collect().foreach { row =>
      val sig = row.getAs[scala.collection.Seq[String]]("sig")
      (0 until 8).foreach { j =>
        assert(sig(j) == row.getAs[String](s"exp$j"),
          s"perm $j mismatch for text='${row.getAs[String]("text")}'")
      }
    }
  }

  test("texts shorter than one shingle yield all-null signature entries") {
    val sig = Seq("abcd").toDF("text")
      .select(MinHashSignatureExpression.minhashSignature(col("text")).as("sig"))
      .collect()(0).getAs[scala.collection.Seq[String]]("sig")
    assert(sig.length == 8 && sig.forall(_ == null))
  }

  test("signature values are 8 lowercase hex chars") {
    val sig = Seq(texts.head).toDF("text")
      .select(MinHashSignatureExpression.minhashSignature(col("text")).as("sig"))
      .collect()(0).getAs[scala.collection.Seq[String]]("sig")
    sig.foreach(v => assert(v.matches("[0-9a-f]{8}")))
  }
}
