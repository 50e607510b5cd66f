package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Pins the codegen'd [[DistinctShinglesExpression]] kernel to the
  * SQL-expressible formulation it replaced on q38's verification path:
  * `array_distinct(transform(sequence(1, length(text) - 4),
  * i -> substring(text, i, 5)))` — same elements, same first-occurrence
  * order, code-point (not byte) windows.
  */
class ShinglesSpec extends SparkTestBase {
  import spark.implicits._

  private val texts = Seq(
    "hello world this is a test of shingles",
    "aaaaaaaaaa", // maximal duplication: one distinct shingle
    "héllo wörld ünïcode tèxt €xample", // multi-byte UTF-8 code points
    "exactly5",
    "ababababab")

  test("kernel matches array_distinct of the substr transform") {
    val rows = texts.toDF("text")
      .withColumn("fast",
        DistinctShinglesExpression.distinctShingles(col("text")))
      .withColumn("slow", expr(
        "array_distinct(transform(sequence(1, length(text) - 4), i -> substring(text, i, 5)))"))
      .collect()
    rows.foreach { r =>
      assert(r.getAs[scala.collection.Seq[String]]("fast") ==
        r.getAs[scala.collection.Seq[String]]("slow"),
        s"mismatch for text='${r.getAs[String]("text")}'")
    }
  }

  test("texts shorter than one shingle yield an empty array") {
    val out = Seq("abcd", "", "é").toDF("text")
      .select(DistinctShinglesExpression.distinctShingles(col("text")).as("sh"))
      .collect()
    out.foreach(r =>
      assert(r.getAs[scala.collection.Seq[String]]("sh").isEmpty))
  }
}
