package graft

import org.apache.spark.sql.{Row, SparkSession}

class GraftExtensionsSpec extends SparkTestBase {

  test("spark.sql.extensions bootstrap registers ner without explicit calls") {
    spark // force the shared context up first
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .master("local[2]")
        .config("spark.sql.shuffle.partitions", "2")
        .withExtensions(new GraftExtensions()(_))
        .getOrCreate()
      assert(s2 ne spark)
      val r = s2.sql("SELECT ner('DuckDB is great') AS e").collect().head
      assert(r.getSeq[Row](0).isEmpty) // no model configured -> []
      val r2 = s2.sql("SELECT ner_extract('DuckDB', true) AS e").collect().head
      assert(r2.getSeq[Row](0).isEmpty)
      val e = intercept[Exception] {
        s2.sql("SELECT ner('a', true, false)").collect()
      }
      assert(e.getMessage.contains("1 or 2 arguments") ||
        e.getMessage.toLowerCase.contains("ner"))
    } finally {
      SparkSession.setDefaultSession(spark)
      SparkSession.setActiveSession(spark)
    }
  }
}
