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

  test("extension SQL-registers the codegen'd kernel tier (r12): every " +
      "function callable from spark.sql matches its Column-API twin") {
    import org.apache.spark.sql.functions._
    spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .master("local[2]")
        .config("spark.sql.shuffle.partitions", "2")
        .config("spark.sql.session.timeZone", "UTC")
        .withExtensions(new GraftExtensions()(_))
        .getOrCreate()

      val docs = s2.read.parquet(s"${sf()}/documents.parquet")
        .select(col("doc_id"), col("text"), reverse(col("text")).as("rtext"))
      docs.createOrReplaceTempView("x_docs")
      val viaSql = s2.sql("""
        SELECT doc_id,
               jaro_winkler(text, rtext) AS jw,
               damerau_levenshtein(substr(text, 1, 12), substr(rtext, 1, 12)) AS dl,
               minhash_signature(text) AS mh,
               simhash(text) AS sh,
               rolling_hash(text) AS rh,
               minimizer_offsets(text, 30, 8) AS mo,
               distinct_shingles(text) AS ds
        FROM x_docs""").collect().map(_.toSeq).toSet
      val viaCol = docs.select(col("doc_id"),
          graft.functions.JaroWinklerExpression
            .jaroWinkler(col("text"), col("rtext")).as("jw"),
          graft.functions.DamerauLevenshteinExpression.damerauLevenshtein(
            substring(col("text"), 1, 12), substring(col("rtext"), 1, 12))
            .as("dl"),
          graft.functions.MinHashSignatureExpression
            .minhashSignature(col("text")).as("mh"),
          graft.functions.SimHashExpression.simhash(col("text")).as("sh"),
          graft.functions.RollingHashExpression
            .rollingHash(col("text")).as("rh"),
          graft.functions.MinimizerOffsetsExpression
            .offsets(col("text"), 30, 8).as("mo"),
          graft.functions.DistinctShinglesExpression
            .distinctShingles(col("text")).as("ds"))
        .collect().map(_.toSeq).toSet
      assert(viaSql == viaCol, "string-kernel SQL surface != Column API")

      val vecs = s2.read.parquet(s"${sf()}/embeddings.parquet")
        .select(col("vec_id"),
          expr("transform(embedding, x -> cast(x AS DOUBLE))").as("v"))
      vecs.createOrReplaceTempView("x_vecs")
      val cb = "array(named_struct('cid', 0L, 'vec', v), " +
        "named_struct('cid', 1L, 'vec', transform(v, x -> x + 1.0d)))"
      val vSql = s2.sql(s"""
        SELECT vec_id,
               dot_f32(v, v) AS dp,
               lsh_signature(v, 8) AS lsh,
               nearest_centroid(v, $cb) AS nc
        FROM x_vecs""").collect().map(_.toSeq).toSet
      val vCol = vecs.select(col("vec_id"),
          graft.functions.DotProductExpression
            .dotProduct(col("v"), col("v")).as("dp"),
          graft.functions.LshSignatureExpression
            .lshSignature(col("v"), 8).as("lsh"),
          graft.functions.NearestCentroidExpression
            .nearest(col("v"), expr(cb)).as("nc"))
        .collect().map(_.toSeq).toSet
      assert(vSql == vCol, "vector-kernel SQL surface != Column API")

      // config parameters must be literals — a column there is a loud error
      val e = intercept[Exception] {
        s2.sql("SELECT lsh_signature(v, cast(vec_id AS INT)) FROM x_vecs")
          .collect()
      }
      assert(e.getMessage.contains("INT literal"), e.getMessage)
      val e2 = intercept[Exception] {
        s2.sql("SELECT simhash('a', 'b')").collect()
      }
      assert(e2.getMessage.contains("expects 1 argument"), e2.getMessage)
    } finally {
      SparkSession.setDefaultSession(spark)
      SparkSession.setActiveSession(spark)
    }
  }
}
