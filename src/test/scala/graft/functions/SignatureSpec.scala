package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Pins the codegen'd [[LshSignatureExpression]] and [[SimHashExpression]]
  * kernels to the SQL-expressible formulations the DuckDB oracles run
  * (q42/q47 and q39 respectively).
  */
class SignatureSpec extends SparkTestBase {
  import spark.implicits._

  private val simhashSql = """
    CAST(aggregate(sequence(0, 15), 0, (acc, k) -> acc + IF(
      2 * size(filter(transform(split(trim(text), '\\s+'), w -> md5(w)),
        h -> ((shiftright(instr('0123456789abcdef',
                 substring(h, CAST(k DIV 4 AS INT) + 1, 1)) - 1,
               3 - (k % 4))) & 1) = 1))
      > size(split(trim(text), '\\s+')),
      shiftleft(1, k), 0)) AS INT)"""

  test("LSH signature kernel matches the SQL hyperplane formulation") {
    val vecs = Seq.tabulate(20)(k =>
      (k.toLong, Array.tabulate(64)(i => math.sin(k * 64 + i).toFloat)))
    val df = vecs.toDF("vec_id", "embedding")
      .withColumn("sig",
        LshSignatureExpression.lshSignature(col("embedding"), 32))
    def hyperplane(j: Int): String =
      s"""transform(sequence(0, 63), i ->
          instr('0123456789abcdef',
            substring(md5(concat('$j:', CAST(i AS STRING))), 1, 1)) - 8.5)"""
    val sqlSig = concat((0 until 32).map(j => when(
      aggregate(
        zip_with(transform(col("embedding"), x => x.cast("double")),
          expr(hyperplane(j)), (x, y) => x * y),
        lit(0.0), (acc, x) => acc + x) > 0, lit("1")).otherwise(lit("0"))): _*)
    val rows = df.withColumn("expected", sqlSig).collect()
    rows.foreach { r =>
      assert(r.getAs[String]("sig") == r.getAs[String]("expected"),
        s"vec ${r.getAs[Long]("vec_id")}")
    }
  }

  test("narrow LSH signature is a prefix of the wide one (global planes)") {
    val vecs = Seq.tabulate(10)(k =>
      Array.tabulate(64)(i => math.cos(k * 64 + i).toFloat))
    val rows = vecs.toDF("embedding")
      .select(
        LshSignatureExpression.lshSignature(col("embedding"), 4).as("s4"),
        LshSignatureExpression.lshSignature(col("embedding"), 32).as("s32"))
      .collect()
    rows.foreach { r =>
      assert(r.getString(1).startsWith(r.getString(0)))
      assert(r.getString(0).length == 4 && r.getString(1).length == 32)
    }
  }

  test("LSH signature of a wrong-dimension vector is all zeros") {
    val sig = Seq(Array(1f, 2f, 3f)).toDF("embedding")
      .select(LshSignatureExpression.lshSignature(col("embedding"), 4).as("s"))
      .collect()(0).getString(0)
    assert(sig == "0000")
  }

  test("LSH signature with a null element is all zeros (null-poisoned sum)") {
    // SQL semantics: a NULL term makes the whole dot product NULL, and
    // `NULL > 0` selects the '0' branch for every hyperplane
    val df = spark.sql(
      """SELECT transform(sequence(0, 63),
           i -> IF(i = 7, CAST(NULL AS FLOAT), CAST(i AS FLOAT))) AS embedding""")
    val sig = df
      .select(LshSignatureExpression.lshSignature(col("embedding"), 8).as("s"))
      .collect()(0).getString(0)
    assert(sig == "00000000")
  }

  test("kernels match SQL formulations on a seeded random corpus") {
    val rnd = new scala.util.Random(42)
    val alphabet = "ab cd\tef\ngh€ñ日 .,!x"
    val texts = Seq.tabulate(100) { _ =>
      val n = rnd.nextInt(40) // includes 0..4 = shorter than one shingle
      (0 until n).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    }
    val df = texts.toDF("text")
      .withColumn("mh_native",
        MinHashSignatureExpression.minhashSignature(col("text")))
      .withColumn("mh_sql", expr(
        """transform(sequence(0, 7), j ->
             IF(length(text) < 5, CAST(NULL AS STRING),
               array_min(transform(
                 transform(sequence(1, length(text) - 4),
                   i -> substring(text, i, 5)),
                 sh -> substring(IF(j < 4, md5(sh), md5(concat('x', sh))),
                                 (j % 4) * 8 + 1, 8)))))"""))
      .withColumn("sh_native", SimHashExpression.simhash(col("text")))
      .withColumn("sh_sql", expr(simhashSql))
    val rows = df.collect()
    rows.foreach { r =>
      val native = r.getAs[scala.collection.Seq[String]]("mh_native")
      val sql = r.getAs[scala.collection.Seq[String]]("mh_sql")
      val t = r.getAs[String]("text")
      // texts shorter than one shingle are all-null on both paths
      (0 until 8).foreach(j => assert(native(j) == sql(j), s"mh$j '$t'"))
      assert(r.getAs[Int]("sh_native") == r.getAs[Int]("sh_sql"),
        s"simhash '$t'")
    }
  }

  test("q102's 6/5/5 band split has zero false negatives for hamming <= 2") {
    // exhaustive, not sampled: every 16-bit fingerprint x every error
    // pattern of <= 2 flipped bits (65536 x 137 cases). The pigeonhole
    // argument says 2 flips cannot touch all 3 disjoint bands, so at least
    // one band must compare equal — the property q102's candidate
    // generation (and its DuckDB oracle) silently relies on.
    def bands(fp: Int): (Int, Int, Int) =
      ((fp >> 10) & 63, (fp >> 5) & 31, fp & 31)
    val errors = Seq(0) ++
      (0 until 16).map(1 << _) ++
      (for (i <- 0 until 16; j <- (i + 1) until 16) yield (1 << i) | (1 << j))
    assert(errors.size == 1 + 16 + 120)
    for (fp <- 0 until 65536; e <- errors) {
      val (a1, a2, a3) = bands(fp)
      val (b1, b2, b3) = bands(fp ^ e)
      // clue formatted only on failure: assert(cond, clue) would eagerly
      // build the f-string on all ~9M passing iterations
      if (!(a1 == b1 || a2 == b2 || a3 == b3))
        fail(f"fp=$fp%04x error=$e%04x shares no band")
    }
  }

  test("SimHash kernel matches the SQL bit-vote formulation") {
    val texts = Seq(
      "hello world hello spark",
      "the quick brown fox",
      "  leading and trailing  ",
      "single",
      "a\tb\tc tabs between")
    val rows = texts.toDF("text")
      .withColumn("native", SimHashExpression.simhash(col("text")))
      .withColumn("expected", expr(simhashSql))
      .collect()
    rows.foreach { r =>
      assert(r.getAs[Int]("native") == r.getAs[Int]("expected"),
        s"text='${r.getAs[String]("text")}'")
    }
  }
}
