package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Pins [[NearestCentroidExpression]] bit-for-bit against the interpreted
  * HOF fold it replaced in `Vec.assignAgainst` (the fold formulation is
  * what the DuckDB oracles' `ORDER BY d2, cid` mirrors, so equivalence to
  * it IS oracle equivalence). Cases: random vectors, exact d2 ties, NULL
  * vector, NULL element, length mismatch, empty codebook.
  */
class NearestCentroidSpec extends SparkTestBase {

  /** The replaced interpreted fold, verbatim. */
  private def foldBest(vec: Column): Column = aggregate(col("cb"),
    struct(lit(Double.PositiveInfinity).as("key"),
      lit(Long.MaxValue).as("cid"),
      lit(null).cast("double").as("d2")),
    (acc, c) => {
      val d2 = aggregate(
        zip_with(vec, c.getField("cv"), (x, y) => (x - y) * (x - y)),
        lit(0.0), (a2, x) => a2 + x)
      val cand = struct(
        coalesce(d2, lit(Double.PositiveInfinity)).as("key"),
        c.getField("cid").as("cid"), d2.as("d2"))
      when(cand < acc, cand).otherwise(acc)
    })

  test("kernel equals the interpreted fold on random, tied, and malformed " +
    "vectors") {
    import spark.implicits._
    val dim = 8
    val rnd = new scala.util.Random(42)
    def rv(): Seq[java.lang.Double] =
      Seq.fill(dim)(java.lang.Double.valueOf(rnd.nextDouble()))
    val centroids = (0L until 4L).map(c => (c, rv()))
    val vecs: Seq[(Long, Seq[java.lang.Double])] =
      (0L until 40L).map(i => (i, rv())) ++ Seq(
        (100L, null),                                   // NULL vector
        (101L, rv().updated(3, null: java.lang.Double)), // NULL element
        (102L, rv().take(dim - 2)),                      // length mismatch
        (103L, centroids(2)._2),                         // exact d2=0 match
        // equidistant from centroids 0 and 1 if they were equal — force a
        // genuine tie by duplicating centroid 1's vector as centroid 3's
        (104L, centroids(1)._2))
    val cbTied = centroids.updated(3, (3L, centroids(1)._2))
    val df = vecs.toDF("id", "v")
      .crossJoin(cbTied.toDF("cid", "cv")
        .agg(array_sort(collect_list(struct(col("cid"), col("cv"))))
          .as("cb")))
    val both = df.select(col("id"),
      foldBest(col("v")).as("f"),
      NearestCentroidExpression.nearest(col("v"), col("cb")).as("k"))
      .collect()
    both.foreach { r =>
      val f = r.getStruct(1)
      val k = r.getStruct(2)
      assert(f.getLong(1) == k.getLong(0),
        s"cid mismatch for id=${r.getLong(0)}: fold=${f} kernel=${k}")
      val fd2 = if (f.isNullAt(2)) null else f.getDouble(2)
      val kd2 = if (k.isNullAt(1)) null else k.getDouble(1)
      assert(fd2 == kd2,
        s"d2 mismatch for id=${r.getLong(0)}: fold=$fd2 kernel=$kd2")
    }
    // spot-pin the edge semantics, not just fold-parity
    val byId = both.map(r => (r.getLong(0), r.getStruct(2))).toMap
    assert(byId(100L).getLong(0) == 0L && byId(100L).isNullAt(1)) // all-tie
    assert(byId(101L).getLong(0) == 0L && byId(101L).isNullAt(1))
    assert(byId(102L).getLong(0) == 0L && byId(102L).isNullAt(1))
    assert(byId(103L).getLong(0) == 2L && byId(103L).getDouble(1) == 0.0)
    assert(byId(104L).getLong(0) == 1L) // tie with duplicated c3 -> lower cid
  }

  test("empty codebook yields the fold's init accumulator") {
    import spark.implicits._
    val df = Seq((1L, Seq(1.0, 2.0))).toDF("id", "v")
      .withColumn("cb", expr(
        "CAST(array() AS ARRAY<STRUCT<cid: BIGINT, cv: ARRAY<DOUBLE>>>)"))
    val r = df.select(
      NearestCentroidExpression.nearest(col("v"), col("cb")).as("k"))
      .head.getStruct(0)
    assert(r.getLong(0) == Long.MaxValue && r.isNullAt(1))
  }
}
