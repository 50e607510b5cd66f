package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class SkewSpec extends SparkTestBase {

  test("salted join equals the plain join on an artificially skewed key") {
    // collapse lineitem's join key to 3 hot values — worst-case skew
    val left = Tables.lineitem(spark, sf())
      .select((col("l_orderkey") % 3).as("k"), col("l_quantity"),
        col("l_linenumber"), col("l_orderkey"))
    val right = spark.range(3).select(col("id").as("k"),
      concat(lit("grp_"), col("id")).as("label"))

    val plain = left.join(right, Seq("k"))
      .groupBy(col("label")).agg(
        count(lit(1)).as("n"), round(sum(col("l_quantity")), 2).as("q"))
      .orderBy("label").collect().toSeq

    val salted = Skew.saltedEquiJoin(left, right, Seq("k"), salts = 8,
        saltBy = col("l_orderkey"))
      .groupBy(col("label")).agg(
        count(lit(1)).as("n"), round(sum(col("l_quantity")), 2).as("q"))
      .orderBy("label").collect().toSeq

    assert(salted == plain)
  }

  test("salting spreads a hot key across partitions") {
    val left = Tables.lineitem(spark, sf())
      .select(lit(1L).as("k"), col("l_orderkey"))
    val right = spark.range(1).select(col("id").as("k") + 1)
      .toDF("k")
    val joined = Skew.saltedEquiJoin(left, right, Seq("k"), salts = 8,
      saltBy = col("l_orderkey"))
    // the join keys now include the salt: 8 distinct (k, salt) groups
    val nSalts = left.withColumn("s",
        pmod(xxhash64(col("l_orderkey")), lit(8L)).cast("int"))
      .select("s").distinct().count()
    assert(nSalts == 8)
    assert(joined.count() == left.count())
  }
}
