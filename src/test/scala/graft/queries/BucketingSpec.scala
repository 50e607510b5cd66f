package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Bucketed (pre-partitioned) tables: the co-located-join layout for the
  * repeated big-join workloads — after bucketing both sides on the join key,
  * the join plans with NO shuffle exchange on either side. This is the
  * 100 TB answer to "orders joins customer every day": pay the shuffle once
  * at write time.
  */
class BucketingSpec extends SparkTestBase {

  test("bucketed saveAsTable enables a shuffle-free co-located join") {
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_customer")
    // disable auto-broadcast so the test observes the bucket join itself
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      Tables.orders(spark, sf())
        .write.bucketBy(4, "o_custkey").sortBy("o_custkey")
        .saveAsTable("b_orders")
      Tables.customer(spark, sf())
        .write.bucketBy(4, "c_custkey").sortBy("c_custkey")
        .saveAsTable("b_customer")

      val joined = spark.table("b_orders")
        .join(spark.table("b_customer"),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n"))

      val plan = joined.queryExecution.executedPlan.toString
      // no shuffle on the join inputs: the only allowed Exchange is the
      // one introduced by the final groupBy
      val joinPart = plan.split("HashAggregate").last
      assert(!joinPart.contains("Exchange hashpartitioning(o_custkey"),
        plan)
      assert(!joinPart.contains("Exchange hashpartitioning(c_custkey"),
        plan)

      // and it still computes the right answer
      val viaBuckets = joined.orderBy("c_mktsegment").collect()
        .map(r => (r.getString(0), r.getLong(1))).toSeq
      val direct = Tables.orders(spark, sf())
        .join(Tables.customer(spark, sf()),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n"))
        .orderBy("c_mktsegment").collect()
        .map(r => (r.getString(0), r.getLong(1))).toSeq
      assert(viaBuckets == direct)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_customer")
    }
  }
}
