package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.{SparkEntry, SparkTestBase}

/** Source/sink coverage beyond the driver's parquet surface: CSV, JSON and
  * ORC round-trips preserve the relational results (the host-engine formats
  * a DuckDB user would expect to keep using — SURVEY §2.C scans/sinks row).
  */
class SourcesSpec extends SparkTestBase {

  private def tmp(name: String): String =
    Files.createTempDirectory("graft-src").resolve(name).toString

  test("csv round-trip with header + explicit schema") {
    val src = Tables.customer(spark, sf()).select(
      col("c_custkey"), col("c_name"), col("c_acctbal"), col("c_mktsegment"))
    val p = tmp("cust_csv")
    src.write.option("header", "true").csv(p)
    val back = spark.read.option("header", "true").schema(src.schema).csv(p)
    assert(back.count() == src.count())
    assert(back.schema == src.schema)
    assert(back.agg(round(sum(col("c_acctbal")), 2)).head.getDouble(0) ==
      src.agg(round(sum(col("c_acctbal")), 2)).head.getDouble(0))
  }

  test("q109 compaction collapses each lang partition to one file") {
    SparkEntry.queries("q109_compaction")(spark, sf()).collect()
    val wh = spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:")
    def filesPerPartition(dir: String): Map[String, Int] = {
      val root = new java.io.File(s"$wh/$dir")
      root.listFiles().filter(f => f.isDirectory && f.getName.startsWith("lang="))
        .map(p => p.getName ->
          p.listFiles().count(_.getName.endsWith(".parquet"))).toMap
    }
    val frag = filesPerPartition("graft_fragmented")
    val compact = filesPerPartition("graft_compacted")
    assert(frag.keySet == compact.keySet)
    assert(frag.values.forall(_ > 1), s"fragmented input not fragmented: $frag")
    assert(compact.values.forall(_ == 1), s"compaction left small files: $compact")
  }

  test("json lines round-trip including nested arrays") {
    val src = Tables.embeddings(spark, sf())
      .select(col("vec_id"), col("embedding"), col("label"))
    val p = tmp("emb_json")
    src.write.json(p)
    val back = spark.read.schema(src.schema).json(p)
    assert(back.count() == src.count())
    val a = back.orderBy("vec_id").select(element_at(col("embedding"), 1))
      .head.getFloat(0)
    val b = src.orderBy("vec_id").select(element_at(col("embedding"), 1))
      .head.getFloat(0)
    assert(a == b)
  }

  test("orc round-trip preserves values and schema") {
    val src = Tables.orders(spark, sf())
    val p = tmp("orders_orc")
    src.write.orc(p)
    val back = spark.read.orc(p)
    assert(back.schema == src.schema)
    assert(back.agg(round(sum(col("o_totalprice")), 2)).head.getDouble(0) ==
      src.agg(round(sum(col("o_totalprice")), 2)).head.getDouble(0))
  }

  test("partitioned parquet sink prunes partitions on read") {
    val src = Tables.customer(spark, sf())
    val p = tmp("cust_part")
    src.write.partitionBy("c_mktsegment").parquet(p)
    val one = spark.read.parquet(p).filter(col("c_mktsegment") === "BUILDING")
    val expected = src.filter(col("c_mktsegment") === "BUILDING").count()
    assert(one.count() == expected)
    // partition filter must prune at planning, not scan-and-filter
    val scan = one.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters") &&
      scan.contains("c_mktsegment"), scan)
  }
}
