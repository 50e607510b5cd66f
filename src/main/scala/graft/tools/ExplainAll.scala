package graft.tools

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Dev tool: dump the formatted physical plan of every declared query (or a
  * named subset) so plan regressions are reviewable. Usage:
  *   runMain graft.tools.ExplainAll <sfDir> [queryName...]
  *
  * SPARK_GRAFT_BROADCAST_THRESHOLD overrides
  * spark.sql.autoBroadcastJoinThreshold for the snapshot. Local test SFs sit
  * entirely under the default 10 MB (column pruning pro-rates even lineitem's
  * estimate down), so every join auto-broadcasts and the snapshot audits
  * nothing about growth; a ~1 MB override keeps true dimension tables
  * (region/nation/supplier/part/customer) broadcast while forcing fact-fact
  * joins (orders x lineitem, self-joins on documents/events) to the
  * shuffle-based strategies they MUST use at 100x scale — which is exactly
  * the plan AQE re-derives at runtime when real sizes exceed the threshold.
  */
object ExplainAll {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.drop(1).toSet
      else SparkEntry.queries.keySet
    val builder = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
    sys.env.get("SPARK_GRAFT_BROADCAST_THRESHOLD")
      .foreach(t => builder.config("spark.sql.autoBroadcastJoinThreshold", t))
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      if (names.contains(name)) {
        println(s"\n===== $name =====")
        fn(spark, sfDir).explain("formatted")
      }
    }
    spark.stop()
  }
}
