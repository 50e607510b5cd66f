package graft.tools

/** Ad-hoc plan auditor: for each named catalog query, report whether the
  * executed plan contains a CartesianProduct / BroadcastNestedLoopJoin and
  * print the join lines if so. Usage:
  * `runMain graft.tools.PlanCheck <sfDir> <name,name,...>` (or `all`).
  */
object PlanCheck {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]").config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names =
      if (args(1) == "all") graft.SparkEntry.queries.keys.toSeq.sorted
      else args(1).split(",").toSeq
    for (n <- names) {
      val df = graft.SparkEntry.queries(n)(spark, args(0))
      val plan = df.queryExecution.executedPlan.toString
      val bnlj = plan.contains("BroadcastNestedLoopJoin")
      val cart = plan.contains("CartesianProduct")
      println(s"== $n: BNLJ=$bnlj cartesian=$cart")
      if (bnlj || cart)
        plan.split("\n").filter(_.contains("Join")).take(12).foreach(println)
    }
    spark.stop()
  }
}
