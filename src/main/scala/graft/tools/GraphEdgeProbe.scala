package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev tool (r13 task: graph-tier scale follow-through): measure whether
  * the support-≥2 co-purchase edge relation — recomputed per query by the
  * self-contained-query contract in q310/q313/q315/q320/q321/q323/q327/
  * q328 — is worth a shared cached/bucketed structural exception.
  *
  * Measures, per SF dir:
  *   1. `t_e0`: deriving the edge base alone (distinct (order,part) →
  *      self-join per order → support filter), forced by a count;
  *   2. `t_bucket_write`: one-time cost of persisting it bucketed by the
  *      q88 pattern (bucketBy on the join key, sorted);
  *   3. `t_bucket_read`: re-reading the bucketed table + count (what each
  *      subsequent query would pay instead of t_e0);
  *   4. each graph query end-to-end (the catalog functions, unmodified).
  *
  * Decision input: recompute-per-query costs 8·t_e0 across the tier; the
  * shared relation costs t_e0 + t_bucket_write + 7·t_bucket_read. The
  * delta over the tier's total runtime is the paragraph BASELINE.md r13
  * records.
  *
  * Usage: runMain graft.tools.GraphEdgeProbe <sfDir>
  */
object GraphEdgeProbe {
  private val GraphQueries = Seq("q310_kcore_peel", "q313_hits_scores",
    "q315_label_propagation", "q320_lpa_modularity",
    "q321_assortativity", "q323_anf_effective_diameter",
    "q327_rich_club", "q328_ra_link_prediction")

  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val wh = java.nio.file.Files.createTempDirectory("graft_edge_probe")
      .toString
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.warehouse.dir", wh)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[T](tag: String)(f: => T): Double = {
      val t0 = System.nanoTime()
      f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[edgeprobe] $tag: $s%.2f s")
      s
    }

    def e0(): DataFrame = {
      val op = graft.queries.Tables.lineitem(spark, dir)
        .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
        .distinct()
      op.as("x")
        .join(op.as("y"), col("x.o") === col("y.o") && col("x.p") < col("y.p"))
        .groupBy(col("x.p").as("a"), col("y.p").as("b"))
        .agg(count(lit(1)).as("support"))
        .filter(col("support") >= 2)
        .select(col("a"), col("b"))
    }

    e0().count() // warm-up: JVM/codegen/scan caches, discarded
    val tE0 = time("edge base derive+count (warm)")(e0().count())
    val tWrite = time("bucketed write (32 buckets by a, sorted)") {
      e0().write.mode("overwrite").bucketBy(32, "a").sortBy("a", "b")
        .saveAsTable("graft_edges_probe")
    }
    val tRead = time("bucketed read+count")(
      spark.table("graft_edges_probe").count())

    val qTimes = GraphQueries.map { q =>
      val t = time(q)(graft.SparkEntry.queries(q)(spark, dir).collect())
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      q -> t
    }
    val total = qTimes.map(_._2).sum
    val n = GraphQueries.size
    val recompute = n * tE0
    val shared = tE0 + tWrite + (n - 1) * tRead
    println(f"[edgeprobe] tier total: $total%.1f s over $n queries")
    println(f"[edgeprobe] edge-base share if recomputed per query: " +
      f"${n}x$tE0%.2f = $recompute%.1f s (${100 * recompute / total}%.0f%% " +
      f"of tier total)")
    println(f"[edgeprobe] shared bucketed alternative: derive $tE0%.2f + " +
      f"write $tWrite%.2f + ${n - 1}xread $tRead%.2f = $shared%.1f s")
    println(f"[edgeprobe] potential saving: ${recompute - shared}%.1f s " +
      f"(${100 * (recompute - shared) / total}%.0f%% of tier total)")
    spark.stop()
  }
}
