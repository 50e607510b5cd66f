package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.functions._

import graft.functions.HeavyHitters

/** Sketch-backed aggregations: the custom typed Aggregator surface plus
  * exact percentile built-ins.
  */
object Sketches {
  import Tables._

  /** q53: corpus-wide top-20 tokens via the space-saving heavy-hitters
    * Aggregator (capacity 1024 >> distinct tokens here, so the sketch is
    * exact and DuckDB-comparable; at real scale the same plan holds the
    * memory bound instead of exactness).
    */
  private def q53(s: SparkSession, d: String): DataFrame = {
    implicit val seqEnc = ExpressionEncoder[Seq[String]]()
    val words = parallelize(s, documents(s, d))
      .select(split(trim(col("text")), "\\s+").as("ws"))
      .as[Seq[String]](seqEnc)
    val hh = new HeavyHitters.TopK(1024).toColumn
    words.select(hh.name("hh"))
      .select(explode(col("hh")).as(Seq("token", "cnt")))
      .orderBy(col("cnt").desc, col("token"))
      .limit(20)
  }

  private val o53 = """
    SELECT w AS token, count(*) AS cnt
    FROM (SELECT unnest(string_split_regex(trim(text), '\s+')) AS w
          FROM documents)
    GROUP BY w ORDER BY cnt DESC, token LIMIT 20"""

  /** q54: exact interpolated percentiles per group (Spark `percentile` =
    * DuckDB `quantile_cont`, both linear-interpolation on the sorted set).
    */
  private def q54(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(
        round(expr("percentile(l_extendedprice, 0.5D)"), 4).as("p50_price"),
        round(expr("percentile(l_extendedprice, 0.9D)"), 4).as("p90_price"),
        round(expr("percentile(l_quantity, 0.25D)"), 4).as("p25_qty"))
      .orderBy(col("l_returnflag"))

  private val o54 = """
    SELECT l_returnflag,
           round(quantile_cont(l_extendedprice, 0.5), 4) AS p50_price,
           round(quantile_cont(l_extendedprice, 0.9), 4) AS p90_price,
           round(quantile_cont(l_quantity, 0.25), 4) AS p25_qty
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q53_heavy_hitters", q53, Some(o53)),
    QueryDef("q54_percentiles", q54, Some(o54)))
}
