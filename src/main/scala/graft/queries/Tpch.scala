package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** TPC-H-shaped multi-join workloads — the join-graph complexity tier above
  * the 2-3-table joins in `Rel`: Catalyst must order a 6-table join with two
  * broadcast dimensions and cross-table filter pushdown.
  */
object Tpch {
  import Tables._

  /** q65 (Q5 shape): local-supplier revenue per nation within one region and
    * one order-date year. Six tables; nation/region broadcast.
    */
  private def q65(s: SparkSession, d: String): DataFrame =
    customer(s, d)
      .join(orders(s, d), col("c_custkey") === col("o_custkey"))
      .join(lineitem(s, d), col("o_orderkey") === col("l_orderkey"))
      .join(supplier(s, d),
        col("l_suppkey") === col("s_suppkey") &&
        col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(nation(s, d)), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(region(s, d)), col("n_regionkey") === col("r_regionkey"))
      .filter(col("r_name") === "ASIA" &&
        col("o_orderdate") >= lit("1996-01-01").cast("timestamp_ntz") &&
        col("o_orderdate") < lit("1998-01-01").cast("timestamp_ntz"))
      .groupBy(col("n_name"))
      .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 4)
        .as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))

  private val o65 = """
    SELECT n_name,
           round(sum(l_extendedprice * (1.0 - l_discount)), 4) AS revenue
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1998-01-01'
    GROUP BY n_name ORDER BY revenue DESC, n_name"""

  /** q66 (Q3 shape): shipping-priority — top 10 open-order revenues for one
    * market segment.
    */
  private def q66(s: SparkSession, d: String): DataFrame =
    customer(s, d)
      .filter(col("c_mktsegment") === "BUILDING")
      .join(orders(s, d), col("c_custkey") === col("o_custkey"))
      .join(lineitem(s, d), col("o_orderkey") === col("l_orderkey"))
      .filter(
        col("o_orderdate") < lit("1998-03-15").cast("timestamp_ntz") &&
        col("l_shipdate") > lit("1998-03-15").cast("timestamp_ntz"))
      .groupBy(col("l_orderkey"), col("o_orderdate"))
      .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 4)
        .as("revenue"))
      .orderBy(col("revenue").desc, col("o_orderdate"), col("l_orderkey"))
      .limit(10)

  private val o66 = """
    SELECT l_orderkey, o_orderdate,
           round(sum(l_extendedprice * (1.0 - l_discount)), 4) AS revenue
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15'
      AND l_shipdate > TIMESTAMP '1998-03-15'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY revenue DESC, o_orderdate, l_orderkey LIMIT 10"""

  /** q67: subquery forms — scalar subquery in WHERE, correlated EXISTS, and
    * IN-subquery, through the SQL front end.
    */
  private def q67(s: SparkSession, d: String): DataFrame = {
    customer(s, d).createOrReplaceTempView("graft_sq_customer")
    orders(s, d).createOrReplaceTempView("graft_sq_orders")
    s.sql("""
      SELECT c_custkey, c_acctbal
      FROM graft_sq_customer
      WHERE c_acctbal > (SELECT avg(c_acctbal) * 1.8 FROM graft_sq_customer)
        AND EXISTS (SELECT 1 FROM graft_sq_orders
                    WHERE o_custkey = c_custkey AND o_totalprice > 100000)
        AND c_custkey IN (SELECT o_custkey FROM graft_sq_orders
                          WHERE o_orderstatus = 'O')
      ORDER BY c_custkey""")
  }

  private val o67 = """
    SELECT c_custkey, c_acctbal
    FROM customer
    WHERE c_acctbal > (SELECT avg(c_acctbal) * 1.8 FROM customer)
      AND EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_totalprice > 100000)
      AND c_custkey IN (SELECT o_custkey FROM orders
                        WHERE o_orderstatus = 'O')
    ORDER BY c_custkey"""

  /** q223 (Q8 shape): national market share — the catalog's widest join
    * tree (8 relations, `nation` twice under distinct roles: customer's
    * region gate and supplier's nationality), with a conditional-share
    * aggregation per order year. The canonical join-order stress shape:
    * the selective `p_type` filter must reach the part scan and drive the
    * fact join order; all four dimension joins broadcast; the two fact-fact
    * joins (part-filtered lineitem → orders) shuffle on their keys. The
    * share divides two unrounded same-group sums (relative ulp error
    * ~1e-15), rounded at 6.
    */
  private def q223(s: SparkSession, d: String): DataFrame = {
    val n1 = nation(s, d)
      .select(col("n_nationkey").as("cnk"), col("n_regionkey"))
    val n2 = nation(s, d)
      .select(col("n_nationkey").as("snk"), col("n_name").as("supp_nation"))
    val vol = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
    part(s, d).filter(col("p_type") === "PROMO")
      .join(lineitem(s, d), col("p_partkey") === col("l_partkey"))
      .join(orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .join(customer(s, d), col("o_custkey") === col("c_custkey"))
      .join(supplier(s, d), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(n1), col("c_nationkey") === col("cnk"))
      .join(broadcast(region(s, d)), col("n_regionkey") === col("r_regionkey"))
      .join(broadcast(n2), col("s_nationkey") === col("snk"))
      .filter(col("r_name") === "AMERICA" &&
        col("o_orderdate") >= lit("1996-01-01").cast("timestamp_ntz") &&
        col("o_orderdate") < lit("1998-01-01").cast("timestamp_ntz"))
      .groupBy(year(col("o_orderdate")).as("o_year"))
      .agg(
        round(sum(when(col("supp_nation") === "NATION_3", vol)
          .otherwise(0.0)) / sum(vol), 6).as("mkt_share"),
        round(sum(vol), 4).as("total_volume"))
      .orderBy(col("o_year"))
  }

  private val o223 = """
    SELECT CAST(year(o_orderdate) AS INT) AS o_year,
           round(sum(CASE WHEN n2.n_name = 'NATION_3'
                     THEN l_extendedprice * (1.0 - l_discount)
                     ELSE 0.0 END)
                 / sum(l_extendedprice * (1.0 - l_discount)), 6) AS mkt_share,
           round(sum(l_extendedprice * (1.0 - l_discount)), 4)
             AS total_volume
    FROM part
    JOIN lineitem ON p_partkey = l_partkey
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation n1 ON c_nationkey = n1.n_nationkey
    JOIN region ON n1.n_regionkey = r_regionkey
    JOIN nation n2 ON s_nationkey = n2.n_nationkey
    WHERE p_type = 'PROMO' AND r_name = 'AMERICA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1998-01-01'
    GROUP BY o_year ORDER BY o_year"""

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q223_tpch_q8_shape", q223, Some(o223)),
    QueryDef("q65_tpch_q5_shape", q65, Some(o65)),
    QueryDef("q66_tpch_q3_shape", q66, Some(o66)),
    QueryDef("q67_subquery_forms", q67, Some(o67)))
}
