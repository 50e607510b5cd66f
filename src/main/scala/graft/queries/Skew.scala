package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Key-salting for skewed equi-joins: when a handful of hot keys dominate a
  * join, one reducer gets the whole hot partition. Salting splits each hot
  * key across `salts` sub-partitions (left side: deterministic salt from a
  * row-unique column; right side: replicated to every salt), restoring
  * balance at the cost of a `salts`-times-replicated build side.
  *
  * This is the manual fallback for the cases AQE's skew-join splitting
  * (`spark.sql.adaptive.skewJoin.enabled`, on by default in every session
  * this engine builds) can't fix — e.g. skewed *aggregation* inputs or
  * non-sort-merge joins. Result is EXACTLY the plain join's (proven in
  * `SkewSpec`).
  */
object Skew {

  /** Equi-join `left` to `right` on `keys`, salted `salts` ways.
    *
    * @param saltBy a left-side column that varies within hot keys (any
    *               row-level column works; uniqueness is not required, only
    *               spread)
    */
  def saltedEquiJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      salts: Int,
      saltBy: Column): DataFrame = {
    require(salts > 0)
    val l = left.withColumn("__graft_salt",
      pmod(xxhash64(saltBy), lit(salts.toLong)).cast("int"))
    val r = right.withColumn("__graft_salt",
      explode(array((0 until salts).map(lit): _*)))
    l.join(r, keys :+ "__graft_salt").drop("__graft_salt")
  }

  import Tables._

  /** q110: the salted join, driver-checked — orders x customer through
    * [[saltedEquiJoin]] (8 salts: the orders side hashes o_orderkey into a
    * salt, the customer side replicates x 8), rolled up per market segment.
    * The oracle is the PLAIN join, so the hash-compare proves salting is
    * result-invariant — the property `SkewSpec` asserts locally, now pinned
    * by the driver at every sf. The join spreads each hot customer key over
    * 8 reducers at the cost of an 8x-replicated (still broadcastable-or-
    * bucketed) build side.
    */
  private def q110(s: SparkSession, d: String): DataFrame = {
    val l = orders(s, d).select(col("o_custkey").as("custkey"),
      col("o_totalprice"), col("o_orderkey"))
    val r = customer(s, d).select(col("c_custkey").as("custkey"),
      col("c_mktsegment"))
    saltedEquiJoin(l, r, Seq("custkey"), 8, col("o_orderkey"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_orders"),
        round(sum(col("o_totalprice")), 2).as("revenue"))
      .orderBy(col("c_mktsegment"))
  }

  private val o110 = """
    SELECT c_mktsegment, count(*) AS n_orders,
           round(sum(o_totalprice), 2) AS revenue
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment ORDER BY c_mktsegment"""

  /** q154: key-distribution skew audit — the diagnostic a pipeline runs
    * BEFORE deciding whether q110's salting (or AQE skew splitting) is even
    * needed: per-key cardinalities rolled up into the max/avg skew ratio,
    * tail percentiles, and the hottest key. Two hash aggregations (key grain
    * → one stats row); the hottest key is a tie-free argmax on a zero-padded
    * (count DESC, key ASC) composite string so both engines pick the same
    * key deterministically. The key-grain aggregate is exactly the map the
    * salting decision needs (which keys exceed avg x factor), so at 100 TB
    * this query IS the planning pass, not an approximation of it. (The one
    * piece that grows with DISTINCT keys is the exact p99 over key-grain
    * counts; a corpus with billions of keys swaps it for the bounded-memory
    * quantile-sketch Aggregator — q111 — without touching the rest.)
    */
  private def q154(s: SparkSession, d: String): DataFrame = {
    val counts = lineitem(s, d)
      .groupBy(col("l_partkey")).agg(count(lit(1)).as("cnt"))
    // composite argmax key: larger cnt wins, then SMALLER partkey — the
    // descending component inverts so lexicographic max is (cnt DESC, key ASC)
    val akey = Keys.key(Keys.asc("cnt", 12), Keys.desc("l_partkey", 12))
    counts.agg(
      count(lit(1)).as("n_keys"),
      sum(col("cnt")).cast("long").as("total_rows"),
      max(col("cnt")).as("max_cnt"),
      round(avg(col("cnt")), 4).as("avg_cnt"),
      expr("percentile(cnt, 0.99D)").as("p99_cnt"),
      round(max(col("cnt")) / avg(col("cnt")), 4).as("skew_ratio"),
      expr(s"max_by(l_partkey, $akey)").as("hottest_key"))
      .select(col("n_keys"), col("total_rows"), col("max_cnt"),
        col("avg_cnt"), round(col("p99_cnt"), 4).as("p99_cnt"),
        col("skew_ratio"), col("hottest_key"))
  }

  private val o154 = s"""
    WITH counts AS (
      SELECT l_partkey, count(*) AS cnt FROM lineitem GROUP BY l_partkey)
    SELECT count(*) AS n_keys,
           CAST(sum(cnt) AS BIGINT) AS total_rows,
           max(cnt) AS max_cnt,
           round(avg(cnt), 4) AS avg_cnt,
           round(quantile_cont(cnt, 0.99), 4) AS p99_cnt,
           round(max(cnt) / avg(cnt), 4) AS skew_ratio,
           arg_max(l_partkey, ${Keys.oKey(Keys.oAsc("cnt", 12),
             Keys.oDesc("l_partkey", 12))})
             AS hottest_key
    FROM counts"""

  /** q202: join-key skew report — the diagnostic you run BEFORE choosing a
    * skew mitigation (q110's salting, AQE skew-join): the o_custkey
    * frequency distribution of the orders side of the q03 join, as key
    * count, max/median/p99 per-key frequencies, the max:median ratio, and
    * the heaviest key's row share. One corpus-scale key-frequency
    * aggregation; percentiles and the argmax run over the KEY dimension.
    * The max-frequency key is picked tie-free via struct max (freq, key).
    */
  private def q202(s: SparkSession, d: String): DataFrame = {
    val freq = orders(s, d)
      .groupBy(col("o_custkey")).agg(count(lit(1)).as("f"))
    val tot = orders(s, d).agg(count(lit(1)).as("n_rows"))
      .withColumn("jk", pmod(col("n_rows"), col("n_rows")))
    freq.agg(
        count(lit(1)).as("n_keys"),
        max(col("f")).cast("long").as("max_freq"),
        expr("percentile(f, 0.5D)").as("p50_freq"),
        expr("percentile(f, 0.99D)").as("p99_freq"),
        max(struct(col("f"), col("o_custkey"))).getField("o_custkey")
          .as("top_key"))
      .withColumn("jk", pmod(col("n_keys"), col("n_keys")))
      .join(broadcast(tot), Seq("jk"))
      .select(col("n_keys"), col("max_freq"),
        round(col("p50_freq"), 4).as("p50_freq"),
        round(col("p99_freq"), 4).as("p99_freq"),
        round(col("max_freq") / col("p50_freq"), 4).as("skew_ratio"),
        col("top_key"),
        round(col("max_freq") / col("n_rows").cast("double"), 6)
          .as("top_key_share"))
  }

  private val o202 = s"""
    WITH freq AS (SELECT o_custkey, count(*) AS f FROM orders
                  GROUP BY o_custkey),
    tot AS (SELECT count(*) AS n_rows FROM orders),
    agg AS (
      SELECT count(*) AS n_keys,
             CAST(max(f) AS BIGINT) AS max_freq,
             quantile_cont(f, 0.5) AS p50_freq,
             quantile_cont(f, 0.99) AS p99_freq,
             arg_max(o_custkey, ${Keys.oKey(Keys.oAsc("f", 12),
               Keys.oAsc("o_custkey", 12))}) AS top_key
      FROM freq)
    SELECT n_keys, max_freq,
           round(p50_freq, 4) AS p50_freq, round(p99_freq, 4) AS p99_freq,
           round(max_freq / p50_freq, 4) AS skew_ratio,
           top_key,
           round(max_freq / CAST(n_rows AS DOUBLE), 6) AS top_key_share
    FROM agg, tot"""

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q202_skew_report", q202, Some(o202)),
    QueryDef("q110_salted_join", q110, Some(o110)),
    QueryDef("q154_skew_audit", q154, Some(o154)))
}
