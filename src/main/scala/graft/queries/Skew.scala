package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
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
}
