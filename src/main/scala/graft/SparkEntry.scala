package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ner.Ner
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the full driver-checkable catalog: one named query per
  * operator in SURVEY.md §2 plus the LLM-data-pipeline extras. `oracleSql`
  * carries the equivalent DuckDB SQL for the hash-compare at sf0.01; queries
  * without an entry (approx sketches, UDF-stubbed paths) get the weaker
  * rows-only check.
  */
object SparkEntry {
  private[graft] def catalogs: Seq[QueryDef] =
    Rel.defs ++ NerQueries.defs ++ TextOps.defs ++ Dedup.defs ++ Vec.defs ++ Multimodal.defs ++ Events.defs ++ Sketches.defs ++ Variety.defs ++ Tpch.defs ++ Corpus.defs ++ Sources.defs ++ Skew.defs ++ Indexing.defs ++ Graph.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0:
    * the reference's headline UX — extract entities from a table's text
    * column (`docs/README.md:8`).
    */
  def entry(spark: SparkSession): DataFrame = {
    Ner.register(spark)
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), Ner.ner(col("text")).as("entities"),
        col("lang"), col("n_chars"))
      .orderBy(col("doc_id"))
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    catalogs.map(q => q.name -> q.spark).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    catalogs.flatMap(q => q.oracle.map(o => q.name -> o.trim)).toMap
}
