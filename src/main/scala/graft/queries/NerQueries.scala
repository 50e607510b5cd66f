package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ner.Ner

/** The reference's flagship surface as driver-checkable queries: `ner()` /
  * `ner_extract()` over `documents.text` (`docs/README.md:8`). With no model
  * configured (the driver's state), every row yields `[]` — exactly the
  * reference's tested no-model semantics (`test/sql/ner.test:20-24`), which
  * plain DuckDB can oracle as an empty typed list literal.
  */
object NerQueries {
  import Tables._

  /** `SELECT doc_id, ner(text) ...` via the DataFrame API entry point. */
  private def flagship(s: SparkSession, d: String): DataFrame = {
    Ner.register(s)
    documents(s, d)
      .select(col("doc_id"), Ner.ner(col("text")).as("entities"))
      .orderBy(col("doc_id"))
  }

  private val oFlagship = """
    SELECT doc_id,
           CAST([] AS STRUCT(entity VARCHAR, label VARCHAR)[]) AS entities
    FROM documents ORDER BY doc_id"""

  /** The SQL registration path + alias + 2-arg arity in one query. */
  private def extract2(s: SparkSession, d: String): DataFrame = {
    Ner.register(s)
    documents(s, d).createOrReplaceTempView("graft_documents_ner")
    s.sql("""SELECT doc_id, ner_extract(text, true) AS entities
             FROM graft_documents_ner ORDER BY doc_id""")
  }

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q24_ner_flagship", flagship, Some(oFlagship)),
    QueryDef("q25_ner_extract_sql", extract2, Some(oFlagship)))
}
