package graft.functions

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.SparkTestBase
import graft.queries.Tables

class RollingHashSpec extends SparkTestBase {

  test("kernel matches a hand-rolled fold, including multibyte codepoints") {
    def ref(s: String): Long =
      s.codePoints().toArray.foldLeft(0L)((a, cp) => (a * 31 + cp) % 1000000007L)
    for (s <- Seq("", "a", "hello world", "早上好 spark", "éclair ##db"))
      assert(RollingHashExpression.compute(UTF8String.fromString(s)) == ref(s))
  }

  test("expression agrees with the HOF formulation and stays in codegen") {
    val df = Tables.documents(spark, sf())
      .select(
        col("doc_id"),
        RollingHashExpression.rollingHash(col("text")).as("native"),
        aggregate(sequence(lit(1), length(col("text"))), lit(0L),
          (acc, i) => (acc * 31L + ascii(col("text").substr(i, lit(1)))
            .cast("long")) % 1000000007L).as("hof"))
    assert(df.filter(col("native") =!= col("hof")).count() == 0)
    // alone, the native expression stays inside a whole-stage-codegen stage
    // (the interpreted HOF formulation above would knock the projection out)
    val alone = Tables.documents(spark, sf())
      .select(RollingHashExpression.rollingHash(col("text")).as("native"))
    val plan = alone.queryExecution.executedPlan
    assert(plan.toString.contains("*(1)"), plan.toString)
    assert(plan.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }.nonEmpty, plan.toString)
  }

  test("null input yields null") {
    val r = spark.sql("SELECT 1")
      .select(RollingHashExpression.rollingHash(lit(null.asInstanceOf[String])))
      .head
    assert(r.isNullAt(0))
  }
}
