package graft.queries

import graft.{SparkEntry, SparkTestBase}

/** Smoke + contract coverage of the declared query catalog at sf0.001.
  * The value-level correctness gate is the driver's DuckDB oracle (and
  * `tools/compare.py` locally); these tests pin the contract shape and a few
  * structural facts that survive refactors.
  */
class CatalogSpec extends SparkTestBase {

  test("oracleSql keys are a subset of queries keys") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle entries without queries: $missing")
  }

  test("catalog names are unique across sub-catalogs") {
    val all = Seq(Rel.defs, NerQueries.defs, TextOps.defs, Dedup.defs,
      Vec.defs, Multimodal.defs, Events.defs, Sketches.defs, Variety.defs,
      Tpch.defs, Corpus.defs).flatten.map(_.name)
    assert(all.distinct.sizeIs == all.size)
  }

  test("every declared query executes at sf0.001") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try { fn(spark, sf()).collect(); None }
        catch { case e: Throwable => Some(s"$name: ${e.getMessage}") }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("entry() returns rows with the NER result schema") {
    val df = SparkEntry.entry(spark)
    val rows = df.collect()
    assert(rows.length > 0)
    val entField = df.schema("entities").dataType.simpleString
    assert(entField == "array<struct<entity:string,label:string>>")
  }

  test("top-k and bucket queries produce bounded, non-empty output") {
    assert(SparkEntry.queries("q10_topk_parts")(spark, sf()).count() == 10L)
    assert(SparkEntry.queries("q41_cosine_topk")(spark, sf()).count() == 10L)
    assert(SparkEntry.queries("q37_lsh_band_stats")(spark, sf()).count() == 2L)
  }

  test("similarity plans use broadcast hash joins, not nested-loop cartesians") {
    for (q <- Seq("q41_cosine_topk", "q42_ann_lsh_bucket", "q43_ivf_assign",
        "q38_minhash_near_dup", "q72_tfidf_topk", "q83_contamination",
        "q84_kmeans_iter")) {
      val plan = SparkEntry.queries(q)(spark, sf())
        .queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"), s"$q has CartesianProduct")
      assert(!plan.contains("BroadcastNestedLoopJoin"),
        s"$q has BroadcastNestedLoopJoin")
    }
  }

  test("q88's bucketed join has no Exchange on either join input") {
    // disable auto-broadcast so the plan shows the bucket join itself (at
    // tiny SF the customer side would otherwise broadcast and the
    // co-location claim would go untested)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plan = SparkEntry.queries("q88_bucketed_join")(spark, sf())
        .queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning(o_custkey"), plan)
      assert(!plan.contains("Exchange hashpartitioning(c_custkey"), plan)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("q100 plans as a recursive UnionLoop, not a rewritten union/join") {
    val plan = SparkEntry.queries("q100_recursive_cte")(spark, sf())
      .queryExecution.executedPlan.toString
    assert(plan.contains("UnionLoop"), plan)
  }

  test("q99's lang filter prunes partitions rather than filtering rows") {
    val plan = SparkEntry.queries("q99_partitioned_pruning")(spark, sf())
      .queryExecution.executedPlan.toString
    // the lang predicate must appear INSIDE the PartitionFilters list —
    // merely containing both substrings would also pass for a row filter
    assert("PartitionFilters: \\[[^\\]]*lang".r.findFirstIn(plan).isDefined,
      plan)
  }

  test("filter queries push predicates into the parquet scan") {
    val plan = SparkEntry.queries("q02_filter_project")(spark, sf())
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: ["), plan)
    assert(plan.contains("l_quantity"), "quantity filter not pushed")
  }

  test("exact dedup keeps one row per distinct text") {
    val df = SparkEntry.queries("q35_exact_dedup")(spark, sf())
    val total = df.count()
    val distinctTexts = Tables.documents(spark, sf())
      .select("text").distinct().count()
    assert(total == distinctTexts)
  }
}
