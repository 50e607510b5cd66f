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
    // derived from SparkEntry.catalogs itself so a newly added sub-catalog
    // can never drift out of this check (round-3 ADVICE: Sources.defs was
    // missing here, so a duplicate name would have been silently dropped by
    // the .toMap in SparkEntry.queries)
    val all = SparkEntry.catalogs.map(_.name)
    assert(all.distinct.sizeIs == all.size,
      all.groupBy(identity).collect { case (n, g) if g.size > 1 => n }.toSeq)
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

  test("q149's grouped top-k plans as partial+final hash aggregation") {
    // the Aggregator's whole point vs the window form: map-side partials
    // (one ObjectHashAggregate BEFORE the exchange, one after) and no Sort
    // over the input — a window row_number plan would show Sort + Window
    val plan = SparkEntry.queries("q149_grouped_topk")(spark, sf())
      .queryExecution.executedPlan.toString
    assert("ObjectHashAggregate".r.findAllIn(plan).size >= 2, plan)
    assert(!plan.contains("Window"), plan)
  }

  test("NO query in the catalog plans a nested-loop or cartesian join") {
    // catalog-wide (not an enumerated list) so every future query is pinned
    // the day it lands — a literal=literal join key or a missing equi-key
    // silently degrades to BroadcastNestedLoopJoin otherwise
    for ((q, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
      val plan = fn(spark, sf()).queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"), s"$q has CartesianProduct")
      assert(!plan.contains("BroadcastNestedLoopJoin"),
        s"$q has BroadcastNestedLoopJoin")
    }
  }

  test("NO window partitions a raw fact scan by an O(1)-cardinality key") {
    // The r10 verdict's one structural debt class: a Window whose partition
    // key has bounded cardinality (event_type/seg/source/lang/…, or no
    // partition at all) sitting DIRECTLY on row-grain data makes each task
    // sort an O(corpus) slice at 100 TB — parallelism capped at |key|
    // regardless of cluster size. The scale-safe shapes this spec accepts:
    //   (a) the partition key includes an unbounded column (user_id, doc_id,
    //       a value column) — parallelism grows with data; or
    //   (b) an Aggregate sits beneath the Window — the frame is value-grain
    //       (q152's distinct-value cumulative-count pattern) or otherwise
    //       pre-collapsed, so partition size is bounded by the value domain,
    //       not by rows.
    //   (c) the optimizer inserted a WindowGroupLimit beneath (a rank-k
    //       filter): per-partition state is O(k) with a partial/final
    //       split, not a full sort — q105's top-3-per-stratum shape; or
    //   (d) a Limit sits beneath — the window input is ≤ a literal k rows
    //       (q164's rank-over-top-20 shape).
    // Boundedness is derived STRUCTURALLY (r12; the r11 form was a bare
    // name list a fresh `bin`/`fold`/`tier` column would slip past — see
    // the planted-case test below): each partition expression is resolved
    // through the plan's Alias definitions to its origin and given a
    // domain-cardinality estimate. Catalog-wide so the class cannot recur
    // silently (the DocsFreshnessSpec stance). Plan-only, no execution.
    // Shapes the per-path walk cannot express, each individually argued:
    //  - q200: its two rank windows run over the ≤20-row candidate-FETCH
    //    join (BM25 top-20 Limit on the key side; the embeddings scan only
    //    supplies one payload row per candidate key). The leaf-path walk
    //    sees the raw embeddings scan and cannot know the equi-join is
    //    key-bounded by the Limit side.
    val allowlisted = Set("q200_hybrid_retrieval")
    val violations = Seq.newBuilder[String]
    for ((q, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)
        if !allowlisted.contains(q)) {
      WindowDiscipline
        .violations(fn(spark, sf()).queryExecution.optimizedPlan)
        .foreach(v => violations += s"$q: $v")
    }
    assert(violations.result().isEmpty,
      "Windows partitioned by an O(1)-cardinality key directly over an " +
        "unaggregated scan — an O(1)-task terabyte sort at 100 TB; use " +
        "the distinct-value-grain cumulative-count pattern (q152) " +
        "instead:\n" + violations.result().mkString("\n"))
  }

  test("the window-discipline walk catches DERIVED bounded keys the name " +
      "list misses (planted bin / tier cases)") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val docs = graft.queries.Tables.documents(spark, sf())
    def flagged(df: org.apache.spark.sql.DataFrame): Seq[String] =
      WindowDiscipline.violations(df.queryExecution.optimizedPlan)
    // a 10-way pmod bucket under a fresh name over the raw scan — the
    // r11 name list passed this silently
    val binned = docs
      .withColumn("bin", pmod(col("doc_id"), lit(10)))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("bin")).orderBy(col("doc_id"))))
    assert(flagged(binned).nonEmpty, "planted pmod bin not flagged")
    // a two-valued CASE tier (all-literal branches) — same trap via when()
    val tiered = docs
      .withColumn("tier", when(col("n_chars") > 100, "long")
        .otherwise("short"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("tier")).orderBy(col("doc_id"))))
    assert(flagged(tiered).nonEmpty, "planted CASE tier not flagged")
    // composite of two bounded derivations stays bounded (product, capped)
    val composite = docs
      .withColumn("bin", pmod(col("doc_id"), lit(4)))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("bin"), col("lang")).orderBy(col("doc_id"))))
    assert(flagged(composite).nonEmpty, "planted bounded composite not flagged")
    // sanity on the safe shapes: an unbounded key passes...
    val byDoc = docs.withColumn("rn", row_number().over(
      Window.partitionBy(col("doc_id")).orderBy(col("n_chars"))))
    assert(flagged(byDoc).isEmpty, "unbounded doc_id key wrongly flagged")
    // ...an aggregate beneath passes even with a bounded key...
    val agg = docs.groupBy(col("lang"), col("n_chars"))
      .agg(count(lit(1)).as("n"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("lang")).orderBy(col("n_chars"))))
    assert(flagged(agg).isEmpty, "aggregate-beneath shape wrongly flagged")
    // ...and a WIDE pmod (>= the parallelism cap, q170's 4096 prefix
    // buckets) is the documented scale-safe decomposition
    val wide = docs
      .withColumn("bkt", pmod(col("doc_id"), lit(4096)))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("bkt")).orderBy(col("doc_id"))))
    assert(flagged(wide).isEmpty, "4096-way bucket wrongly flagged")
  }

  test("NO order-sensitive aggregate folds an UNROUNDED transcendental") {
    // r13, closing the q304 class structurally the way r11 closed the
    // window class: an engine-internal float aggregate (sum/avg/stddev/
    // covar/corr/regr_* over doubles) whose input tree contains an
    // unrounded ln/log/exp/pow differs across engines twice over — each
    // per-element transcendental differs in last ulps (Java Math vs libm)
    // AND the two engines' moment folds run in different orders — so a
    // final round() is a knife-edge, not a guarantee (CLAUDE.md: "only
    // ROUNDED AGGREGATES of transcendentals are comparable"; q304 was the
    // r12 driver-red proof). Snapped inputs (round(...) inside the
    // aggregate, or int64 micro-units) pass; exact-integer/decimal
    // aggregates are skipped by type. Catalog-wide so the class cannot
    // recur silently. Analyzed plan (pre-optimizer), no execution.
    val allowlisted = Set(
      // q111 is rows-only at the driver BY DESIGN (quantile sketch, no
      // DuckDB twin) — its internal percentile fold is not oracle-compared
      "q111_quantile_sketch")
    val violations = Seq.newBuilder[String]
    for ((q, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)
        if !allowlisted.contains(q)) {
      TranscendentalDiscipline
        .violations(fn(spark, sf()).queryExecution.analyzed)
        .foreach(v => violations += s"$q: $v")
    }
    assert(violations.result().isEmpty,
      "order-sensitive aggregates folding unrounded transcendentals — " +
        "snap each ln/exp to int64 micro-units (the q316 recipe) or " +
        "round it inside the aggregate, and fold moments explicitly " +
        "(the q304/q243 r13 recipe):\n" +
        violations.result().mkString("\n"))
  }

  test("the transcendental-discipline walk catches a planted " +
      "regr_slope(ln(x), y) and passes the snapped forms") {
    import org.apache.spark.sql.functions._
    val docs = graft.queries.Tables.documents(spark, sf())
    def flagged(df: org.apache.spark.sql.DataFrame): Seq[String] =
      TranscendentalDiscipline.violations(df.queryExecution.analyzed)
    // the exact q304 r12 shape: engine-internal moment merge over raw lns
    val trap = docs.agg(expr(
      "regr_slope(ln(CAST(n_chars AS DOUBLE)), CAST(doc_id AS DOUBLE))")
      .as("b"))
    assert(flagged(trap).nonEmpty, "planted regr_slope(ln) not flagged")
    // plain sum of raw lns — the same class through the simplest door
    val sumTrap = docs.agg(sum(log(col("n_chars").cast("double"))).as("s"))
    assert(flagged(sumTrap).nonEmpty, "planted sum(ln) not flagged")
    // ...even when a final round() hides it outside the aggregate
    val roundedOutside = docs.agg(
      round(sum(log(col("n_chars").cast("double"))), 4).as("s"))
    assert(flagged(roundedOutside).nonEmpty,
      "round() OUTSIDE the aggregate wrongly accepted")
    // the q316 stance: snap to int64 micro-units -> integer fold, exempt
    val snapped = docs.agg(sum(
      round(log(col("n_chars").cast("double")) * lit(1e6)).cast("long"))
      .as("s"))
    assert(flagged(snapped).isEmpty, "int64-snapped ln wrongly flagged")
    // the round-at-9-inside stance (q324's p): rounded before the fold
    val roundedInside = docs.agg(sum(
      round(exp(-col("n_chars").cast("double")), 9)).as("s"))
    assert(flagged(roundedInside).isEmpty,
      "round() INSIDE the aggregate wrongly flagged")
    // transcendental-free float aggregates stay out of scope
    val plain = docs.agg(sum(col("n_chars").cast("double")).as("s"))
    assert(flagged(plain).isEmpty, "plain double sum wrongly flagged")
  }

  test("join-heavy plans survive a scale-representative broadcast threshold") {
    // At local SFs every join auto-broadcasts (pruned size estimates sit
    // under the 10 MB default), so the sf0.001 no-BNLJ pin alone audits
    // nothing about growth. Re-plan the join-heavy queries at sf0.1 with a
    // 1 MB threshold — dims still fit, facts don't, mirroring the ratio AQE
    // faces at cluster scale — and require: no nested-loop/cartesian
    // fallback anywhere, and the TPC-H shapes keep dim broadcasts while the
    // fact-fact join goes to a shuffle strategy. Planning only, no execution.
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "1048576")
    try {
      for (q <- Seq("q03_join_orders_customer", "q04_join_broadcast_dims",
          "q05_semi_join", "q06_anti_join", "q07_range_join_events",
          "q38_minhash_near_dup", "q41_cosine_topk", "q42_ann_lsh_bucket",
          "q43_ivf_assign", "q47_embedding_near_dup", "q65_tpch_q5_shape",
          "q66_tpch_q3_shape", "q72_tfidf_topk", "q83_contamination",
          "q84_kmeans_iter", "q102_simhash_hamming", "q115_countmin_sketch",
          "q116_bloom_prune", "q119_pagerank_iter", "q120_prefix_filter_join",
          "q122_snapshot_diff", "q130_semantic_dedup", "q131_bm25_topk",
          "q136_triangle_count", "q137_copurchase_similarity",
          "q142_dup_spans", "q171_minimizer_spans", "q172_bpe_merges",
          "q174_label_outliers", "q176_ann_recall", "q179_multiprobe_ivf",
          "q209_moore_lewis", "q210_dsir_weights", "q211_fuzzy_decontam",
          "q213_kneser_ney", "q214_gazetteer_ner")) {
        val plan = SparkEntry.queries(q)(spark, sf("sf0.1"))
          .queryExecution.executedPlan.toString
        assert(!plan.contains("CartesianProduct"), s"$q has CartesianProduct")
        assert(!plan.contains("BroadcastNestedLoopJoin"),
          s"$q has BroadcastNestedLoopJoin")
        if (q.startsWith("q65") || q.startsWith("q66")) {
          assert(plan.contains("BroadcastExchange"), s"$q lost dim broadcasts")
          assert(plan.contains("SortMergeJoin") ||
            plan.contains("ShuffledHashJoin"), s"$q fact join not shuffled")
        }
      }
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("runtime bloom-filter pruning engages on the shuffled fact join") {
    // Spark injects a runtime bloom filter (row-level semi-join pruning of
    // the big scan from the filtered side) only when the application-side
    // scan exceeds spark.sql.optimizer.runtime.bloomFilter.
    // applicationSideScanSizeThreshold — 10 GB by default, i.e. exactly the
    // cluster-scale regime. Scaling both thresholds down to the suite
    // dataset's sizes proves the declarative plan picks it up with no query
    // change: the TPC-H Q5 shape's join gains a bloom_filter_might_contain
    // predicate on the fact scan.
    // thresholds scaled to sf0.001's sizes (the suite's default dataset) so
    // this test needs no larger checkout: lineitem ~110 KB > 10 KB app-side
    // threshold, the filtered orders side sits under the 64 KB creation cap
    val conf = spark.conf
    val keys = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "10240",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "10KB",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "64KB")
    val prev = keys.map { case (k, _) => k -> conf.get(k) }
    keys.foreach { case (k, v) => conf.set(k, v) }
    try {
      val plan = SparkEntry.queries("q65_tpch_q5_shape")(spark, sf())
        .queryExecution.executedPlan.toString
      assert(plan.toLowerCase.contains("bloom"),
        "q65's fact join lost runtime bloom-filter pruning")
    } finally prev.foreach { case (k, v) => conf.set(k, v) }
  }

  test("IVF assignment is a map-side fold: no window, no sort-aggregate") {
    // the nearest-centroid argmin must stay a Project over the one-row
    // broadcast codebook join — a Window or SortAggregate here means the
    // 16x-expansion + shuffle/sort shape regressed (round-3 verdict #3)
    for (q <- Seq("q43_ivf_assign", "q84_kmeans_iter")) {
      val plan = SparkEntry.queries(q)(spark, sf())
        .queryExecution.executedPlan.toString
      assert(!plan.contains("Window"), s"$q plans a Window")
      assert(!plan.contains("SortAggregate"), s"$q plans a SortAggregate")
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

  test("q140's cell probe prunes the IVF store with dynamic partition pruning") {
    // the query's premise IS the storage layout: the probe side must reach
    // the partitioned scan as a dynamicpruning subquery on cid (the cell id
    // is computed at runtime, never a literal), not as a row filter over all
    // 16 cells
    val plan = SparkEntry.queries("q140_ivf_partitioned_store")(spark, sf())
      .queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*dynamicpruning"
      .r.findFirstIn(plan).isDefined, plan)
  }

  test("filter queries push predicates into the parquet scan") {
    val plan = SparkEntry.queries("q02_filter_project")(spark, sf())
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: ["), plan)
    assert(plan.contains("l_quantity"), "quantity filter not pushed")
  }

  test("q112's composed pipeline keeps its fused shape") {
    // the query's premise IS plan shape (CLAUDE.md: pin where shape
    // matters): quality gate pushed into the scan, dedup as an aggregation
    // feeding a LeftSemi hash join, no nested-loop anywhere
    val plan = SparkEntry.queries("q112_pipeline_compose")(spark, sf())
      .queryExecution.executedPlan.toString
    assert(plan.contains("LeftSemi"), "dedup semi-join degraded")
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), "semi-join fell to nested loop")
    assert("PushedFilters: \\[[^\\]]*n_chars".r.findFirstIn(plan).isDefined,
      "quality gate not pushed into the scan")
  }

  test("no query in the catalog plans a ScalaUDF") {
    // the engine's stance: functions.* and native Catalyst Expressions
    // everywhere — even the NER family is a codegen-capable Expression, not
    // a UDF with an encoder round-trip. A ScalaUDF appearing anywhere means
    // a hot path silently fell out of codegen. Detect actual ScalaUDF
    // expression nodes in the executed plan tree (round-4 ADVICE: a bare
    // "UDF" substring match would trip on any alias/relation containing it).
    import org.apache.spark.sql.catalyst.expressions.ScalaUDF
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).filter {
      case (_, fn) =>
        fn(spark, sf()).queryExecution.executedPlan.exists(
          _.expressions.exists(_.exists(_.isInstanceOf[ScalaUDF])))
    }.map(_._1)
    assert(offenders.isEmpty, s"queries planning UDFs: $offenders")
  }

  test("native-expression queries agree between codegen and interpreted eval") {
    // Every custom Expression has two execution paths: doGenCode (hit in
    // normal whole-stage codegen) and eval/nullSafeEval (hit when codegen
    // falls back — wide plans, debug, future Spark changes). A divergence
    // between them is silent corruption, so pin the queries built on the
    // native kernels (MinHash/SimHash/LSH/RollingHash/NerExtract) to equal
    // results under spark.sql.codegen.factoryMode=NO_CODEGEN.
    val targets = Seq("q36_minhash_signatures", "q39_simhash_groups",
      "q42_ann_lsh_bucket", "q48_rolling_fingerprint", "q24_ner_flagship",
      "q41_cosine_topk", "q171_minimizer_spans")
    val codegenOn = targets.map(q =>
      q -> SparkEntry.queries(q)(spark, sf()).collect().toSeq)
    val prev = spark.conf.get("spark.sql.codegen.factoryMode")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      for ((q, expected) <- codegenOn) {
        val interpreted = SparkEntry.queries(q)(spark, sf()).collect().toSeq
        assert(interpreted == expected, s"$q diverges under interpreted eval")
      }
    } finally spark.conf.set("spark.sql.codegen.factoryMode", prev)
  }

  test("q15's HLL estimates stay within the configured relative error") {
    // q15 is rows-only at the driver (HLL sketches differ across engines by
    // construction) — this quantifies the bound locally: rsd = 0.02, so a
    // 4-sigma margin is deterministic on the pinned testdata
    import org.apache.spark.sql.functions._
    val approx = SparkEntry.queries("q15_approx_distinct")(spark, sf())
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val exact = Tables.lineitem(spark, sf())
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("p"),
        countDistinct(col("l_orderkey")).as("o"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(approx.keySet == exact.keySet)
    for ((flag, (ap, ao)) <- approx; (ep, eo) = exact(flag)) {
      assert(math.abs(ap - ep).toDouble / ep <= 4 * 0.02, s"$flag parts: $ap vs $ep")
      assert(math.abs(ao - eo).toDouble / eo <= 4 * 0.02, s"$flag orders: $ao vs $eo")
    }
  }

  test("composite argmax keys are built only through Keys") {
    // round-5 VERDICT #4: ad-hoc zero-padded composite keys carried silent
    // width assumptions (doc_id < 1e10). Keys.asc/desc guard the declared
    // width at runtime; this sweep pins that no query file re-grows its own
    // `lpad(cast …` key outside that helper.
    import java.nio.file.{Files, Paths}
    import scala.jdk.CollectionConverters._
    val root = Paths.get("src/main/scala/graft")
    val offenders = Files.walk(root).iterator().asScala
      .filter(p => p.toString.endsWith(".scala") &&
        !p.getFileName.toString.equals("Keys.scala"))
      .filter { p =>
        val src = new String(Files.readAllBytes(p), "UTF-8").toLowerCase
        src.contains("lpad(cast")
      }
      .map(_.toString).toSeq
    assert(offenders.isEmpty,
      s"ad-hoc lpad composite keys (use graft.queries.Keys): $offenders")
  }

  test("q142's corpus-wide span aggregate is keyed on xxhash64, not raw text") {
    // round-5 VERDICT #3: the 30x-amplified shuffle must exchange 8-byte
    // hash keys; raw span text may only appear in the post-filter recount.
    // The first (upstream-most) aggregate over the exploded spans must
    // therefore group on an xxhash64 key.
    import org.apache.spark.sql.catalyst.expressions.{AttributeReference, XxHash64}
    import org.apache.spark.sql.catalyst.plans.logical.Aggregate
    val plan = SparkEntry.queries("q142_dup_spans")(spark, sf())
      .queryExecution.optimizedPlan
    // the hash key survives optimization as an attribute named "h" computed
    // by an XxHash64 expression somewhere below the aggregate
    assert(plan.exists(_.expressions.exists(_.exists(_.isInstanceOf[XxHash64]))),
      s"no xxhash64 anywhere in q142's plan:\n$plan")
    val hashKeyedAgg = plan.collect { case a: Aggregate => a }.exists(
      _.groupingExpressions.forall {
        case ar: AttributeReference => ar.name == "h"
        case _ => false
      })
    assert(hashKeyedAgg, s"pass-1 span aggregate not keyed on the hash:\n$plan")
  }

  test("persist-using queries release their cached blocks after one action") {
    // round-5 VERDICT #8: Bench/Verify clear caches between queries, but an
    // interactive session calling one catalog query standalone must not leak
    // pinned blocks. Cached.scopedTo releases via a one-shot
    // QueryExecutionListener; the listener bus is async, so poll briefly.
    val cacheUsers = Seq("q38_minhash_near_dup", "q72_tfidf_topk",
      "q83_contamination", "q102_simhash_hamming", "q104_incremental_dedup",
      "q120_prefix_filter_join", "q143_minhash_accuracy",
      "q47_embedding_near_dup", "q130_semantic_dedup")
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
    for (q <- cacheUsers) {
      SparkEntry.queries(q)(spark, sf()).collect()
      val deadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
      while (spark.sparkContext.getPersistentRDDs.nonEmpty &&
          System.nanoTime() < deadline) Thread.sleep(50)
      assert(spark.sparkContext.getPersistentRDDs.isEmpty,
        s"$q left cached blocks pinned after its action completed")
    }
  }

  test("exact dedup keeps one row per distinct text") {
    val df = SparkEntry.queries("q35_exact_dedup")(spark, sf())
    val total = df.count()
    val distinctTexts = Tables.documents(spark, sf())
      .select("text").distinct().count()
    assert(total == distinctTexts)
  }
}

/** Structural window-discipline analyzer (r12). Replaces the r11 bare
  * name list: each Window partition expression is resolved through the
  * plan's Alias definitions to its origin and given a DOMAIN-CARDINALITY
  * estimate; a window is a violation when every partition expression is
  * bounded (product under [[WindowDiscipline.Cap]]) AND some leaf relation
  * reaches it at row grain (no Aggregate / WindowGroupLimit / Limit on
  * that path). Estimation rules:
  *   - literal / no-reference expression → 1 (a de-facto global sort);
  *   - boolean-typed expression → 3 (true/false/null), whatever its refs;
  *   - `pmod(x, k)` / `x % k` with literal k → k-bounded regardless of x
  *     (the `bin` trap);
  *   - CASE WHEN with all-literal branch values → #branches + 1 (the
  *     `tier` trap via when/otherwise);
  *   - an attribute resolves to its Alias definition anywhere in the plan;
  *     a source column falls back to the known-bounded-domain name list
  *     (nominal domain 16);
  *   - any other expression whose references are ALL bounded → capped
  *     product (a deterministic function of bounded inputs is bounded);
  *   - aggregate results and everything else → unbounded (safe: aggregate
  *     paths are cleared by the row-grain walk itself).
  * Bounded means "under [[Cap]]": a >= Cap-way derived bucketing (q170's
  * 4096 md5-prefix buckets) is the documented scale-safe decomposition,
  * not a violation.
  */
/** Structural transcendental-into-aggregate analyzer (r13). A violation is
  * an ORDER-SENSITIVE float aggregate (sum/avg, the variance/stddev
  * family, covar/corr, regr_*) at least one of whose float-typed inputs
  * contains a transcendental (ln/log/exp/pow/trig — NOT sqrt, which IEEE
  * 754 requires correctly rounded) with no Round/BRound between the
  * aggregate input and the transcendental. The walk stops descending at a
  * Round/BRound (everything beneath is snapped — the q316/q324 stances)
  * and skips non-float aggregate inputs entirely (integer/decimal folds
  * are exact, so `round(ln·1e6)::long` sums are exempt by type). Runs on
  * the ANALYZED plan: regr_* and covar are still visible there (the optimizer
  * rewrites them into lower-level moments), and Rounds have not been
  * constant-folded.
  */
private[queries] object TranscendentalDiscipline {
  import org.apache.spark.sql.catalyst.expressions.Expression
  import org.apache.spark.sql.catalyst.expressions.aggregate.AggregateExpression
  import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
  import org.apache.spark.sql.types.{DoubleType, FloatType}

  private val OrderSensitive: Set[String] = Set(
    "sum", "avg", "mean", "stddev", "stddev_pop", "stddev_samp",
    "variance", "var_pop", "var_samp", "skewness", "kurtosis",
    "covar_pop", "covar_samp", "corr")

  private val Transcendental: Set[String] = Set(
    "Log", "Log10", "Log2", "Log1p", "Logarithm", "Exp", "Expm1", "Pow",
    "Sin", "Cos", "Tan", "Asin", "Acos", "Atan", "Atan2", "Sinh", "Cosh",
    "Tanh", "Cbrt")

  private val Snap: Set[String] = Set("Round", "BRound")

  private def unroundedTranscendentals(e: Expression): Seq[String] = {
    val cls = e.getClass.getSimpleName
    if (Snap.contains(cls)) Seq.empty // rounded beneath: snapped
    else {
      val here = if (Transcendental.contains(cls)) Seq(e.sql) else Seq.empty
      here ++ e.children.flatMap(unroundedTranscendentals)
    }
  }

  def violations(plan: LogicalPlan): Seq[String] = {
    val out = Seq.newBuilder[String]
    plan.foreach { node =>
      node.expressions.foreach(_.foreach {
        case ae: AggregateExpression =>
          val fn = ae.aggregateFunction
          val name = fn.prettyName.toLowerCase
          if (OrderSensitive.contains(name) || name.startsWith("regr_")) {
            for (in <- fn.children
                if in.dataType == DoubleType || in.dataType == FloatType;
                t <- unroundedTranscendentals(in))
              out += s"$name(...) folds unrounded $t"
          }
        case _ =>
      })
    }
    out.result().distinct
  }
}

private[queries] object WindowDiscipline {
  import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, CaseWhen, Cast, Expression, ExprId, Literal, Pmod, Remainder}
  import org.apache.spark.sql.catalyst.expressions.aggregate.AggregateExpression
  import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, GlobalLimit, LogicalPlan, WindowGroupLimit, Window => LWindow}
  import org.apache.spark.sql.types.BooleanType

  /** Partition-count floor under which a key is "O(1) vs corpus". */
  val Cap = 256L

  /** Source columns with bounded domains by schema contract (fallback when
    * an attribute has no Alias definition in the plan). */
  val BoundedNames: Set[String] = Set("event_type", "seg", "t", "source",
    "lang", "arm", "o_orderpriority", "o_orderstatus", "l_returnflag",
    "l_linestatus")

  private def litLong(e: Expression): Option[Long] = e match {
    case Literal(v: Int, _) => Some(v.toLong)
    case Literal(v: Long, _) => Some(v)
    case Literal(v: Short, _) => Some(v.toLong)
    case Literal(v: Byte, _) => Some(v.toLong)
    case _ => None
  }

  def violations(plan: LogicalPlan): Seq[String] = {
    val defs: Map[ExprId, Expression] = plan.collect { case node =>
      node.expressions.flatMap(_.collect { case a: Alias => a.exprId -> a.child })
    }.flatten.toMap

    def bound(e: Expression, seen: Set[ExprId]): Option[Long] = e match {
      case _: Literal => Some(1L)
      case a: Alias => bound(a.child, seen)
      case c: Cast => bound(c.child, seen)
      case _: AggregateExpression => None
      case p: Pmod =>
        litLong(p.right).map(k => math.max(1L, math.abs(k)))
          .orElse(generic(p, seen))
      case r: Remainder =>
        litLong(r.right).map(k => math.max(1L, 2L * math.abs(k) - 1L))
          .orElse(generic(r, seen))
      case cw: CaseWhen
          if (cw.branches.map(_._2) ++ cw.elseValue)
            .forall(_.isInstanceOf[Literal]) =>
        Some(cw.branches.size + 1L)
      case a: Attribute =>
        if (seen.contains(a.exprId)) None
        else defs.get(a.exprId) match {
          case Some(d) => bound(d, seen + a.exprId)
          case None => if (BoundedNames.contains(a.name)) Some(16L) else None
        }
      case _ if e.dataType == BooleanType => Some(3L)
      case other => generic(other, seen)
    }

    def generic(e: Expression, seen: Set[ExprId]): Option[Long] = {
      val refs = e.references.toSeq
      if (refs.isEmpty) Some(1L)
      else {
        val bs = refs.map(bound(_, seen))
        if (bs.forall(_.isDefined))
          Some(bs.flatten.foldLeft(1L)((acc, b) => math.min(Cap, acc * b)))
        else None
      }
    }

    // true iff some LEAF relation reaches this point at row grain — i.e.
    // without an Aggregate / WindowGroupLimit / Limit on ITS path. An
    // Aggregate on a sibling join branch (the ubiquitous broadcast
    // pmod-join of an aggregated scalar frame) must NOT whitewash the
    // raw fact side, so this is per-path, not collectFirst-anywhere.
    def rowGrainLeaks(p: LogicalPlan): Boolean = p match {
      case _: Aggregate => false
      case _: WindowGroupLimit => false
      case _: GlobalLimit => false
      case leaf if leaf.children.isEmpty => true
      case other => other.children.exists(rowGrainLeaks)
    }

    val out = Seq.newBuilder[String]
    plan.foreach {
      case w: LWindow =>
        val partBounds = w.partitionSpec.map(bound(_, Set.empty))
        val boundedOnly = partBounds.forall(_.isDefined) &&
          partBounds.flatten.foldLeft(1L)((a, b) => math.min(Cap, a * b)) < Cap
        if (boundedOnly && rowGrainLeaks(w.child)) {
          val partNames =
            w.partitionSpec.flatMap(_.references.toSeq.map(_.name)).distinct
          out += s"Window partitioned by ${
            if (partNames.isEmpty) "NOTHING (global sort / literal)"
            else partNames.mkString(",")
          } (domain estimate ${partBounds.flatten.product})"
        }
      case _ =>
    }
    out.result()
  }
}
