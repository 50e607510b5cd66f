package graft.queries

import graft.{SparkEntry, SparkTestBase}

/** Output-level invariants for queries whose CORRECTNESS gate (hash-match
  * vs the oracle) cannot express their defining algebraic property — the
  * oracle agrees on the numbers, these prove the numbers mean what the
  * operator claims.
  */
class InvariantSpec extends SparkTestBase {

  test("q228 waterfilling: allocations exhaust the budget, caps consistent") {
    val rows = SparkEntry.queries("q228_token_waterfill")(spark, sf())
      .collect()
    assert(rows.nonEmpty)
    val budget = rows.head.getAs[Long]("budget")
    val tau = rows.head.getAs[Double]("tau")
    // Σ min(n_i, τ) = B is the waterfilling DEFINITION; per-source allocs
    // are rounded at 6, so the sum may drift by ≤ #sources · 5e-7
    val total = rows.map(_.getAs[Double]("alloc")).sum
    assert(math.abs(total - budget) <= rows.length * 5e-7 + 1e-6,
      s"sum(alloc)=$total != budget=$budget")
    rows.foreach { r =>
      val n = r.getAs[Long]("n_tokens")
      val alloc = r.getAs[Double]("alloc")
      if (r.getAs[Boolean]("capped")) {
        assert(n > tau && math.abs(alloc - tau) <= 5e-7)
      } else {
        assert(alloc == n.toDouble && n <= tau + 5e-7)
      }
    }
  }

  test("q216 OHLC bars: low <= open,close <= high; volume consistent") {
    val rows = SparkEntry.queries("q216_ohlc_bars")(spark, sf()).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (o, h, l, c) = (r.getAs[Double]("open"), r.getAs[Double]("high"),
        r.getAs[Double]("low"), r.getAs[Double]("close"))
      assert(l <= o && o <= h, r.toString)
      assert(l <= c && c <= h, r.toString)
      assert(r.getAs[Long]("n_events") > 0)
    }
  }

  test("q234 sketch join estimate: one-sided (est >= true) at every depth") {
    val rows = SparkEntry.queries("q234_join_cardinality_sketch")(spark, sf())
      .collect()
    assert(rows.nonEmpty)
    val truth = rows.head.getAs[Long]("true_size")
    rows.foreach { r =>
      assert(r.getAs[Long]("est_d") >= truth, r.toString)
      assert(r.getAs[Long]("est_min") >= truth, r.toString)
      assert(r.getAs[Double]("over_factor") >= 1.0, r.toString)
    }
  }

  test("q237 stickiness: dau <= wau, ratio in (0, 1]") {
    val rows = SparkEntry.queries("q237_dau_wau_stickiness")(spark, sf())
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (dau, wau) = (r.getAs[Long]("dau"), r.getAs[Long]("wau"))
      assert(dau >= 1 && dau <= wau, r.toString)
      val st = r.getAs[Double]("stickiness")
      assert(st > 0.0 && st <= 1.0, r.toString)
    }
  }

  test("q229 incremental rollup: every month matches the full recompute") {
    val rows = SparkEntry.queries("q229_incremental_rollup")(spark, sf())
      .collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getAs[Boolean]("matches_full"), r.toString))
  }

  /** Shared shape of the q274/q275 survivor-shift audits: kept ≤ total,
    * removal_rate in [0,1], each share column a distribution (sums to 1 up
    * to the per-row rounding budget), shift = after − before.
    */
  private def assertShiftAudit(name: String, totalCol: String,
      keptCol: String, removedCol: String): Unit = {
    val rows = SparkEntry.queries(name)(spark, sf()).collect()
    assert(rows.nonEmpty)
    val eps = rows.length * 5e-7 + 1e-6
    rows.foreach { r =>
      val (tot, kept) = (r.getAs[Long](totalCol), r.getAs[Long](keptCol))
      assert(kept >= 0 && kept <= tot, r.toString)
      assert(r.getAs[Long](removedCol) == tot - kept, r.toString)
      val rate = r.getAs[Double]("removal_rate")
      assert(rate >= 0.0 && rate <= 1.0, r.toString)
      assert(math.abs(r.getAs[Double]("share_shift")
        - (r.getAs[Double]("share_after")
          - r.getAs[Double]("share_before"))) <= 1e-6, r.toString)
    }
    Seq("share_before", "share_after").foreach { c =>
      val s = rows.map(_.getAs[Double](c)).sum
      assert(math.abs(s - 1.0) <= eps, s"sum($c)=$s != 1")
    }
  }

  test("q274 dedup survivor shift: shares are distributions, kept <= docs") {
    assertShiftAudit("q274_dedup_shift", "n_docs", "n_kept", "n_removed")
  }

  test("q275 segment survivor shift: shares are distributions, kept <= segs") {
    assertShiftAudit("q275_segment_dedup_shift", "segs", "kept", "removed")
  }

  test("q276 pipeline funnel: monotone per-language attrition, exact stage 0") {
    val rows = SparkEntry.queries("q276_pipeline_funnel")(spark, sf())
      .collect()
    assert(rows.nonEmpty)
    val byLang = rows.groupBy(_.getAs[String]("lang"))
    byLang.foreach { case (lang, rs) =>
      val stages = rs.sortBy(_.getAs[Int]("stage"))
      assert(stages.head.getAs[Int]("stage") == 0, s"$lang missing stage 0")
      assert(stages.head.getAs[Double]("doc_frac") == 1.0)
      assert(stages.head.getAs[Double]("tok_frac") == 1.0)
      // cumulative filters: docs and tokens can only shrink stage over stage
      stages.sliding(2).foreach {
        case Array(a, b) =>
          assert(b.getAs[Long]("docs") <= a.getAs[Long]("docs"),
            s"$lang docs grew: $a -> $b")
          assert(b.getAs[Long]("toks") <= a.getAs[Long]("toks"),
            s"$lang toks grew: $a -> $b")
        case _ => ()
      }
      stages.foreach { r =>
        assert(r.getAs[Double]("doc_frac") > 0.0
          && r.getAs[Double]("doc_frac") <= 1.0, r.toString)
        assert(r.getAs[Double]("tok_frac") > 0.0
          && r.getAs[Double]("tok_frac") <= 1.0, r.toString)
      }
    }
  }

  /** The broadcast-scalar join keys (`pmod(coalesce(stat, 0), 1)`) must
    * stay non-NULL when the statistic itself degenerates to NULL — both
    * engines NULL the value, but only a NULL JOIN KEY silently drops every
    * output row while the oracle's CROSS JOIN keeps them (round-10
    * ADVICE). The shared testdata never produces the degenerate inputs, so
    * these tests synthesize them.
    */
  private def withTempDir(f: String => Unit): Unit = {
    val dir = java.nio.file.Files.createTempDirectory("graft-degen")
    try f(dir.toString)
    finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(dir).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.deleteIfExists(_))
    }
  }

  test("q249 CUPED degenerate var_pop(x)=0: arms survive with NULL theta") {
    withTempDir { dir =>
      import spark.implicits._
      // every user has the same pre-period sum (value constant) -> theta =
      // covar/0 -> NULL on both engines; ystar and var_reduction go NULL too
      val t1 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
      val t2 = java.sql.Timestamp.valueOf("2024-01-09 00:00:00")
      (1L to 4L).flatMap(u => Seq((u * 2 - 1, t1, u, "view", 5.0, "{}"),
          (u * 2, t2, u, "view", 5.0, "{}")))
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .write.parquet(s"$dir/events.parquet")
      val rows = SparkEntry.queries("q249_cuped")(spark, dir).collect()
      assert(rows.length == 2, s"degenerate CUPED dropped rows: got " +
        s"${rows.length}, want one per arm")
      rows.foreach { r =>
        assert(r.isNullAt(r.fieldIndex("theta")), r.toString)
        assert(r.isNullAt(r.fieldIndex("var_reduction")), r.toString)
        assert(r.getAs[Double]("mean_y_raw") == 5.0, r.toString)
      }
    }
  }

  test("q163 z-screen degenerate sd=0: constant stratum drops, no throw") {
    withTempDir { dir =>
      import spark.implicits._
      // all docs the same length -> stddev_samp = 0.0 exactly; DuckDB's
      // (x-m)/0 -> NULL fails the |z| gate, Spark must NULL via the guard
      // instead of raising ANSI DIVIDE_BY_ZERO
      Seq((1L, "aa bb", "en", "web", 5L), (2L, "cc dd", "en", "web", 5L),
          (3L, "ee ff", "en", "web", 5L))
        .toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.parquet(s"$dir/documents.parquet")
      val rows = SparkEntry.queries("q163_zscore_screen")(spark, dir)
        .collect()
      assert(rows.isEmpty, s"constant stratum flagged: ${rows.toSeq}")
    }
  }

  test("q187/q258 degenerate events: zero conversions and zero variance") {
    withTempDir { dir =>
      import spark.implicits._
      // values constant and far below the q187 conversion threshold:
      // pooled rate = 0 (z NULL) and per-type var_pop = 0 (R^2 NULL)
      val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
      (1L to 6L).map(i => (i, new java.sql.Timestamp(t0 + i * 86400000L),
          i, "purchase", 5.0, "{}"))
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .write.parquet(s"$dir/events.parquet")
      val ab = SparkEntry.queries("q187_ab_test")(spark, dir).collect()
      assert(ab.length == 1)
      assert(ab.head.getAs[Long]("conv_a") == 0L
        && ab.head.getAs[Long]("conv_b") == 0L, ab.head.toString)
      assert(ab.head.isNullAt(ab.head.fieldIndex("z")), ab.head.toString)
      val wk = SparkEntry.queries("q258_weekly_decomposition")(spark, dir)
        .collect()
      assert(wk.nonEmpty, "constant-value type dropped from decomposition")
      wk.foreach { r =>
        assert(r.isNullAt(r.fieldIndex("seasonal_r2")), r.toString)
      }
    }
  }

  test("q287 KW degenerate all-tied values: H=0, tie-corrected H is NULL") {
    withTempDir { dir =>
      import spark.implicits._
      // every observation shares one value -> every midrank = (N+1)/2 ->
      // H = 0 exactly, and the tie correction C = 1 - (N^3-N)/(N^3-N) = 0
      // makes H' undefined: NULL on both engines, not an ANSI throw
      val t1 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
      (1L to 9L).map(i => (i, t1, i, if (i % 2 == 0) "view" else "click",
          7.0, "{}"))
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .write.parquet(s"$dir/events.parquet")
      val rows = SparkEntry.queries("q287_kruskal_wallis")(spark, dir)
        .collect()
      assert(rows.length == 2, s"want one row per type: ${rows.toSeq}")
      rows.foreach { r =>
        assert(r.getAs[Double]("h") == 0.0, r.toString)
        assert(r.isNullAt(r.fieldIndex("h_tie_corrected")), r.toString)
        assert(r.getAs[Double]("mean_rank") == 5.0, r.toString)
      }
    }
  }

  test("q284 AP degenerate no positives: rows survive with NULL metrics") {
    withTempDir { dir =>
      import spark.implicits._
      // no 'F' order anywhere -> n_pos = 0 per segment: prevalence and
      // average precision are undefined, NULL on both engines - the rows
      // themselves must survive
      Seq((1L, "1-URGENT", 10.00, "O"), (2L, "1-URGENT", 20.00, "O"),
          (3L, "2-HIGH", 30.00, "P"))
        .toDF("o_orderkey", "o_orderpriority", "o_totalprice",
          "o_orderstatus")
        .write.parquet(s"$dir/orders.parquet")
      val rows = SparkEntry.queries("q284_avg_precision")(spark, dir)
        .collect()
      assert(rows.length == 2, s"want one row per segment: ${rows.toSeq}")
      rows.foreach { r =>
        assert(r.getAs[Long]("n_pos") == 0L, r.toString)
        assert(r.isNullAt(r.fieldIndex("prevalence")), r.toString)
        assert(r.isNullAt(r.fieldIndex("avg_precision")), r.toString)
      }
    }
  }

  test("q293 MK degenerate all-tied series: VarS=0, z and tau NULL") {
    withTempDir { dir =>
      import spark.implicits._
      // one event per day for 8 days -> every daily count tied at 1:
      // S=0, the tie correction cancels the variance exactly, z/tau_b
      // undefined -> NULL on both engines, trend 'none'
      val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
      (0L to 7L).map(i => (i + 1, new java.sql.Timestamp(t0 + i * 86400000L),
          i + 1, "view", 5.0, "{}"))
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .write.parquet(s"$dir/events.parquet")
      val rows = SparkEntry.queries("q293_mann_kendall")(spark, dir)
        .collect()
      assert(rows.length == 1, rows.toSeq.toString)
      val r = rows.head
      assert(r.getAs[Long]("s_stat") == 0L, r.toString)
      assert(r.getAs[Double]("var_s") == 0.0, r.toString)
      assert(r.isNullAt(r.fieldIndex("z")), r.toString)
      assert(r.isNullAt(r.fieldIndex("tau_b")), r.toString)
      assert(r.getAs[String]("trend") == "none", r.toString)
    }
  }

  test("q261 Neyman degenerate singleton strata: every lang row survives") {
    withTempDir { dir =>
      import spark.implicits._
      // one doc per stratum -> stddev_samp NULL -> total weight NULL
      Seq((1L, "aa bb", "en", "web", 5L), (2L, "cc dd", "fr", "web", 5L),
          (3L, "ee ff", "de", "web", 5L))
        .toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.parquet(s"$dir/documents.parquet")
      val rows = SparkEntry.queries("q261_neyman_allocation")(spark, dir)
        .collect()
      assert(rows.length == 3, s"degenerate Neyman dropped rows: got " +
        s"${rows.length}, want one per lang")
      rows.foreach { r =>
        assert(r.isNullAt(r.fieldIndex("sd")), r.toString)
        assert(r.isNullAt(r.fieldIndex("alloc_frac")), r.toString)
      }
    }
  }

  test("q286 log-odds degenerate single-word corpus: zero log-ratio " +
      "denominator yields NULL z") {
    withTempDir { dir =>
      import spark.implicits._
      // one distinct word IS the whole corpus: alpha = α₀ exactly and
      // na − ya = 0, so the en-side log denominator is exactly 0 —
      // DuckDB /0 → NULL → ln(NULL) → NULL z; Spark ANSI would throw
      // without the r12 guard. (Word must satisfy the length screen.)
      Seq((1L, "wonderful wonderful", "en", "web", 19L),
          (2L, "wonderful", "en", "web", 9L))
        .toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.parquet(s"$dir/documents.parquet")
      val rows = SparkEntry.queries("q286_logodds_keyness")(spark, dir)
        .collect()
      assert(rows.nonEmpty, "degenerate corpus dropped all rows")
      rows.foreach { r =>
        assert(r.getAs[String]("word") == "wonderful", r.toString)
        assert(r.isNullAt(r.fieldIndex("z")), r.toString)
      }
    }
  }

  test("q261 Neyman degenerate constant strata: tw=0 yields NULL allocs") {
    withTempDir { dir =>
      import spark.implicits._
      // n >= 2 docs per stratum, identical n_chars within each -> sd = 0
      // (NON-NULL) -> w = 0, tw = 0: both allocation divisions are /0 on
      // real values — DuckDB returns NULL rows, Spark ANSI would throw
      // without the tw guard. Every stratum must survive with NULL allocs.
      Seq((1L, "aa bb", "en", "web", 5L), (2L, "cc dd", "en", "web", 5L),
          (3L, "ee ff", "fr", "web", 7L), (4L, "gg hh", "fr", "web", 7L))
        .toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.parquet(s"$dir/documents.parquet")
      val rows = SparkEntry.queries("q261_neyman_allocation")(spark, dir)
        .collect()
      assert(rows.length == 2, s"constant-strata Neyman dropped rows: got " +
        s"${rows.length}, want one per lang")
      rows.foreach { r =>
        assert(r.getAs[Double]("sd") == 0.0, r.toString)
        assert(r.isNullAt(r.fieldIndex("alloc_frac")), r.toString)
        assert(r.isNullAt(r.fieldIndex("alloc_n")), r.toString)
      }
    }
  }

  test("q303 Good-Turing degenerate no-hapax corpus: p0 = 0, top-m m* NULL") {
    withTempDir { dir =>
      import spark.implicits._
      // every word occurs exactly twice -> n_1 = 0 (p0 exactly 0) and the
      // spectrum has a single row m=2 with no m=3 neighbor -> m* NULL on
      // both engines (left-join miss), never an ANSI /0.
      Seq((1L, "aa bb", "en", "web", 5L), (2L, "aa bb", "en", "web", 5L))
        .toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.parquet(s"$dir/documents.parquet")
      val rows = SparkEntry.queries("q303_good_turing")(spark, dir).collect()
      assert(rows.length == 1, s"want the single m=2 spectrum row: " +
        rows.mkString("; "))
      val r = rows.head
      assert(r.getAs[Long]("m") == 2 && r.getAs[Long]("n_m") == 2, r.toString)
      assert(r.isNullAt(r.fieldIndex("m_star")), r.toString)
      assert(r.getAs[Double]("p0_unseen") == 0.0, r.toString)
    }
  }

  test("q304 Heaps degenerate single-doc corpus: one bucket, beta NULL") {
    withTempDir { dir =>
      import spark.implicits._
      // one document -> one populated bucket -> regr_slope over a single
      // (ln N, ln V) point has zero x-variance: NULL beta on both engines,
      // never a throw; cumulative counters still exact.
      Seq((5L, "aa bb cc", "en", "web", 8L))
        .toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.parquet(s"$dir/documents.parquet")
      val rows = SparkEntry.queries("q304_heaps_law")(spark, dir).collect()
      assert(rows.length == 1, rows.mkString("; "))
      val r = rows.head
      assert(r.getAs[Long]("cum_docs") == 1 && r.getAs[Long]("cum_tokens") == 3
        && r.getAs[Long]("cum_vocab") == 3, r.toString)
      assert(r.isNullAt(r.fieldIndex("heaps_beta")), r.toString)
    }
  }

  test("q305 readability degenerates: wordless docs unscored, " +
      "sentence-less docs count one sentence") {
    withTempDir { dir =>
      import spark.implicits._
      // cell (en, empty): only whitespace text -> words = 0 -> n_scored 0,
      // fk_grade and pct_hard NULL (never an ANSI /0);
      // cell (en, nodots): words but zero [.!?] runs -> greatest(sents,1)
      // keeps the grade defined with tot_sentences = n_docs.
      Seq((1L, "   ", "en", "empty", 3L),
          (2L, "plain words with no stops", "en", "nodots", 25L),
          (3L, "more plain words here", "en", "nodots", 21L))
        .toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.parquet(s"$dir/documents.parquet")
      val rows = SparkEntry.queries("q305_readability")(spark, dir).collect()
      assert(rows.length == 2, rows.mkString("; "))
      val empty = rows.find(_.getAs[String]("source") == "empty").get
      assert(empty.getAs[Long]("n_scored") == 0, empty.toString)
      assert(empty.isNullAt(empty.fieldIndex("fk_grade")), empty.toString)
      assert(empty.isNullAt(empty.fieldIndex("pct_hard")), empty.toString)
      val nd = rows.find(_.getAs[String]("source") == "nodots").get
      assert(nd.getAs[Long]("tot_sentences") == nd.getAs[Long]("n_docs"),
        nd.toString)
      assert(!nd.isNullAt(nd.fieldIndex("fk_grade")), nd.toString)
    }
  }

  test("q306 richness degenerates: singleton source, nt=1 gini NULL") {
    withTempDir { dir =>
      import spark.implicits._
      // source 'one': a single one-word doc -> nt = 1: gini_simpson's
      // N(N-1) denominator is exactly 0 -> NULL on both engines (never an
      // ANSI /0); chao1 = V + n1(n1-1)/(2(n2+1)) = 1 + 0 = 1 (n2=0 is
      // defined in the bias-corrected form); coverage = 1 - 1/1 = 0.
      Seq((1L, "solo", "en", "one", 4L),
          (2L, "aa bb aa", "en", "two", 8L))
        .toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.parquet(s"$dir/documents.parquet")
      val rows = SparkEntry.queries("q306_species_richness")(spark, dir)
        .collect()
      assert(rows.length == 2, rows.mkString("; "))
      val one = rows.find(_.getAs[String]("source") == "one").get
      assert(one.getAs[Long]("n_tokens") == 1L, one.toString)
      assert(one.getAs[Double]("chao1") == 1.0, one.toString)
      assert(one.getAs[Double]("good_coverage") == 0.0, one.toString)
      assert(one.isNullAt(one.fieldIndex("gini_simpson")), one.toString)
      val two = rows.find(_.getAs[String]("source") == "two").get
      // aa:2 bb:1 -> N=3, mm1=2, gini = 1 - 2/6
      assert(two.getAs[Double]("gini_simpson") == 0.666667, two.toString)
    }
  }

  test("q307 JSD degenerate: disjoint vocabularies emit no pair row") {
    withTempDir { dir =>
      import spark.implicits._
      // zero common words -> the word-grain inner join is empty on both
      // engines; the pair is OMITTED (JSD would be exactly ln 2), not a
      // NULL row and not a throw — documented contract
      Seq((1L, "aa bb", "en", "s1", 5L), (2L, "cc dd", "en", "s2", 5L))
        .toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.parquet(s"$dir/documents.parquet")
      val rows = SparkEntry.queries("q307_js_divergence")(spark, dir)
        .collect()
      assert(rows.isEmpty, rows.mkString("; "))
    }
  }

  test("q308 power iteration degenerate: constant cloud NULLs, no throw") {
    withTempDir { dir =>
      import spark.implicits._
      // every vector identical with exact 6-decimal components -> the
      // per-dim mean is exact, the centered cells are exactly 0, w = 0,
      // s2 = 0: the norm and explained-ratio divisions must NULL (both
      // engines), never raise ANSI DIVIDE_BY_ZERO
      (1L to 3L).map(i => (i, Array.fill(64)(0.5f), 0))
        .toDF("vec_id", "embedding", "label")
        .write.parquet(s"$dir/embeddings.parquet")
      val rows = SparkEntry.queries("q308_power_iteration_pca")(spark, dir)
        .collect()
      assert(rows.length == 64, s"want 64 dims, got ${rows.length}")
      rows.foreach { r =>
        assert(r.isNullAt(r.fieldIndex("loading")), r.toString)
        assert(r.isNullAt(r.fieldIndex("lambda")), r.toString)
        assert(r.isNullAt(r.fieldIndex("explained_ratio")), r.toString)
      }
    }
  }

  test("q309 trend degenerates: single tier and zero responders -> z NULL") {
    withTempDir { dir =>
      import spark.implicits._
      // every user-day has exactly 0 views (tier 0 only) and no purchases:
      // p̄ = 0 AND the score spread Σnw² - (Σnw)²/N = 0 — the variance is
      // 0 twice over, z_trend must be NULL on both engines, tier rows kept
      val t1 = java.sql.Timestamp.valueOf("2024-01-05 00:00:00")
      (1L to 5L).map(i => (i, t1, i, "click", 1.0, "{}"))
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .write.parquet(s"$dir/events.parquet")
      val rows = SparkEntry.queries("q309_cochran_armitage")(spark, dir)
        .collect()
      assert(rows.length == 1, rows.mkString("; "))
      val r = rows.head
      assert(r.getAs[Long]("tier") == 0L, r.toString)
      assert(r.getAs[Long]("n_t") == 5L, r.toString)
      assert(r.getAs[Double]("rate") == 0.0, r.toString)
      assert(r.isNullAt(r.fieldIndex("z_trend")), r.toString)
    }
  }

  test("q311 OLS degenerate constant predictor: det=0, fit NULL, rows kept") {
    withTempDir { dir =>
      import spark.implicits._
      // every doc has exactly 2 tokens -> x1 constant -> s11 = s12 = 0 ->
      // det = 0: the singular normal system must yield NULL slopes/R² on
      // both engines (Spark ANSI would otherwise still be fine — the /det
      // is double — but the NULL contract is what the oracle CASE returns)
      Seq((1L, "a bb", "en", "web", 4L), (2L, "cc d", "en", "web", 4L),
          (3L, "ee fff", "en", "web", 6L), (4L, "g hh", "en", "web", 4L))
        .toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.parquet(s"$dir/documents.parquet")
      val rows = SparkEntry.queries("q311_ols_regression")(spark, dir)
        .collect()
      assert(rows.length == 1, rows.mkString("; "))
      val r = rows.head
      assert(r.getAs[Long]("n") == 4L, r.toString)
      Seq("b0", "b1", "b2", "r2", "adj_r2").foreach(c =>
        assert(r.isNullAt(r.fieldIndex(c)), s"$c: $r"))
    }
  }

  test("q312 single-cluster degenerate: H=0 metrics NULL, purity 1") {
    withTempDir { dir =>
      import spark.implicits._
      // one true class, one predicted class (no q32 markers -> everything
      // argmaxes to 'en'): both entropies 0 and max-expected ARI denom 0 —
      // every ratio metric NULL on both engines, purity exactly 1
      Seq((1L, "xx yy", "en", "web", 5L), (2L, "zz ww", "en", "web", 5L),
          (3L, "vv uu", "en", "web", 5L))
        .toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.parquet(s"$dir/documents.parquet")
      val rows = SparkEntry.queries("q312_cluster_agreement")(spark, dir)
        .collect()
      assert(rows.length == 1, rows.mkString("; "))
      val r = rows.head
      assert(r.getAs[Long]("n_docs") == 3L, r.toString)
      assert(r.getAs[Double]("purity") == 1.0, r.toString)
      Seq("ari", "nmi", "homogeneity", "completeness", "v_measure")
        .foreach(c => assert(r.isNullAt(r.fieldIndex(c)), s"$c: $r"))
    }
  }

  test("q314 Delta degenerate identical profiles: sd=0, delta NULL") {
    withTempDir { dir =>
      import spark.implicits._
      // two sources with IDENTICAL texts -> every marker rate equal ->
      // sd = 0 -> z NULL everywhere -> the pair row survives with
      // n_markers = 0 and NULL delta on both engines (AVG's null-skip)
      Seq((1L, "aa bb cc", "en", "s1", 8L), (2L, "aa bb cc", "en", "s2", 8L))
        .toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.parquet(s"$dir/documents.parquet")
      val rows = SparkEntry.queries("q314_burrows_delta")(spark, dir)
        .collect()
      assert(rows.length == 1, rows.mkString("; "))
      val r = rows.head
      assert(r.getAs[String]("source_a") == "s1", r.toString)
      assert(r.getAs[Long]("n_markers") == 0L, r.toString)
      assert(r.isNullAt(r.fieldIndex("delta")), r.toString)
    }
  }

  test("q324 BH degenerate all-pass corpus: pooled rate 1, se=0, z NULL") {
    withTempDir { dir =>
      import spark.implicits._
      // every doc passes the 200-char screen in every cell -> pp = 1 ->
      // se = sqrt(0) = 0 -> the whole family is degenerate: z/p/rank/
      // reject all NULL on both engines (DuckDB 0/0 NULL, Spark guarded),
      // rows kept
      Seq((1L, "x", "en", "web", 250L), (2L, "y", "en", "web", 300L),
          (3L, "z", "fr", "web", 400L))
        .toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.parquet(s"$dir/documents.parquet")
      val rows = SparkEntry.queries("q324_bh_fdr_screen")(spark, dir)
        .collect()
      assert(rows.length == 2, rows.mkString("; "))
      rows.foreach { r =>
        assert(r.getAs[Double]("pass_rate") == 1.0, r.toString)
        Seq("z", "p", "p_rank", "crit", "reject")
          .foreach(c => assert(r.isNullAt(r.fieldIndex(c)), s"$c: $r"))
      }
    }
  }

  test("q325 log-rank degenerates: one-arm corpus sv=0 -> z NULL; " +
      "all-censored corpus -> empty") {
    withTempDir { dir =>
      import spark.implicits._
      val t0 = java.sql.Timestamp.valueOf("2024-01-05 00:00:00")
      val t9 = java.sql.Timestamp.valueOf("2024-03-05 00:00:00")
      // md5("1") and md5("2") both start >= '8' -> both users arm B ->
      // n_a = 0 at the one death week -> V = O·0·(1-0)·... = 0 exactly ->
      // ΣV = 0 -> z/chi2 NULL on both engines (the sv>0 guard), the
      // death-week row itself survives with e_a = v = 0
      Seq((1L, t0, 1L, "view", 1.0, "{}"),
          (2L, t0, 2L, "view", 1.0, "{}"),
          (3L, t9, 2L, "view", 1.0, "{}"))
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .write.parquet(s"$dir/events.parquet")
      val rows = SparkEntry.queries("q325_logrank_test")(spark, dir)
        .collect()
      assert(rows.length == 1, rows.mkString("; "))
      val r = rows.head
      assert(r.getAs[Long]("o_a") == 0L && r.getAs[Long]("o_b") == 1L,
        r.toString)
      assert(r.getAs[Double]("e_a") == 0.0 && r.getAs[Double]("v") == 0.0,
        r.toString)
      assert(r.isNullAt(r.fieldIndex("z")), r.toString)
      assert(r.isNullAt(r.fieldIndex("chi2")), r.toString)
    }
    withTempDir { dir =>
      import spark.implicits._
      // every user's last event sits in the corpus's final week -> all
      // administratively censored -> no death weeks -> empty result on
      // both engines (the oracle's ev frame is empty, the cross join
      // propagates zero rows)
      val t0 = java.sql.Timestamp.valueOf("2024-01-05 00:00:00")
      Seq((1L, t0, 1L, "view", 1.0, "{}"), (2L, t0, 2L, "view", 1.0, "{}"))
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .write.parquet(s"$dir/events.parquet")
      assert(SparkEntry.queries("q325_logrank_test")(spark, dir)
        .collect().isEmpty)
    }
  }

  test("q325/q330 two-arm populated fixture matches hand-pinned DuckDB " +
      "values (nonempty hypergeometric/hazard path)") {
    // r13 ADVICE #1: on every driver corpus all users are administratively
    // censored, so q325/q330 return 0 rows on both engines and the
    // CORRECTNESS hash-match (0=0) never exercises the E/V/z arithmetic or
    // the cumulative-hazard window. This fixture populates BOTH md5 arms
    // (A: users 6,9,11; B: users 1,2,3,4) with three distinct death weeks
    // (2,3,5) and one censored anchor per arm (lifetime 10 = global max).
    // Expected values are the DuckDB oracle outputs for the identical
    // rows, computed offline with o325/o330 and pinned here verbatim —
    // the cross-engine check for the nonempty path that the driver's
    // corpus cannot reach.
    withTempDir { dir =>
      import spark.implicits._
      // Saturday noon anchor: 2.5 days past the Thursday-00:00 UTC epoch
      // week boundary, so a JVM-timezone shift of hours cannot move any
      // event across a week boundary; +L*7d preserves the offset exactly.
      val t0 = java.sql.Timestamp.valueOf("2024-01-06 12:00:00")
      def plus(weeks: Int) =
        new java.sql.Timestamp(t0.getTime + weeks * 7L * 86400 * 1000)
      val life = Seq(1L -> 2, 2L -> 3, 3L -> 5, 4L -> 10,
        6L -> 2, 9L -> 5, 11L -> 10)
      val rows = life.zipWithIndex.flatMap { case ((u, l), i) =>
        Seq((2L * i + 1, t0, u, "view", 1.0, "{}"),
          (2L * i + 2, plus(l), u, "view", 1.0, "{}"))
      }
      rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .write.parquet(s"$dir/events.parquet")

      val lr = SparkEntry.queries("q325_logrank_test")(spark, dir)
        .collect().map(r => (r.getAs[Long]("age_w"), r.getAs[Long]("n_a"),
          r.getAs[Long]("n_b"), r.getAs[Long]("o_a"), r.getAs[Long]("o_b"),
          r.getAs[Double]("e_a"), r.getAs[Double]("v"),
          r.getAs[Long]("sum_o_a"), r.getAs[Double]("sum_e_a"),
          r.getAs[Double]("sum_v"), r.getAs[Double]("z"),
          r.getAs[Double]("chi2"))).toSeq
      val lrExpected = Seq( // DuckDB o325 on the identical fixture
        (2L, 3L, 4L, 1L, 1L, 0.85714286, 0.40816327,
          2L, 2.257143, 0.981497, -0.259555, 0.067369),
        (3L, 2L, 3L, 0L, 1L, 0.4, 0.24,
          2L, 2.257143, 0.981497, -0.259555, 0.067369),
        (5L, 2L, 2L, 1L, 1L, 1.0, 0.33333333,
          2L, 2.257143, 0.981497, -0.259555, 0.067369))
      assert(lr == lrExpected, s"q325 got:\n${lr.mkString("\n")}")

      val na = SparkEntry.queries("q330_nelson_aalen")(spark, dir)
        .collect().map(r => (r.getAs[String]("arm"),
          r.getAs[Long]("age_w"), r.getAs[Long]("n_risk"),
          r.getAs[Long]("deaths"), r.getAs[Double]("hazard"),
          r.getAs[Double]("cum_hazard"))).toSeq
      val naExpected = Seq( // DuckDB o330 on the identical fixture
        ("A", 2L, 3L, 1L, 0.33333333, 0.333333),
        ("A", 5L, 2L, 1L, 0.5, 0.833333),
        ("B", 2L, 4L, 1L, 0.25, 0.25),
        ("B", 3L, 3L, 1L, 0.33333333, 0.583333),
        ("B", 5L, 2L, 1L, 0.5, 1.083333))
      assert(na == naExpected, s"q330 got:\n${na.mkString("\n")}")
    }
  }

  test("q326 permutation degenerate single user: one arm empty in every " +
      "replicate, p NULL") {
    withTempDir { dir =>
      import spark.implicits._
      val t0 = java.sql.Timestamp.valueOf("2024-01-05 00:00:00")
      Seq((1L, t0, 1L, "purchase", 200.0, "{}"))
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .write.parquet(s"$dir/events.parquet")
      // a single user leaves one arm empty under EVERY coin -> diff NULL
      // for every replicate including b=0 -> exceeds NULL -> n_exceed and
      // p_perm NULL on both engines (sum-of-NULLs, 1+NULL)
      val rows = SparkEntry.queries("q326_permutation_test")(spark, dir)
        .collect()
      assert(rows.length == 65, s"got ${rows.length}")
      rows.foreach { r =>
        assert(r.isNullAt(r.fieldIndex("diff")), r.toString)
        assert(r.isNullAt(r.fieldIndex("p_perm")), r.toString)
      }
    }
  }

  test("q329 alpha degenerate single-item constant corpus: k=1 and " +
      "tot_num=0, alpha NULL") {
    withTempDir { dir =>
      import spark.implicits._
      val t0 = java.sql.Timestamp.valueOf("2024-01-05 00:00:00")
      // one event type AND every user total identical: k = 1 and
      // tot_num = n·Σt² − (Σt)² = 0 — both degenerate legs at once;
      // alpha NULL on both engines (DuckDB half verified by hand), the
      // item row survives with exact moments
      Seq((1L, t0, 1L, "view", 1.0, "{}"), (2L, t0, 2L, "view", 1.0, "{}"),
          (3L, t0, 3L, "view", 1.0, "{}"))
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .write.parquet(s"$dir/events.parquet")
      val rows = SparkEntry.queries("q329_cronbach_alpha")(spark, dir)
        .collect()
      assert(rows.length == 1, rows.mkString("; "))
      val r = rows.head
      // var_num/tot_num are DOUBLE since r13 (exact DECIMAL(38,0)/HUGEINT
      // internally, cast once for the comparable output schema)
      assert(r.getAs[Long]("k") == 1L && r.getAs[Double]("tot_num") == 0.0,
        r.toString)
      assert(r.getAs[Double]("var_num") == 0.0, r.toString)
      assert(r.isNullAt(r.fieldIndex("alpha")), r.toString)
      // all-censored twin: the same corpus has no deaths -> Nelson-Aalen
      // returns empty on both engines
      assert(SparkEntry.queries("q330_nelson_aalen")(spark, dir)
        .collect().isEmpty)
    }
  }

  test("q323 ANF degenerate edgeless graph: empty result, no throw") {
    withTempDir { dir =>
      import spark.implicits._
      // three single-line orders -> no co-purchase pair reaches support 2
      // -> the support graph is EMPTY -> every sketch frame is empty and
      // the neighborhood function has no rows; the operator must return
      // empty rather than throw on the empty localCheckpoint/topk chain
      Seq((1L, 10L), (2L, 11L), (3L, 12L))
        .toDF("l_orderkey", "l_partkey")
        .write.parquet(s"$dir/lineitem.parquet")
      assert(SparkEntry.queries("q323_anf_effective_diameter")(spark, dir)
        .collect().isEmpty)
    }
  }
}
