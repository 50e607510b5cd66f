package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every declared query at SPARK_GRAFT_SF_DIR and prints
  * one JSON line. Each query is forced through a `noop`-format write so the
  * full plan executes (a bare `count()` would let Catalyst prune projections
  * and benchmark only the scan — VERDICT.md round 1, "What's wrong" #1).
  *
  * == Process isolation (round-7 VERDICT #1/#2) ==
  * A single-JVM ~420-execution session accrues degraded state that inflates
  * the suite tail 3-10x (BENCH_r07: q120 28.9 s in-suite vs 4.49 s fresh-JVM;
  * q126 7.3 s vs 0.99 s) — and the end-of-suite drift rerun inherits the same
  * degraded JVM, so it cannot correct the record. The published artifact is
  * therefore now produced by an ORCHESTRATOR (no CLI args — the driver's
  * invocation): it forks each ~50-query shard as a fresh JVM subprocess
  * (same classpath/JVM flags as this process), merges the shard detail
  * JSONs, and re-measures each of the 10 slowest queries in its OWN
  * fresh-JVM "drift" child (round-8 VERDICT #1 — a single shared drift
  * child accumulated ContextCleaner backlog across its back-to-back
  * reruns). Session-state can then never span more than one shard, and
  * every drift rerun is a true fresh-JVM number by construction.
  *
  * == Calibration (round-7 VERDICT #6, round-8 VERDICT #2) ==
  * Each child (shard AND drift) re-times a fixed probe (q01, the pricing
  * summary) at start / middle / end, reported under "calibration". The
  * artifact thus carries its own environment-drift normalizer: a
  * cross-round per-query comparison should be read against the calibration
  * ratio of the two artifacts (tools/compare_bench.py automates this)
  * instead of reconstructing machine drift forensically. Children whose
  * worst probe exceeds 2x the cross-child median are listed under
  * "degraded" — their numbers are machine-window artifacts, and BASELINE.md
  * policy quotes only non-flagged children cross-round.
  *
  * CLI: no args = orchestrator (fork shards). With query names = measure
  * those in-process (the child/local-iteration mode). Flags (child use):
  * `--calibrate` emits the probe triple; `--no-drift` skips the in-process
  * drift rerun (the orchestrator does it in a separate child instead).
  */
object Bench {

  /** Fixed-cost calibration probe: must exist in every catalog, cheap, and
    * exercise scan+agg+shuffle (so it tracks the same degradation the suite
    * sees). */
  private val CalibrationQuery = "q01_pricing_summary"

  /** Whole-artifact window quarantine (r13, r12 VERDICT #6): per-query
    * degraded flags fire individually, but a window where MANY fresh-JVM
    * drift reruns land ABOVE their in-suite times is a machine that
    * deteriorated DURING the run — the artifact's raw total is not
    * cross-round comparable even though each per-query flag looks local.
    * Rule: contended when MORE THAN [[WindowContendedK]] material drift
    * reruns (in-suite ≥ 1 s) exceed their in-suite time by > 1.3×.
    * BENCH_r12's driver window (5 of 10 reruns above 1.3× — q157
    * 7.3→13.3 s, q204 7.2→10.2 s, q165, q320, q206) retro-triggers this
    * rule; the spec pins those exact pairs. Cross-round tooling
    * (`tools/compare_bench.py`) refuses the raw total when the flag is
    * set.
    */
  val WindowContendedK = 3

  /** Pure rule over (insuite, fresh-JVM rerun) pairs — factored out so the
    * spec can apply it retroactively to a committed artifact's drift map. */
  def windowContended(pairs: Seq[(Double, Double)]): Boolean =
    pairs.count { case (insuite, rerun) =>
      insuite >= 1.0 && rerun > 1.3 * insuite
    } > WindowContendedK

  def main(args: Array[String]): Unit = {
    val (flags, names) = args.partition(_.startsWith("--"))
    if (names.isEmpty && flags.isEmpty) orchestrate()
    else runInProcess(names, calibrate = flags.contains("--calibrate"),
      drift = !flags.contains("--no-drift"))
  }

  // -------------------------------------------------------------------
  // Orchestrator: fresh-JVM shard subprocesses + fresh-JVM drift child
  // -------------------------------------------------------------------

  private def orchestrate(): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val shardSize = sys.env.getOrElse("SPARK_GRAFT_BENCH_SHARD", "50").toInt
    // local smoke-testing only (driver never sets it): cap the catalog so an
    // orchestrator change can be exercised end-to-end in minutes, not an hour
    val limit = sys.env.get("SPARK_GRAFT_BENCH_LIMIT").map(_.toInt)
    val allNames0 = SparkEntry.queries.keys.toSeq.sorted
    val allNames = limit.fold(allNames0)(allNames0.take)
    val shards = allNames.grouped(shardSize).toSeq
    val t0 = System.nanoTime()

    val shardResults = shards.zipWithIndex.map { case (shard, i) =>
      System.err.println(
        s"[bench] shard $i/${shards.size}: ${shard.size} queries, fresh JVM")
      runChild(s"shard$i", "--calibrate" :: "--no-drift" :: shard.toList)
    }
    val queries = shardResults.flatMap(_.queries)
    val failed = shardResults.flatMap(_.failed)
    val flaky = shardResults.flatMap(_.flaky)

    // Drift check, now meaningful by construction: each rerun gets its OWN
    // fresh JVM (round-8 VERDICT #1 — a shared drift child accumulated
    // ContextCleaner backlog across its 10 back-to-back reruns, inflating
    // the later ones: q97 8.8→11.4 in BENCH_r08), and carries --calibrate so
    // every published rerun number rides with its own probe triple.
    val slowest = queries.filter(_._2 >= 0).sortBy(-_._2).take(10).map(_._1)
    val driftResults = slowest.map { n =>
      System.err.println(s"[bench] drift rerun child for $n: fresh JVM")
      n -> runChild(s"drift_$n", "--calibrate" :: "--no-drift" :: List(n))
    }
    val qmap = queries.toMap
    val drift = driftResults.map { case (n, r) =>
      val t = r.queries.toMap.getOrElse(n, -1.0)
      f""""$n":{"insuite":${qmap(n)}%.3f,"rerun":$t%.3f}"""
    }.mkString("{", ",", "}")

    // Every child's probe triple in one object: shards + per-query drift
    // children. A cross-round comparator normalizes against these instead of
    // reconstructing machine drift forensically (round-7 VERDICT #6).
    val allCalib: Seq[(String, String)] =
      shardResults.zipWithIndex.map { case (r, i) =>
        s"shard$i" -> r.calibration.getOrElse("{}") } ++
      driftResults.map { case (n, r) =>
        s"drift_$n" -> r.calibration.getOrElse("{}") }
    val calib = allCalib.map { case (tag, c) => s""""$tag":$c""" }
      .mkString("{", ",", "}")
    // Degraded-window self-flagging (round-8 VERDICT #2): a child whose worst
    // probe exceeds 2x the cross-child median probe ran in a degraded slice
    // of the machine — its numbers are quarantined from cross-round policy
    // (BASELINE.md quotes only non-flagged children). BENCH_r08's shard2
    // (end probe 1.85 s vs 0.30 median — the window that produced q120's
    // 19.7/29.6 s) would have been flagged automatically by this rule.
    val probeRe = """-?[0-9]+(?:\.[0-9]+)?""".r
    def probesOf(c: String): Seq[Double] =
      probeRe.findAllIn(c).map(_.toDouble).filter(_ > 0).toSeq
    val allProbes = allCalib.flatMap { case (_, c) => probesOf(c) }.sorted
    val probeDegraded: Seq[String] =
      if (allProbes.size < 3) Nil
      else {
        val median = allProbes(allProbes.size / 2)
        allCalib.collect { case (tag, c)
          if probesOf(c).exists(_ > 2 * median) => tag }
      }
    // Canary-aware triggers (r12, VERDICT #4b): the r11 driver run carried
    // q120 at 18.0 s in-suite (fresh-JVM rerun 8.7) while every probe read
    // clean — a contended window the 2x-probe rule missed because the probe
    // is cheap and the contention hit the long-running query. Two flags
    // that catch that shape:
    //  (1) any drift rerun whose in-suite time exceeds 2x its own fresh-JVM
    //      rerun (both material, >= 1 s) — the rerun IS a same-machine
    //      clean re-measurement, so a 2x gap is the window, not the code;
    //  (2) the PPJoin contention canary outside its recorded clean-window
    //      band (sf0.1 fresh-JVM across rounds: 3.4-4.6 s; see BASELINE.md
    //      r12) — flagged above 7 s even when probes and reruns read clean.
    val canaryDegraded = Seq.newBuilder[String]
    driftResults.foreach { case (n, r) =>
      val rerun = r.queries.toMap.getOrElse(n, -1.0)
      val insuite = qmap.getOrElse(n, -1.0)
      if (rerun >= 1.0 && insuite > 2 * rerun)
        canaryDegraded += s"insuite_$n"
    }
    if (sfDir.contains("sf0.1") &&
      qmap.getOrElse("q120_prefix_filter_join", -1.0) > 7.0)
      canaryDegraded += "canary_q120"
    val degraded: Seq[String] = probeDegraded ++ canaryDegraded.result()
    if (degraded.nonEmpty) System.err.println(
      s"[bench] DEGRADED machine windows detected " +
        s"(probe > 2x median, in-suite > 2x rerun, or canary band): " +
        degraded.mkString(", "))
    // Whole-artifact quarantine (r13): many reruns ABOVE in-suite = the
    // machine deteriorated mid-run; stamp the artifact itself so
    // cross-round tooling refuses the raw total.
    val contended = windowContended(driftResults.map { case (n, r) =>
      (qmap.getOrElse(n, -1.0), r.queries.toMap.getOrElse(n, -1.0))
    })
    if (contended) System.err.println(
      s"[bench] WINDOW CONTENDED: > $WindowContendedK drift reruns " +
        "exceed in-suite by >1.3x — raw total not cross-round comparable")

    val qs = queries.map { case (k, v) => "\"" + k + f"""":$v%.3f""" }
      .mkString("{", ",", "}")
    def arr(xs: Seq[String]): String =
      xs.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = queries.map(_._2).filter(_ >= 0).sum
    val wall = (System.nanoTime() - t0) / 1e9
    // The driver tail-captures stdout, so the per-query detail line (>4 KB at
    // ~200 queries) must come FIRST and the machine-read summary must be the
    // compact LAST line — three rounds of BENCH_r*.json "parsed": null came
    // from a single long line whose front (with "value") fell off the capture.
    val detail = f"""{"metric":"detail","queries":$qs,"failed":${arr(failed)},"flaky":${arr(flaky)},"drift":$drift,"calibration":$calib,"degraded":${arr(degraded)},"window_contended":$contended,"shards":${shards.size},"wall":$wall%.1f,"sf":"$sfDir"}"""
    println(detail)
    val detailPath =
      sys.env.getOrElse("SPARK_GRAFT_BENCH_DETAIL", "/tmp/graft_bench_detail.json")
    writeFile(detailPath, detail + "\n")
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","n":${queries.size},"failed":${failed.size},"flaky":${flaky.size},"window_contended":$contended,"sf":"$sfDir"}""")
  }

  private final case class ChildResult(
      queries: Seq[(String, Double)],
      failed: Seq[String],
      flaky: Seq[String],
      calibration: Option[String])

  /** Fork a fresh JVM running this main with `args`, inheriting classpath,
    * JVM flags, and environment. The child's detail JSON comes back via a
    * per-child temp file; its stdout/stderr go to a log file so the
    * orchestrator's stdout stays a clean two-line protocol. */
  private def runChild(tag: String, args: List[String]): ChildResult = {
    import scala.jdk.CollectionConverters._
    val javaBin = new java.io.File(
      new java.io.File(System.getProperty("java.home"), "bin"), "java").getPath
    // Re-use this JVM's own flags (add-opens, vector module, heap, code
    // cache): they came from build.sbt's javaOptions and are exactly what a
    // correct child needs. Drop agent/debug flags a wrapper might inject.
    val jvmFlags = java.lang.management.ManagementFactory.getRuntimeMXBean
      .getInputArguments.asScala.toList
      .filterNot(f => f.startsWith("-agentlib") || f.startsWith("-javaagent"))
    val detailFile = java.io.File.createTempFile(s"graft_bench_$tag", ".json")
    val logFile = new java.io.File(
      System.getProperty("java.io.tmpdir"), s"graft_bench_$tag.log")
    val cmd = (javaBin :: jvmFlags) ++
      List("-cp", System.getProperty("java.class.path"), "graft.Bench") ++ args
    val pb = new ProcessBuilder(cmd.asJava)
    pb.environment().put("SPARK_GRAFT_BENCH_DETAIL", detailFile.getPath)
    // Merge stderr into stdout so both streams share ONE descriptor — two
    // independent redirects to the same file (truncating out + appending
    // err) interleave at independent offsets and garble exactly the log the
    // failure path points the user at (round-8 ADVICE). The detail JSON
    // travels via the temp file, so the log is purely diagnostic.
    pb.redirectErrorStream(true)
    pb.redirectOutput(logFile)
    val exit = pb.start().waitFor()
    val detail =
      try new String(java.nio.file.Files.readAllBytes(detailFile.toPath), "UTF-8")
      catch { case _: Throwable => "" }
    detailFile.delete()
    if (exit != 0 || detail.isEmpty) {
      // a dead shard must be visible, never silently absent: every query it
      // owned is reported failed (time -1 is excluded from totals anyway)
      System.err.println(s"[bench] child $tag failed (exit $exit, " +
        s"detail ${if (detail.isEmpty) "missing" else "present"}); " +
        s"log: ${logFile.getPath}")
      val qnames = args.filterNot(_.startsWith("--"))
      ChildResult(qnames.map(_ -> -1.0), qnames, Nil, None)
    } else parseDetail(detail)
  }

  /** Minimal parser for the fixed child-detail format (no JSON dep in main:
    * the format is machine-generated two objects + two string arrays). */
  private def parseDetail(s: String): ChildResult = {
    def obj(key: String): Option[String] = {
      // `"key":{` — the opening brace sits at offset key.length + 3. Brace-
      // depth scan, not indexOf('}'): the child format is flat today, but a
      // first-'}' cut would silently truncate a future nested object and
      // drop shard results into `failed` with no parse error (r8 ADVICE).
      val at = s.indexOf("\"" + key + "\":{")
      if (at < 0) None
      else {
        val start = at + key.length + 3
        var i = start
        var depth = 0
        while (i < s.length && { if (s.charAt(i) == '{') depth += 1
          else if (s.charAt(i) == '}') depth -= 1; depth != 0 }) i += 1
        require(i < s.length, s"unbalanced braces after key $key")
        Some(s.substring(start, i + 1))
      }
    }
    def strArr(key: String): Seq[String] = {
      val at = s.indexOf("\"" + key + "\":[")
      if (at < 0) Nil
      else {
        val start = at + key.length + 4
        val body = s.substring(start, s.indexOf(']', start))
        "\"([^\"]+)\"".r.findAllMatchIn(body).map(_.group(1)).toSeq
      }
    }
    val pair = "\"([^\"]+)\":(-?[0-9.]+)".r
    val queries = obj("queries").toSeq.flatMap(o =>
      pair.findAllMatchIn(o).map(m => m.group(1) -> m.group(2).toDouble))
    ChildResult(queries, strArr("failed"), strArr("flaky"), obj("calibration"))
  }

  private def writeFile(path: String, content: String): Unit =
    try java.nio.file.Files.write(java.nio.file.Paths.get(path),
      content.getBytes("UTF-8"))
    catch { case e: Throwable =>
      System.err.println(s"[bench] write $path failed: ${e.getMessage}") }

  // -------------------------------------------------------------------
  // In-process measurement (shard child / drift child / local iteration)
  // -------------------------------------------------------------------

  private def runInProcess(names: Seq[String], calibrate: Boolean,
      drift: Boolean): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // One warm-up pass over a tiny table so JVM/codegen startup cost doesn't
    // land on the first measured query.
    spark.read.parquet(s"$sfDir/region.parquet")
      .write.format("noop").mode("overwrite").save()
    // two timed runs per query, report the min: the first run pays one-off
    // whole-stage-codegen compilation (hundreds of ms to seconds for
    // expression-heavy queries), which is amortized noise in steady state.
    // one measurement = two timed runs of a query, best successful run kept
    def measure(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): (Double, Boolean) = {
      val times = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        val ok =
          try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
          catch {
            case e: Throwable =>
              System.err.println(s"[bench] $name failed: ${e.getMessage}")
              false
          }
        // elapsed stops BEFORE the cache teardown below — the run's time
        // must not include unpersisting the blocks it built
        val elapsed = (System.nanoTime() - t0) / 1e9
        // drop persist()ed intermediates (q38/q47/q72/q83) after every run:
        // Spark's CacheManager dedups by logical plan, so without this the
        // second timed run silently reuses the first run's cache (flattering
        // the min) AND cached blocks pile up across the shard session
        spark.catalog.clearCache()
        // clearCache only covers CacheManager-tracked DataFrames; q97's
        // per-iteration localCheckpoints live as raw persistent RDD blocks
        // and otherwise accumulate until GC, inflating later queries'
        // memory pressure
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
        if (ok) elapsed else -1.0
      }
      // a failed attempt is never a measurement (round-2 ADVICE), but a
      // transient failure shouldn't discard the other attempt's valid time:
      // report the best successful run (flagging the mixed outcome), or the
      // -1 sentinel if no attempt succeeded
      val good = times.filter(_ >= 0)
      (if (good.isEmpty) -1.0 else good.min, good.nonEmpty && good.size < times.size)
    }
    // empty names (e.g. `--in-proc` alone) = full catalog, single JVM — the
    // pre-round-8 behavior, kept for degradation experiments
    val catalog = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => names.isEmpty || names.contains(name) }
    require(names.isEmpty || catalog.size == names.distinct.size,
      s"unknown query names: ${names.toSet -- catalog.map(_._1)}")
    // Degradation forensics (round-7 VERDICT #2): with
    // SPARK_GRAFT_BENCH_PROBE_JVM set to a path, append one TSV line of JVM
    // state per measured query — code cache / metaspace / loaded classes /
    // cumulative GC time / heap — so a long single-JVM run (`--in-proc`)
    // localizes WHICH resource grows with the suite tail's inflation.
    val probeJvmPath = sys.env.get("SPARK_GRAFT_BENCH_PROBE_JVM")
    def jvmLine(name: String, t: Double): Unit = probeJvmPath.foreach { p =>
      import scala.jdk.CollectionConverters._
      import java.lang.management.{ManagementFactory => mf}
      def pool(frag: String): Long = mf.getMemoryPoolMXBeans.asScala
        .filter(_.getName.contains(frag)).map(_.getUsage.getUsed).sum
      val gcMs = mf.getGarbageCollectorMXBeans.asScala
        .map(_.getCollectionTime).sum
      val cl = mf.getClassLoadingMXBean
      val heap = mf.getMemoryMXBean.getHeapMemoryUsage.getUsed
      val line = f"$name\t$t%.3f\t${pool("CodeHeap")}\t${pool("Metaspace")}\t" +
        f"${cl.getLoadedClassCount}\t${cl.getTotalLoadedClassCount}\t$gcMs\t$heap%n"
      try java.nio.file.Files.write(java.nio.file.Paths.get(p),
        line.getBytes("UTF-8"),
        java.nio.file.StandardOpenOption.CREATE,
        java.nio.file.StandardOpenOption.APPEND)
      catch { case _: Throwable => () }
    }
    val calibFn = SparkEntry.queries(CalibrationQuery)
    def probe(): Double = if (calibrate) measure(CalibrationQuery, calibFn)._1 else -1.0
    val mid = catalog.size / 2
    val calibStart = probe()
    var calibMid = -1.0
    var sinceGc = 0
    val results = catalog.zipWithIndex.map { case ((name, fn), i) =>
      if (calibrate && i == mid) calibMid = probe()
      val (t, flaky) = measure(name, fn)
      jvmLine(name, t)
      // Spark's ContextCleaner frees broadcast blocks and shuffle files only
      // when the DRIVER GC collects their references — and a shard session
      // can go many queries without a full GC, so state from dead queries
      // piles up and inflates later times. A periodic explicit GC between
      // measurements keeps the cleaner draining; outside the timed window,
      // so it costs the suite wall-clock, never a query's reading.
      sinceGc += 1
      if (sinceGc >= 20) { System.gc(); sinceGc = 0 }
      (name, t, flaky)
    }
    val calibEnd = probe()
    val calib =
      if (calibrate)
        f"""{"start":$calibStart%.3f,"mid":$calibMid%.3f,"end":$calibEnd%.3f}"""
      else "{}"
    val failed = results.collect { case (k, v, _) if v < 0 => k }
    val flaky = results.collect { case (k, _, true) => k }
    val qs = results.map { case (k, v, _) => "\"" + k + f"""":$v%.3f""" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    def arr(xs: Seq[String]): String =
      xs.map("\"" + _ + "\"").mkString("[", ",", "]")
    // Local-iteration drift loop (pre-round-8 behavior, retained for
    // filtered runs without --no-drift; the orchestrator's artifact uses a
    // fresh-JVM child instead).
    val byName = catalog.toMap
    val driftJson =
      if (!drift) "{}"
      else results.filter(_._2 >= 0).sortBy(-_._2).take(10).map {
        case (name, insuite, _) =>
          // GC before each rerun, outside the timed window, so rerun N's
          // ContextCleaner backlog never lands on rerun N+1's reading
          System.gc()
          val (rerun, _) = measure(name, byName(name))
          f""""$name":{"insuite":$insuite%.3f,"rerun":$rerun%.3f}"""
      }.mkString("{", ",", "}")
    val detail = f"""{"metric":"detail","queries":$qs,"failed":${arr(failed)},"flaky":${arr(flaky)},"drift":$driftJson,"calibration":$calib,"sf":"$sfDir"}"""
    println(detail)
    val detailPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_DETAIL", "/tmp/graft_bench_detail.json")
    writeFile(detailPath, detail + "\n")
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","n":${results.size},"failed":${failed.size},"flaky":${flaky.size},"sf":"$sfDir"}""")
    spark.stop()
  }
}
