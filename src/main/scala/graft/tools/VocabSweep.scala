package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool (round-13 task #2): prove the vocab-rich fixture can SEE the
  * q304 failure class the driver testdata cannot.
  *
  * The r12 driver-red query (q304_heaps_law) aggregated unrounded
  * per-element `ln(...)` values inside engine-internal `regr_slope` — each
  * ln differs in last ulps across engines and the two engines' moment
  * folds differ in order, so the slope double differs cross-engine and a
  * `round(.,4)` half-boundary eventually flips (CLAUDE.md: "only ROUNDED
  * AGGREGATES of transcendentals are comparable"). On the 31-word driver
  * corpus the surface is degenerate (cum_vocab constant, β exactly 0.0 in
  * both engines), so the local Verify+compare loop was structurally blind.
  *
  * This main dumps, over a given documents table, BOTH formulations of the
  * q304/q243 slope statistics UNROUNDED:
  *   - `*_prefix`: the r12 form — `regr_slope`/`regr_r2` over raw lns
  *     (engine-internal moment merging, float fold);
  *   - `*_postfix`: the r13 form — each ln snapped to int64 micro-units,
  *     slope/r² from explicit Σ folds, one final double division.
  * `tools/vocabrich_sweep.py` computes the identical pair in DuckDB and
  * compares with EXACT float equality: the pre-fix pair is expected to
  * DIFFER somewhere on a vocab-rich corpus (the knife-edge, visible once
  * rounding isn't hiding it), the post-fix pair is expected to be
  * bit-for-bit EQUAL even unrounded — the structural proof that the fix
  * removed the float surface rather than papering over it.
  *
  * Usage: runMain graft.tools.VocabSweep <dataDir> <outDir>
  */
object VocabSweep {
  def main(args: Array[String]): Unit = {
    val (dir, out) = (args(0), args(1))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.read.parquet(s"$dir/documents.parquet")
      .createOrReplaceTempView("documents")

    // q304's cumulative frame (buckets -> cum_tokens/cum_vocab), then both
    // slope formulations side by side. CROSS JOINs over one-row frames are
    // fine here: dev tool, not a catalog query.
    val heaps = spark.sql(
      """WITH d AS (
           SELECT doc_id,
                  size(filter(split(trim(text), '\\s+'),
                       w -> length(w) > 0)) AS ntok
           FROM documents),
         mx AS (SELECT max(doc_id) AS maxid FROM documents),
         db AS (SELECT (doc_id * 10) DIV (maxid + 1) AS bucket,
                       CAST(sum(ntok) AS BIGINT) AS toks_b
                FROM d CROSS JOIN mx GROUP BY 1),
         wv AS (SELECT w, min(doc_id) AS fd
                FROM (SELECT doc_id,
                        explode(split(trim(text), '\\s+')) AS w
                      FROM documents)
                WHERE length(w) > 0 GROUP BY w),
         nv AS (SELECT (fd * 10) DIV (maxid + 1) AS bucket,
                       CAST(count(*) AS BIGINT) AS new_vocab
                FROM wv CROSS JOIN mx GROUP BY 1),
         f AS (SELECT db.bucket, toks_b, COALESCE(new_vocab, 0) AS new_vocab
               FROM db LEFT JOIN nv USING (bucket)),
         c AS (SELECT bucket,
                      CAST(sum(toks_b) OVER o AS BIGINT) AS cum_tokens,
                      CAST(sum(new_vocab) OVER o AS BIGINT) AS cum_vocab
               FROM f
               WINDOW o AS (ORDER BY bucket ROWS BETWEEN UNBOUNDED
                            PRECEDING AND CURRENT ROW)),
         pts AS (SELECT
                   CAST(round(ln(CAST(cum_tokens AS DOUBLE)) * 1e6)
                     AS BIGINT) AS lx,
                   CAST(round(ln(CAST(cum_vocab AS DOUBLE)) * 1e6)
                     AS BIGINT) AS ly,
                   ln(CAST(cum_tokens AS DOUBLE)) AS rx,
                   ln(CAST(cum_vocab AS DOUBLE)) AS ry
                 FROM c WHERE cum_vocab > 0 AND cum_tokens > 0),
         mo AS (SELECT count(*) AS n, sum(lx) AS sx, sum(ly) AS sy,
                       sum(lx * ly) AS sxy, sum(lx * lx) AS sxx,
                       regr_slope(ry, rx) AS beta_prefix
                FROM pts)
         SELECT beta_prefix,
                CASE WHEN n * sxx - sx * sx <> 0 THEN
                  CAST(n * sxy - sx * sy AS DOUBLE)
                    / CAST(n * sxx - sx * sx AS DOUBLE) END AS beta_postfix
         FROM mo""")
    heaps.coalesce(1).write.mode("overwrite").parquet(s"$out/heaps")

    val zipf = spark.sql(
      """WITH tf AS (
           SELECT source, w, count(*) AS f
           FROM (SELECT source,
                   explode(split(trim(text), '\\s+')) AS w
                 FROM documents)
           WHERE length(w) > 0 GROUP BY source, w),
         ranked AS (
           SELECT source, f,
                  row_number() OVER (PARTITION BY source
                    ORDER BY f DESC, w) AS rank
           FROM tf),
         pts AS (
           SELECT source,
                  CAST(round(ln(CAST(rank AS DOUBLE)) * 1e6) AS BIGINT)
                    AS lx,
                  CAST(round(ln(CAST(f AS DOUBLE)) * 1e6) AS BIGINT) AS ly,
                  ln(CAST(rank AS DOUBLE)) AS rx,
                  ln(CAST(f AS DOUBLE)) AS ry
           FROM ranked WHERE rank <= 200),
         mo AS (
           SELECT source, CAST(count(*) AS BIGINT) AS n,
                  sum(lx) AS sx, sum(ly) AS sy, sum(lx * ly) AS sxy,
                  sum(lx * lx) AS sxx, sum(ly * ly) AS syy,
                  regr_slope(ry, rx) AS slope_prefix,
                  regr_r2(ry, rx) AS r2_prefix
           FROM pts GROUP BY source)
         SELECT source, slope_prefix, r2_prefix,
                CASE WHEN n * sxx - sx * sx <> 0 THEN
                  CAST(n * sxy - sx * sy AS DOUBLE)
                    / CAST(n * sxx - sx * sx AS DOUBLE) END AS slope_postfix,
                CASE WHEN n * sxx - sx * sx <> 0 AND n * syy - sy * sy <> 0
                  THEN (CAST(n * sxy - sx * sy AS DOUBLE)
                        * CAST(n * sxy - sx * sy AS DOUBLE))
                     / (CAST(n * sxx - sx * sx AS DOUBLE)
                        * CAST(n * syy - sy * sy AS DOUBLE))
                WHEN n * sxx - sx * sx <> 0 AND n * syy - sy * sy = 0
                  THEN 1.0 END AS r2_postfix
         FROM mo ORDER BY source""")
    zipf.coalesce(1).write.mode("overwrite").parquet(s"$out/zipf")
    spark.stop()
  }
}
