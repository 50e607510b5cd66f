#!/usr/bin/env python3
"""Round-13 task #2: the vocab-rich blind-spot sweep.

Proves two things on the Zipf-vocabulary fixture (tools/make_vocabrich.py):

1. BLIND SPOT CLOSED — the r12 (pre-fix) q304/q243 formulation
   (`regr_slope`/`regr_r2` over unrounded per-element lns) produces
   cross-engine float DIFFERENCES on a vocab-rich corpus when compared
   unrounded/exactly: the knife-edge the driver's corpus hit and the
   31-word local corpus could never show (there, beta degenerates to 0.0
   in both engines). The r13 (post-fix) formulation — int64-snapped lns +
   explicit Σ folds — is bit-for-bit EQUAL across engines even UNROUNDED.

2. FAMILY GREEN — the full vocabulary-statistics family (q243, q300,
   q301, q303, q304, q305, q306, q307, q314, q316) passes the standard
   Verify+compare loop against the fixture, i.e. the exact oracle parity
   now holds on a corpus whose frequency spectrum / vocabulary growth is
   actually live.

Usage:  python3 tools/vocabrich_sweep.py [FIXTURE_DIR]
        (generates the fixture first if the dir is missing)
Writes: docs/VOCABRICH_r13.txt
"""
import glob
import os
import subprocess
import sys

import duckdb
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FAMILY = ("q243_zipf_slope,q300_lang_source_mi,q301_yule_k,q303_good_turing,"
          "q304_heaps_law,q305_readability,q306_species_richness,"
          "q307_js_divergence,q314_burrows_delta,q316_naive_bayes,"
          "q335_mattr_diversity")

HEAPS_DUCK = """
WITH d AS (
  SELECT doc_id, len(list_filter(string_split_regex(trim(text), '\\s+'),
         w -> length(w) > 0)) AS ntok
  FROM documents),
mx AS (SELECT max(doc_id) AS maxid FROM documents),
db AS (SELECT (doc_id * 10) // (maxid + 1) AS bucket,
              CAST(sum(ntok) AS BIGINT) AS toks_b
       FROM d, mx GROUP BY 1),
wv AS (SELECT w, min(doc_id) AS fd
       FROM (SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+'))
               AS w FROM documents)
       WHERE length(w) > 0 GROUP BY w),
nv AS (SELECT (fd * 10) // (maxid + 1) AS bucket,
              CAST(count(*) AS BIGINT) AS new_vocab
       FROM wv, mx GROUP BY 1),
f AS (SELECT db.bucket, toks_b, COALESCE(new_vocab, 0) AS new_vocab
      FROM db LEFT JOIN nv USING (bucket)),
c AS (SELECT bucket, CAST(sum(toks_b) OVER o AS BIGINT) AS cum_tokens,
             CAST(sum(new_vocab) OVER o AS BIGINT) AS cum_vocab
      FROM f WINDOW o AS (ORDER BY bucket
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
pts AS (SELECT
          CAST(round(ln(CAST(cum_tokens AS DOUBLE)) * 1e6) AS BIGINT) AS lx,
          CAST(round(ln(CAST(cum_vocab AS DOUBLE)) * 1e6) AS BIGINT) AS ly,
          ln(CAST(cum_tokens AS DOUBLE)) AS rx,
          ln(CAST(cum_vocab AS DOUBLE)) AS ry
        FROM c WHERE cum_vocab > 0 AND cum_tokens > 0),
mo AS (SELECT CAST(count(*) AS BIGINT) AS n, sum(lx) AS sx, sum(ly) AS sy,
              sum(lx * ly) AS sxy, sum(lx * lx) AS sxx,
              regr_slope(ry, rx) AS beta_prefix
       FROM pts)
SELECT beta_prefix,
       CASE WHEN n * sxx - sx * sx <> 0 THEN
         CAST(n * sxy - sx * sy AS DOUBLE)
           / CAST(n * sxx - sx * sx AS DOUBLE) END AS beta_postfix
FROM mo"""

ZIPF_DUCK = """
WITH tf AS (
  SELECT source, w, count(*) AS f
  FROM (SELECT source, unnest(string_split_regex(trim(text), '\\s+')) AS w
        FROM documents)
  WHERE length(w) > 0 GROUP BY source, w),
ranked AS (
  SELECT source, f, row_number() OVER (PARTITION BY source
           ORDER BY f DESC, w) AS rank
  FROM tf),
pts AS (
  SELECT source,
         CAST(round(ln(CAST(rank AS DOUBLE)) * 1e6) AS BIGINT) AS lx,
         CAST(round(ln(CAST(f AS DOUBLE)) * 1e6) AS BIGINT) AS ly,
         ln(CAST(rank AS DOUBLE)) AS rx, ln(CAST(f AS DOUBLE)) AS ry
  FROM ranked WHERE rank <= 200),
mo AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n, sum(lx) AS sx,
         sum(ly) AS sy, sum(lx * ly) AS sxy, sum(lx * lx) AS sxx,
         sum(ly * ly) AS syy,
         regr_slope(ry, rx) AS slope_prefix, regr_r2(ry, rx) AS r2_prefix
  FROM pts GROUP BY source)
SELECT source, slope_prefix, r2_prefix,
       CASE WHEN n * sxx - sx * sx <> 0 THEN
         CAST(n * sxy - sx * sy AS DOUBLE)
           / CAST(n * sxx - sx * sx AS DOUBLE) END AS slope_postfix,
       CASE WHEN n * sxx - sx * sx <> 0 AND n * syy - sy * sy <> 0 THEN
         (CAST(n * sxy - sx * sy AS DOUBLE)
          * CAST(n * sxy - sx * sy AS DOUBLE))
           / (CAST(n * sxx - sx * sx AS DOUBLE)
              * CAST(n * syy - sy * sy AS DOUBLE))
       WHEN n * sxx - sx * sx <> 0 AND n * syy - sy * sy = 0 THEN 1.0
       END AS r2_postfix
FROM mo ORDER BY source"""


def read_parquet_dir(d):
    import pandas as pd
    return pd.concat([pq.read_table(f).to_pandas()
                      for f in sorted(glob.glob(f"{d}/*.parquet"))],
                     ignore_index=True)


def main():
    fixture = sys.argv[1] if len(sys.argv) > 1 else "/tmp/graft_vocabrich"
    if not os.path.isdir(fixture):
        subprocess.run([sys.executable, f"{REPO}/tools/make_vocabrich.py",
                        "/root/testdata/sf0.01", fixture], check=True)
    lines = []

    # Part 1: both formulations, both engines, UNROUNDED exact compare.
    sweep_out = "/tmp/graft_vocab_sweep"
    subprocess.run(
        ["sbt", "-batch",
         f"runMain graft.tools.VocabSweep {fixture} {sweep_out}"],
        cwd=REPO, check=True, env={**os.environ, "SPARK_GRAFT_CPUS": "8"})
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM "
            f"'{fixture}/documents.parquet'")
    sh = read_parquet_dir(f"{sweep_out}/heaps").iloc[0]
    dh = con.sql(HEAPS_DUCK).df().iloc[0]
    sz = read_parquet_dir(f"{sweep_out}/zipf").set_index("source").sort_index()
    dz = con.sql(ZIPF_DUCK).df().set_index("source").sort_index()

    pre_diffs, post_diffs = [], []
    def cmp(tag, a, b, bucket):
        if a != b:
            bucket.append(f"  {tag}: spark={a!r} duck={b!r} "
                          f"(diff {abs(a - b):.3e})")
    cmp("heaps beta_prefix", float(sh.beta_prefix), float(dh.beta_prefix),
        pre_diffs)
    cmp("heaps beta_postfix", float(sh.beta_postfix), float(dh.beta_postfix),
        post_diffs)
    for src in sz.index:
        for colp in ("slope_prefix", "r2_prefix"):
            cmp(f"zipf {src} {colp}", float(sz.loc[src, colp]),
                float(dz.loc[src, colp]), pre_diffs)
        for colp in ("slope_postfix", "r2_postfix"):
            cmp(f"zipf {src} {colp}", float(sz.loc[src, colp]),
                float(dz.loc[src, colp]), post_diffs)

    lines.append("== Part 1: unrounded cross-engine comparison on the "
                 "vocab-rich fixture ==")
    lines.append(f"fixture: {fixture}")
    lines.append(f"pre-fix (regr_slope over raw lns) differences: "
                 f"{len(pre_diffs)}")
    lines.extend(pre_diffs)
    lines.append(f"post-fix (int64-snapped explicit folds) differences: "
                 f"{len(post_diffs)}")
    lines.extend(post_diffs)
    blind_spot_closed = len(pre_diffs) > 0
    postfix_exact = len(post_diffs) == 0
    lines.append(f"BLIND SPOT VISIBLE (pre-fix form differs unrounded): "
                 f"{blind_spot_closed}")
    lines.append(f"POST-FIX BIT-EXACT UNROUNDED: {postfix_exact}")

    # Part 2: standard Verify+compare for the vocabulary-statistics family.
    vout = "/tmp/graft_vocab_vout"
    subprocess.run(
        ["sbt", "-batch",
         f"runMain graft.Verify {fixture} {vout} {FAMILY}"],
        cwd=REPO, check=True, env={**os.environ, "SPARK_GRAFT_CPUS": "8"})
    res = subprocess.run(
        [sys.executable, f"{REPO}/tools/compare.py", fixture, vout],
        capture_output=True, text=True, check=True)
    lines.append("")
    lines.append("== Part 2: Verify+compare on the fixture "
                 "(vocabulary-statistics family) ==")
    lines.append(res.stdout.strip())

    out = f"{REPO}/docs/VOCABRICH_r13.txt"
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print("\n".join(lines))
    print(f"\nwritten: {out}")
    n_fail = res.stdout.count("FAIL ")
    assert postfix_exact, "post-fix formulation not bit-exact on fixture"
    assert n_fail == 0, "family queries failed compare on fixture"
    if not blind_spot_closed:
        print("WARNING: pre-fix form agreed exactly on this fixture draw — "
              "knife-edge not exhibited (possible but unlikely)")


if __name__ == "__main__":
    main()
