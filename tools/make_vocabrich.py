#!/usr/bin/env python3
"""Synthesize a VOCAB-RICH documents fixture from sf0.01 (round-13 task #2).

Why: the driver testdata's documents table has a 31-word vocabulary, so
every vocabulary-growth/spectrum statistic (q243 Zipf slope, q301 Yule's K,
q303 Good-Turing, q304 Heaps' law, q306 Chao1) exercises a DEGENERATE float
surface locally — e.g. q304's cum_vocab is constant across all ten buckets,
heaps_beta is exactly 0.0 in both engines, and the r12 driver-red
regr_slope-over-unrounded-ln knife-edge was invisible to the local
Verify+compare loop. This fixture replaces every word OCCURRENCE with a
draw from a Zipf(s)-distributed ~10k-word pseudo-vocabulary, deterministic
per (doc_id, position), so first-occurrence curves, frequency spectra and
rank histograms are all live locally.

Design:
  - every other table is copied verbatim from the source SF dir (the
    statistics family reads only `documents`, but Verify/compare create
    views over the full dir);
  - doc_id / lang / source are preserved; text is re-synthesized;
    n_chars is recomputed to match the new text (queries key on it);
  - the draw is md5-seeded by (salt, doc_id, token index) -> uniform in
    [0,1) -> inverse CDF of Zipf(s=1.07, N=10000): rank-frequency follows
    a real power law, vocabulary growth follows a real Heaps curve;
  - pseudo-words are md5-derived a-p strings, length 3..11 varying by
    rank, prefix-coded by rank so the 10k vocabulary is collision-free by
    construction (rank base-16 digits first, alpha-translated);
  - ASCII-only output (a-p), so Verify's q171 UTF-16/codepoint parity
    precondition still holds for the fixture dir.

Usage:
    python3 tools/make_vocabrich.py [SRC_DIR] [OUT_DIR]
    # defaults: /root/testdata/sf0.01  /tmp/graft_vocabrich
"""
import bisect
import hashlib
import os
import shutil
import sys

N_VOCAB = 10_000
ZIPF_S = 1.07
SALT = 0

HEX2ALPHA = str.maketrans("0123456789abcdef", "abcdefghijklmnop")


def build_cdf():
    weights = [1.0 / (r ** ZIPF_S) for r in range(1, N_VOCAB + 1)]
    tot = sum(weights)
    cdf, acc = [], 0.0
    for w in weights:
        acc += w / tot
        cdf.append(acc)
    cdf[-1] = 1.0
    return cdf


def vocab_word(rank: int) -> str:
    # rank digits (alpha-translated hex) + 'z' delimiter + md5 filler;
    # 'z' never occurs in the a-p hex alphabet, so the prefix code is
    # prefix-free and the 10k words are collision-free by construction.
    # Length varies 3..12 by rank hash (never truncating the delimiter).
    prefix = format(rank, "x").translate(HEX2ALPHA) + "z"
    h = hashlib.md5(f"vw:{SALT}:{rank}".encode()).hexdigest()
    length = max(len(prefix), 3 + int(h[:2], 16) % 9)
    return (prefix + h.translate(HEX2ALPHA))[:length]


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_vocabrich"
    os.makedirs(out, exist_ok=True)

    import duckdb
    con = duckdb.connect()

    for f in sorted(os.listdir(src)):
        if f.endswith(".parquet") and f != "documents.parquet":
            shutil.copyfile(os.path.join(src, f), os.path.join(out, f))

    cdf = build_cdf()
    words = [vocab_word(r) for r in range(1, N_VOCAB + 1)]
    assert len(set(words)) == N_VOCAB, "pseudo-word collision"

    rows = con.execute(
        f"SELECT doc_id, text, lang, source FROM '{src}/documents.parquet' "
        f"ORDER BY doc_id").fetchall()
    out_rows = []
    for doc_id, text, lang, source in rows:
        toks = text.split()
        new = []
        for j in range(len(toks)):
            h = hashlib.md5(f"{SALT}:{doc_id}:{j}".encode()).hexdigest()
            u = int(h[:13], 16) / 16.0 ** 13
            new.append(words[bisect.bisect_left(cdf, u)])
        t = " ".join(new)
        out_rows.append((doc_id, t, lang, source, len(t)))

    import pandas as pd
    df = pd.DataFrame(out_rows,
                      columns=["doc_id", "text", "lang", "source", "n_chars"])
    con.register("docs_vr", df)
    con.execute(f"COPY (SELECT doc_id, text, lang, source, n_chars "
                f"FROM docs_vr ORDER BY doc_id) "
                f"TO '{out}/documents.parquet' (FORMAT PARQUET)")

    stats = con.execute(f"""
        WITH w AS (SELECT doc_id,
                     unnest(string_split_regex(trim(text), '\\s+')) AS w
                   FROM '{out}/documents.parquet')
        SELECT count(*) AS tokens, count(DISTINCT w) AS vocab,
               count(DISTINCT doc_id) AS docs FROM w""").fetchone()
    print(f"vocab-rich fixture at {out}: {stats[2]} docs, "
          f"{stats[0]} tokens, {stats[1]} distinct words "
          f"(source had 31)")
    assert stats[1] > 1000, "fixture vocabulary unexpectedly small"


if __name__ == "__main__":
    main()
