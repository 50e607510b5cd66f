#!/usr/bin/env python3
"""Synthesize an sf1-equivalent test set from sf0.1 (round-12 VERDICT #1):
re-key and concatenate sf0.1 tenfold with deterministic id offsets so every
FK edge stays valid, extending the empirical scale curve to two decades
(sf0.01 -> sf0.1 -> sf1, a 100x span).

Usage:
    python3 tools/make_sf1.py [SRC_DIR] [OUT_DIR] [COPIES]
    # defaults: /root/testdata/sf0.1  /tmp/graft_sf1  10

Design notes (what "realistic 10x" means here):
  - region/nation are FIXED dimensions (TPC-H keeps them constant across
    scale factors) — copied once, never replicated.
  - fact/entity ids offset by k * table_size per copy k, so each copy's
    FK edges point into its own copy (customer/orders/lineitem/events) or
    into the fixed dims (nationkey untouched).
  - document TEXT is perturbed per copy by a WORD-SUBSTITUTION map: every
    vocabulary word is replaced by an md5-derived pseudo-word of the SAME
    length, per copy. Three designs were measured before this one:
      (a) verbatim replication — every doc a 10-way near-duplicate;
      (b) word-digit suffixes — word-INTERIOR 5-gram shingles stay
          shared, minhash minima concentrate in the shared interiors and
          all 10 copies mixed into the same LSH mega-buckets (candidate
          pairs x578 for x10 docs);
      (c) an a-z Caesar rotation — cross-copy Jaccard 0, but one rotated
          copy's md5 landscape degenerated (a 703-doc band bucket vs
          sf0.1's max of 31: with a 31-word vocabulary the 4 band-window
          minima can co-occur corpus-wide, and each copy is a fresh draw).
    The hash substitution keeps cross-copy Jaccard at 0 AND re-rolls each
    copy's landscape from md5 uniformly; the SALT LOOP below verifies the
    per-copy band-bucket tail stays within 3x the source's max and bumps
    the salt until every copy passes, so the generated set provably
    replicates the source's within-copy LSH structure x10 with nothing
    cross-copy. Word lengths, frequencies, duplicate rate and n_chars are
    preserved exactly.
  - embeddings are circularly ROTATED by k positions per copy: identical
    value/norm distributions, but rotated random vectors are uncorrelated
    with their originals, so the ANN/near-dup tier sees 10x genuinely new
    vectors instead of 10-way exact duplicates.
  - events keep their timestamps (10x density over the same span — the
    production shape of traffic growth); event/user ids offset per copy.
  - written through DuckDB COPY with its default row-group size, so sf1
    files carry MULTIPLE row groups and Spark scans split without
    Tables.parallelize (unlike the single-row-group driver testdata).
"""
import os
import sys

import duckdb


HEX2ALPHA = str.maketrans("0123456789abcdef", "abcdefghijklmnop")
SHINGLE = 5


def pseudo_word(word: str, copy: int, salt: int) -> str:
    """Same-length md5-derived pseudo-word, deterministic per (copy, salt)."""
    import hashlib
    out = ""
    i = 0
    while len(out) < len(word):
        out += hashlib.md5(
            f"{salt}:{copy}:{i}:{word}".encode()).hexdigest()
        i += 1
    return out.translate(HEX2ALPHA)[:len(word)]


def band_max(texts) -> int:
    """Largest LSH band bucket over `texts` under the engine's exact
    signature recipe (q36: 2 bands x 4 md5 hex windows) — the statistic the
    salt loop bounds so no copy degenerates into a candidate mega-bucket."""
    import hashlib
    from collections import Counter
    win_cache = {}

    def windows(sh: str):
        w = win_cache.get(sh)
        if w is None:
            a = hashlib.md5(sh.encode()).hexdigest()
            b = hashlib.md5(("x" + sh).encode()).hexdigest()
            w = [a[0:8], a[8:16], a[16:24], a[24:32],
                 b[0:8], b[8:16], b[16:24], b[24:32]]
            win_cache[sh] = w
        return w

    b0, b1 = Counter(), Counter()
    for t in texts:
        shingles = {t[i:i + SHINGLE] for i in range(len(t) - SHINGLE + 1)}
        mins = [None] * 8
        for sh in shingles:
            for j, wv in enumerate(windows(sh)):
                if mins[j] is None or wv < mins[j]:
                    mins[j] = wv
        b0["|".join(mins[0:4])] += 1
        b1["|".join(mins[4:8])] += 1
    return max(max(b0.values()), max(b1.values()))


def write_documents(con, src: str, out: str, copies: int, nd: int) -> None:
    rows = con.execute(
        f"SELECT doc_id, text, lang, source, n_chars "
        f"FROM '{src}/documents.parquet' ORDER BY doc_id").fetchall()
    vocab = sorted({w for _, t, _, _, _ in rows for w in t.split()})
    src_max = band_max([t for _, t, _, _, _ in rows])
    cap = 3 * src_max
    salt = 0
    while True:
        ok = True
        all_rows = list(rows)  # copy 0 verbatim
        for k in range(1, copies):
            m = {w: pseudo_word(w, k, salt) for w in vocab}
            if len(set(m.values())) != len(m):
                ok = False  # pseudo-word collision: re-roll
                break
            copy_rows = [(did + k * nd,
                          " ".join(m[w] for w in t.split()), lang, srcc, nch)
                         for did, t, lang, srcc, nch in rows]
            bm = band_max([t for _, t, _, _, _ in copy_rows])
            if bm > cap:
                print(f"documents: salt {salt} copy {k} band max {bm} > "
                      f"cap {cap} (src max {src_max}) — re-rolling")
                ok = False
                break
            all_rows.extend(copy_rows)
        if ok:
            break
        salt += 1
        assert salt < 64, "no salt produced clean copies"
    # n_chars stays valid: pseudo-words preserve every word's length
    assert all(len(t) == nch for _, t, _, _, nch in all_rows)
    import pandas as pd
    df = pd.DataFrame(all_rows,
                      columns=["doc_id", "text", "lang", "source", "n_chars"])
    con.register("docs_sf1", df)
    con.execute(f"COPY (SELECT doc_id, text, lang, source, n_chars "
                f"FROM docs_sf1 ORDER BY doc_id) "
                f"TO '{out}/documents.parquet' (FORMAT PARQUET)")
    con.unregister("docs_sf1")
    print(f"documents: {len(rows)} -> {len(all_rows)} (salt {salt}, "
          f"src band max {src_max}, cap {cap})")


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_sf1"
    copies = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()

    def write(table: str, select_for_copy) -> None:
        parts = " UNION ALL ".join(select_for_copy(k) for k in range(copies))
        con.execute(
            f"COPY ({parts}) TO '{out}/{table}.parquet' (FORMAT PARQUET)")
        n_src = con.execute(
            f"SELECT count(*) FROM '{src}/{table}.parquet'").fetchone()[0]
        n_out = con.execute(
            f"SELECT count(*) FROM '{out}/{table}.parquet'").fetchone()[0]
        assert n_out == n_src * copies, (table, n_src, n_out)
        print(f"{table}: {n_src} -> {n_out}")

    # fixed dimensions: copied once
    for dim in ("region", "nation"):
        con.execute(f"COPY (SELECT * FROM '{src}/{dim}.parquet') "
                    f"TO '{out}/{dim}.parquet' (FORMAT PARQUET)")
        print(f"{dim}: copied (fixed dimension)")

    sizes = {t: con.execute(
        f"SELECT count(*) FROM '{src}/{t}.parquet'").fetchone()[0]
        for t in ("customer", "supplier", "part", "orders", "lineitem",
                  "events", "documents", "embeddings")}
    nc, ns, np_, no = (sizes["customer"], sizes["supplier"], sizes["part"],
                       sizes["orders"])
    ne, nd, nv = sizes["events"], sizes["documents"], sizes["embeddings"]

    write("customer", lambda k:
          f"SELECT c_custkey + {k * nc} AS c_custkey, c_name, c_nationkey, "
          f"c_acctbal, c_mktsegment FROM '{src}/customer.parquet'")
    write("supplier", lambda k:
          f"SELECT s_suppkey + {k * ns} AS s_suppkey, s_name, s_nationkey, "
          f"s_acctbal FROM '{src}/supplier.parquet'")
    write("part", lambda k:
          f"SELECT p_partkey + {k * np_} AS p_partkey, p_name, p_brand, "
          f"p_type, p_size, p_retailprice FROM '{src}/part.parquet'")
    write("orders", lambda k:
          f"SELECT o_orderkey + {k * no} AS o_orderkey, "
          f"o_custkey + {k * nc} AS o_custkey, o_orderstatus, o_totalprice, "
          f"o_orderdate, o_orderpriority FROM '{src}/orders.parquet'")
    write("lineitem", lambda k:
          f"SELECT l_orderkey + {k * no} AS l_orderkey, "
          f"l_partkey + {k * np_} AS l_partkey, "
          f"l_suppkey + {k * ns} AS l_suppkey, l_linenumber, l_quantity, "
          f"l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus, "
          f"l_shipdate FROM '{src}/lineitem.parquet'")
    # user population grows with the traffic (max user_id is dense-ish)
    nu = con.execute(f"SELECT max(user_id) + 1 FROM "
                     f"'{src}/events.parquet'").fetchone()[0]
    write("events", lambda k:
          f"SELECT event_id + {k * ne} AS event_id, ts, "
          f"user_id + {k * nu} AS user_id, event_type, value, props "
          f"FROM '{src}/events.parquet'")
    write_documents(con, src, out, copies, nd)
    write("embeddings", lambda k:
          f"SELECT vec_id + {k * nv} AS vec_id, embedding, label "
          f"FROM '{src}/embeddings.parquet'" if k == 0 else
          f"SELECT vec_id + {k * nv} AS vec_id, "
          f"CAST(list_concat(embedding[{k + 1}:], embedding[1:{k}]) "
          f"AS FLOAT[]) AS embedding, label "
          f"FROM '{src}/embeddings.parquet'")

    # FK sanity: every edge resolves
    checks = [
        ("orders->customer", "SELECT count(*) FROM "
         f"'{out}/orders.parquet' o LEFT JOIN '{out}/customer.parquet' c "
         "ON o.o_custkey = c.c_custkey WHERE c.c_custkey IS NULL"),
        ("lineitem->orders", "SELECT count(*) FROM "
         f"'{out}/lineitem.parquet' l LEFT JOIN '{out}/orders.parquet' o "
         "ON l.l_orderkey = o.o_orderkey WHERE o.o_orderkey IS NULL"),
        ("lineitem->part", "SELECT count(*) FROM "
         f"'{out}/lineitem.parquet' l LEFT JOIN '{out}/part.parquet' p "
         "ON l.l_partkey = p.p_partkey WHERE p.p_partkey IS NULL"),
        ("lineitem->supplier", "SELECT count(*) FROM "
         f"'{out}/lineitem.parquet' l LEFT JOIN '{out}/supplier.parquet' s "
         "ON l.l_suppkey = s.s_suppkey WHERE s.s_suppkey IS NULL"),
        ("customer->nation", "SELECT count(*) FROM "
         f"'{out}/customer.parquet' c LEFT JOIN '{out}/nation.parquet' n "
         "ON c.c_nationkey = n.n_nationkey WHERE n.n_nationkey IS NULL"),
    ]
    for name, q in checks:
        orphans = con.execute(q).fetchone()[0]
        assert orphans == 0, (name, orphans)
        print(f"FK {name}: 0 orphans")
    # id uniqueness after offsetting
    for t, key in [("customer", "c_custkey"), ("orders", "o_orderkey"),
                   ("part", "p_partkey"), ("supplier", "s_suppkey"),
                   ("events", "event_id"), ("documents", "doc_id"),
                   ("embeddings", "vec_id")]:
        n, nd_ = con.execute(f"SELECT count(*), count(DISTINCT {key}) "
                             f"FROM '{out}/{t}.parquet'").fetchone()
        assert n == nd_, (t, n, nd_)
    print("id uniqueness: OK")


if __name__ == "__main__":
    main()
