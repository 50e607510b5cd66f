#!/usr/bin/env python3
"""Calibration-normalized cross-round bench comparator (round-8 VERDICT #3).

Joins two BENCH artifacts and reports per-query deltas normalized by the
artifacts' own calibration probes, so machine-window drift between rounds is
divided out instead of reconstructed forensically.

Usage:
    python3 tools/compare_bench.py BENCH_rA.json BENCH_rB.json [--threshold 1.5]

Accepts either the driver's wrapper format ({"tail": "...", "parsed": {...}})
— whose `tail` may be FRONT-TRUNCATED, so everything is regex-extracted, never
json.loads'd — or a raw one-line detail JSON (/tmp/graft_bench_detail.json).

Normalizer: median of every positive calibration-probe second in each
artifact, EXCLUDING children listed under "degraded" (round-9 Bench emits
that list; older artifacts simply have no exclusions). If either artifact
predates calibration (r7 and earlier), falls back to the median per-query
ratio itself as the normalizer — self-normalizing, and printed as such.

Exit code 0 always (reporting tool, not a gate).
"""
import json
import re
import statistics
import sys


def load_text(path: str) -> str:
    raw = open(path).read()
    try:
        d = json.loads(raw)
        if isinstance(d, dict) and "tail" in d:
            return d["tail"]
    except json.JSONDecodeError:
        pass
    return raw


def queries_of(text: str) -> dict:
    """Per-query seconds. The queries object precedes drift/calibration in the
    detail line; on a front-truncated tail some leading queries are lost —
    we take every "qNNN...":float pair outside the drift object."""
    # cut the drift object away so rerun pairs don't pollute query times
    body = re.split(r'"drift":', text)[0]
    out = {}
    for m in re.finditer(r'"(q\d+[a-z0-9_]*)":(-?\d+(?:\.\d+)?)', body):
        out[m.group(1)] = float(m.group(2))
    return out


def drift_of(text: str) -> dict:
    m = re.search(r'"drift":\{(.*?)\}\s*,"calibration"', text)
    if not m:
        return {}
    out = {}
    for q in re.finditer(
            r'"(q\d+[a-z0-9_]*)":\{"insuite":(-?\d+(?:\.\d+)?),'
            r'"rerun":(-?\d+(?:\.\d+)?)\}', text):
        out[q.group(1)] = (float(q.group(2)), float(q.group(3)))
    return out


def degraded_of(text: str) -> set:
    m = re.search(r'"degraded":\[([^\]]*)\]', text)
    if not m:
        return set()
    return set(re.findall(r'"([^"]+)"', m.group(1)))


def calib_probes(text: str, excluded: set) -> list:
    """All positive probe seconds from non-degraded children."""
    m = re.search(r'"calibration":\{(.*)', text)
    if not m:
        return []
    probes = []
    for child in re.finditer(r'"((?:shard|drift)[^"]*)":\{([^}]*)\}',
                             m.group(1)):
        if child.group(1) in excluded:
            continue
        probes += [float(v) for v in
                   re.findall(r'-?\d+(?:\.\d+)?', child.group(2))
                   if float(v) > 0]
    return probes


# Retroactive window-contention rule constants — pinned to the Scala rule
# (Bench.WindowContendedK / Bench.windowContended, src/main/scala/graft/
# Bench.scala). If the Scala rule is retuned these MUST move with it, or
# old un-stamped artifacts will classify differently in the two
# implementations (r13 ADVICE #3).
WINDOW_CONTENDED_K = 3        # = Bench.WindowContendedK
WINDOW_MATERIAL_INSUITE = 1.0  # seconds; = the insuite >= 1.0 guard
WINDOW_RERUN_RATIO = 1.3       # = the rerun > 1.3x threshold


def window_contended(text: str) -> bool:
    """True when the artifact is stamped window_contended (r13 Bench), or —
    for artifacts predating the stamp — when the r13 rule applied
    retroactively to its drift map trips: more than WINDOW_CONTENDED_K
    material reruns above WINDOW_RERUN_RATIO x their in-suite time."""
    m = re.search(r'"window_contended":(true|false)', text)
    if m:
        return m.group(1) == "true"
    pairs = drift_of(text).values()
    return sum(1 for i, r in pairs
               if i >= WINDOW_MATERIAL_INSUITE
               and r > WINDOW_RERUN_RATIO * i) > WINDOW_CONTENDED_K


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    thresh = 1.5
    for a in sys.argv[1:]:
        if a.startswith("--threshold"):
            thresh = float(a.split("=", 1)[1] if "=" in a else sys.argv[
                sys.argv.index(a) + 1])
    if len(args) != 2:
        sys.exit(__doc__)
    ta, tb = load_text(args[0]), load_text(args[1])
    qa, qb = queries_of(ta), queries_of(tb)
    dega, degb = degraded_of(ta), degraded_of(tb)
    ca, cb = calib_probes(ta, dega), calib_probes(tb, degb)

    common = sorted(set(qa) & set(qb))
    ratios = {q: qb[q] / qa[q] for q in common if qa[q] > 0 and qb[q] > 0}
    if not ratios:
        sys.exit("no overlapping successfully-measured queries")

    if ca and cb:
        norm = statistics.median(cb) / statistics.median(ca)
        norm_src = (f"calibration medians {statistics.median(ca):.3f}s -> "
                    f"{statistics.median(cb):.3f}s")
    else:
        norm = statistics.median(ratios.values())
        norm_src = "median per-query ratio (no calibration in one artifact)"

    print(f"# compare_bench: {args[0]} -> {args[1]}")
    print(f"overlap: {len(common)} queries ({len(qa)} vs {len(qb)} measured)")
    print(f"normalizer: {norm:.3f}x ({norm_src})")
    if dega or degb:
        print(f"degraded children excluded: A={sorted(dega)} B={sorted(degb)}")
    med = statistics.median(ratios.values())
    wca, wcb = window_contended(ta), window_contended(tb)
    if wca or wcb:
        # r13 whole-artifact quarantine: a contended window's raw total is
        # not cross-round comparable — print only the normalized figure.
        sides = " and ".join(s for s, w in (("A", wca), ("B", wcb)) if w)
        print(f"WINDOW CONTENDED ({sides}): raw totals REFUSED — "
              f"median normalized only: {med / norm:.3f}x")
    else:
        print(f"median raw ratio: {med:.3f}x  "
              f"median normalized: {med / norm:.3f}x")

    flagged = [(q, ratios[q] / norm) for q in sorted(ratios)
               if ratios[q] / norm > thresh or ratios[q] / norm < 1 / thresh]
    flagged.sort(key=lambda kv: -abs(kv[1] - 1))
    if not flagged:
        print(f"no per-query normalized delta beyond {thresh}x — "
              "environments comparable, no code regression signal")
    else:
        print(f"\n{len(flagged)} queries beyond {thresh}x normalized "
              "(check drift reruns before blaming code):")
        da, db = drift_of(ta), drift_of(tb)
        for q, r in flagged:
            extra = ""
            if q in db:
                extra = f"  [B drift rerun {db[q][1]:.2f}s]"
            elif q in da:
                extra = f"  [A drift rerun {da[q][1]:.2f}s]"
            print(f"  {q}: {qa[q]:.2f}s -> {qb[q]:.2f}s  "
                  f"raw {ratios[q]:.2f}x  norm {ratios[q] / norm:.2f}x{extra}")


if __name__ == "__main__":
    main()
