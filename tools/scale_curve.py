#!/usr/bin/env python3
"""Empirical scale curve (round-8 VERDICT #5): per-query time ratio between
two scale factors measured back-to-back in one machine window.

Usage:
    python3 tools/scale_curve.py DETAIL_SF_SMALL.json DETAIL_SF_BIG.json [rows_ratio]

Inputs are Bench detail JSONs (raw one-line format or the driver wrapper);
`rows_ratio` is the data-size multiple between them (default 10: sf0.01 ->
sf0.1).

A query is flagged SUPER-LINEAR when its time ratio exceeds the rows ratio
by more than 25% AND its big-SF time is over 1 s (small queries are fixed-
overhead-dominated: a 0.25 s -> 0.45 s "1.8x" is startup noise, not a
scaling property; and sub-linear ratios are expected everywhere overhead
amortizes). Flagged queries need a scaladoc explanation or a fix.

Exit code 0 always (reporting tool, not a gate).
"""
import statistics
import sys

sys.path.insert(0, __file__.rsplit("/", 1)[0])
from compare_bench import load_text, queries_of  # noqa: E402


def main() -> None:
    if len(sys.argv) < 3:
        sys.exit(__doc__)
    rows_ratio = float(sys.argv[3]) if len(sys.argv) > 3 else 10.0
    qa = queries_of(load_text(sys.argv[1]))
    qb = queries_of(load_text(sys.argv[2]))
    common = sorted(q for q in set(qa) & set(qb) if qa[q] > 0 and qb[q] > 0)
    if not common:
        sys.exit("no overlapping successfully-measured queries")
    ratios = {q: qb[q] / qa[q] for q in common}
    med = statistics.median(ratios.values())
    print(f"# scale_curve: {sys.argv[1]} -> {sys.argv[2]} "
          f"(rows x{rows_ratio:g})")
    print(f"overlap: {len(common)} queries; median time ratio {med:.2f}x "
          f"(vs {rows_ratio:g}x rows)")
    flagged = [q for q in common
               if ratios[q] > rows_ratio * 1.25 and qb[q] > 1.0]
    print(f"\n{'query':42s} {'small':>8s} {'big':>8s} {'ratio':>7s}")
    for q in sorted(common, key=lambda q: -ratios[q]):
        mark = "  <-- SUPER-LINEAR" if q in flagged else ""
        print(f"{q:42s} {qa[q]:8.3f} {qb[q]:8.3f} {ratios[q]:6.2f}x{mark}")
    print(f"\n{len(flagged)} super-linear "
          f"(ratio > {rows_ratio * 1.25:g}x and big-SF time > 1 s): "
          f"{', '.join(flagged) if flagged else 'none'}")


if __name__ == "__main__":
    main()
