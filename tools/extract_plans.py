#!/usr/bin/env python3
"""Split an ExplainAll-style dump (===== qname ===== sections) into
per-query files <outdir>/<qname>_<suffix>.txt for the named queries.

Usage: extract_plans.py <dump> <outdir> <suffix> <query>...
"""
import sys
import os


def main() -> None:
    dump, outdir, suffix = sys.argv[1], sys.argv[2], sys.argv[3]
    wanted = set(sys.argv[4:])
    os.makedirs(outdir, exist_ok=True)
    cur, buf = None, []
    written = set()

    def flush():
        if cur and (not wanted or cur in wanted):
            with open(os.path.join(outdir, f"{cur}_{suffix}.txt"), "w") as f:
                f.write("".join(buf).strip() + "\n")
            written.add(cur)

    with open(dump) as f:
        for line in f:
            if line.startswith("===== ") and line.rstrip().endswith(" ====="):
                flush()
                cur = line.strip().strip("=").strip()
                buf = []
            elif cur is not None:
                buf.append(line)
    flush()
    missing = wanted - written
    if missing:
        print(f"WARNING: not found in dump: {sorted(missing)}", file=sys.stderr)
    print(f"wrote {len(written)} plan files to {outdir}")


if __name__ == "__main__":
    main()
