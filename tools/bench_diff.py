#!/usr/bin/env python3
"""Round-over-round bench regression guard.

Usage: python3 tools/bench_diff.py BENCH_rPREV.json BENCH_rCUR.json [ratio]

Compares per-query seconds on the names timed in BOTH rounds (the bench
only itemizes the slowest queries per round, so the shared set shifts)
and flags every query slower than `ratio` (default 1.5x). Exit 1 if any
flagged — run this after every local bench so a 5x regression is caught
by the builder, not the judge (round-8 postmortem).

Accepts either the driver artifact shape ({"parsed": {"queries": ...}})
or the raw bench JSON line ({"queries": ...}).
"""
import json
import sys


def load_queries(path):
    with open(path) as f:
        d = json.load(f)
    if "parsed" in d:
        d = d["parsed"]
    return d.get("queries", {}), d.get("value"), d.get("n_queries")


def main():
    prev_path, cur_path = sys.argv[1], sys.argv[2]
    ratio = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5
    prev, prev_total, prev_n = load_queries(prev_path)
    cur, cur_total, cur_n = load_queries(cur_path)
    shared = sorted(set(prev) & set(cur))
    if not shared:
        print("no shared queries between the two files")
        sys.exit(2)
    ps = sum(prev[q] for q in shared)
    cs = sum(cur[q] for q in shared)
    print(f"totals: prev={prev_total}s ({prev_n} queries)  "
          f"cur={cur_total}s ({cur_n} queries)")
    print(f"shared {len(shared)} queries: {ps:.2f}s -> {cs:.2f}s "
          f"({cs / ps:.2f}x)")
    flagged = []
    for q in shared:
        # sub-0.3s timings are noise-dominated; only flag meaningful time
        if prev[q] > 0 and cur[q] / prev[q] > ratio and cur[q] >= 0.3:
            flagged.append((cur[q] / prev[q], q, prev[q], cur[q]))
    for r, q, p, c in sorted(flagged, reverse=True):
        print(f"REGRESSED {q}: {p:.2f}s -> {c:.2f}s ({r:.1f}x)")
    improved = [(prev[q] / cur[q], q, prev[q], cur[q]) for q in shared
                if cur[q] > 0 and prev[q] / cur[q] > ratio and prev[q] >= 0.3]
    for r, q, p, c in sorted(improved, reverse=True)[:10]:
        print(f"improved  {q}: {p:.2f}s -> {c:.2f}s ({r:.1f}x faster)")
    print(f"== {len(flagged)} regressed beyond {ratio}x ==")
    sys.exit(1 if flagged else 0)


if __name__ == "__main__":
    main()
