#!/usr/bin/env python3
"""Compare two bench JSONs (current vs previous round) and flag per-query
regressions — the quiet-window discipline in PERF.md means a real
regression should reproduce here, not just drift with VM contention.

Usage: python scripts/bench_diff.py BENCH_LOCAL.json prev.json [ratio]
Prints queries slower than ``ratio``× their previous best (default 1.5),
new/removed queries, and the total delta. Exit code 1 if any regression
exceeds the threshold AND is slower by more than 0.3 s absolute (filters
the fixed-overhead noise on sub-second queries).
"""

from __future__ import annotations

import json
import sys


def main() -> None:
    cur_p, prev_p = sys.argv[1], sys.argv[2]
    ratio = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5
    cur = json.load(open(cur_p))
    prev = json.load(open(prev_p))
    cq, pq = cur["queries"], prev["queries"]

    regressions = []
    improvements = []
    for name in sorted(set(cq) & set(pq)):
        c, p = cq[name], pq[name]
        if p > 0 and c > ratio * p and c - p > 0.3:
            regressions.append((name, p, c, c / p))
        elif c < p / ratio and p - c > 0.3:
            improvements.append((name, p, c, c / p))

    new = sorted(set(cq) - set(pq))
    gone = sorted(set(pq) - set(cq))

    print(f"total: {prev.get('value')} -> {cur.get('value')} "
          f"({len(pq)} -> {len(cq)} queries)")
    if new:
        print(f"new: {', '.join(new)}")
    if gone:
        print(f"removed: {', '.join(gone)}")
    for name, p, c, r in sorted(regressions, key=lambda x: -x[3]):
        print(f"REGRESSION {name}: {p:.2f}s -> {c:.2f}s ({r:.2f}x)")
    for name, p, c, r in sorted(improvements, key=lambda x: x[3])[:10]:
        print(f"improved   {name}: {p:.2f}s -> {c:.2f}s ({r:.2f}x)")
    if not regressions:
        print("no per-query regressions above threshold")
    sys.exit(1 if regressions else 0)


if __name__ == "__main__":
    main()
