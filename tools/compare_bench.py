"""Compare two bench.py JSON lines (e.g. BENCH_r1.json vs BENCH_r2.json).

Usage: python tools/compare_bench.py <old.json> <new.json> [threshold_pct]

Prints per-query deltas sorted by regression size and exits 1 if any
query regressed more than threshold_pct (default 25%) — the cross-round
performance gate.
"""

from __future__ import annotations

import json
import sys


def main() -> int:
    if len(sys.argv) < 3:
        print(__doc__)
        return 2
    old = json.loads(open(sys.argv[1]).read().strip().splitlines()[-1])
    new = json.loads(open(sys.argv[2]).read().strip().splitlines()[-1])
    threshold = float(sys.argv[3]) if len(sys.argv) > 3 else 25.0
    rows = []
    for q, t_new in new.get("queries", {}).items():
        t_old = old.get("queries", {}).get(q)
        if t_old is None or t_old == 0:
            rows.append((None, q, t_old, t_new))
        else:
            rows.append(((t_new - t_old) / t_old * 100.0, q, t_old, t_new))
    rows.sort(key=lambda r: (r[0] is None, -(r[0] or 0)))
    regressed = []
    for pct, q, t_old, t_new in rows:
        tag = "NEW " if pct is None else f"{pct:+7.1f}%"
        print(f"{tag}  {q:40s} {t_old if t_old is not None else '-':>8} -> {t_new:>8}")
        if pct is not None and pct > threshold:
            regressed.append(q)
    print(
        f"total: {old.get('value')} -> {new.get('value')} sec"
        f"  ({len(regressed)} queries regressed > {threshold}%)"
    )
    return 1 if regressed else 0


if __name__ == "__main__":
    raise SystemExit(main())
