"""Compare two bench.py JSON lines (e.g. BENCH_r1.json vs BENCH_r2.json).

Usage: python tools/compare_bench.py <old.json> <new.json> [threshold_pct]

Prints per-query deltas sorted by regression size and exits 1 if any
query regressed more than threshold_pct (default 25%) — the cross-round
performance gate.

Host-noise classification: when both files carry the fixed-query ``probe``
block (bench.py best-of-3 on corpus_tpch_q01, whose code and data never
change), a probe move beyond the threshold means the HOST shifted, not the
code — per-query regressions up to the probe's ratio are then reclassified
as host-noise and do not fail the gate (only the residual beyond the probe
ratio counts).
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
    # probe-based host-noise ratio: how much the fixed, code-stable query
    # moved between the two runs (1.0 = no host shift / probe absent)
    probe_ratio = 1.0
    p_old, p_new = old.get("probe"), new.get("probe")
    if (
        p_old
        and p_new
        and p_old.get("query") == p_new.get("query")
        and p_old.get("best")
    ):
        observed = max(1.0, p_new["best"] / p_old["best"])
        # The discount only arms when the probe itself moved beyond the
        # threshold (a genuine host shift); ordinary probe wobble must not
        # silently raise the effective regression gate for every query.
        if observed > 1.0 + threshold / 100.0:
            probe_ratio = observed
            print(
                f"probe {p_new['query']}: {p_old['best']} -> {p_new['best']} sec "
                f"(x{probe_ratio:.2f}) — host shifted; regressions up to "
                f"x{probe_ratio:.2f} classified as host-noise"
            )
        else:
            print(
                f"probe {p_new['query']}: {p_old['best']} -> {p_new['best']} sec "
                f"(x{observed:.2f}) — within threshold, no host-noise discount"
            )
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
        noise = ""
        if pct is not None and pct > threshold:
            # residual regression after discounting the probe's host shift
            residual_pct = ((t_new / probe_ratio) - t_old) / t_old * 100.0
            if residual_pct > threshold:
                regressed.append(q)
            else:
                noise = "  [host-noise]"
        print(
            f"{tag}  {q:40s} "
            f"{t_old if t_old is not None else '-':>8} -> {t_new:>8}{noise}"
        )
    print(
        f"total: {old.get('value')} -> {new.get('value')} sec"
        f"  ({len(regressed)} queries regressed > {threshold}%)"
    )
    return 1 if regressed else 0


if __name__ == "__main__":
    raise SystemExit(main())
