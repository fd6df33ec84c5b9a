"""Inventory of single-partition (global) WindowExec users across the
whole query registry.

A window with an EMPTY partition spec moves every row to one partition —
required semantics for the verbatim corpus's global ranks (the reference
runs those SQL texts unmodified), but a scale defect anywhere else. This
tool EXPLAINs every registered entry and prints the names whose physical
plan contains at least one unpartitioned windowspecdefinition;
tests/test_plans.py::test_global_window_allowlist pins the result so a
new entry cannot silently adopt the pattern (r10 verdict What's-wrong
#3).

Usage: python tools/window_inventory.py [sf_dir]   (prints one name/line)
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_DIRECTION = re.compile(r"(ASC|DESC) NULLS (FIRST|LAST)$")


def _split_top_level(s: str) -> list[str]:
    """Args of a call body ``s`` (text after the opening paren), split on
    top-level commas only, stopping at the call's closing paren."""
    args: list[str] = []
    depth = 0
    cur: list[str] = []
    for ch in s:
        if ch == "(":
            depth += 1
        elif ch == ")":
            if depth == 0:
                break
            depth -= 1
        if ch == "," and depth == 0:
            args.append("".join(cur).strip())
            cur = []
        else:
            cur.append(ch)
    args.append("".join(cur).strip())
    return args


def global_window_count(plan: str) -> int:
    """Number of windowspecdefinition(...) occurrences in ``plan`` with an
    empty partition spec. The printed arg order is [partition cols...,
    sort exprs..., frame]; sort exprs end with a direction, partition
    cols don't — so a spec whose every non-frame arg carries ASC/DESC has
    no partition columns and is a global window."""
    n = 0
    for m in re.finditer(r"windowspecdefinition\(", plan):
        args = _split_top_level(plan[m.end() :])
        body = [a for a in args if not a.startswith("specifiedwindowframe")]
        if body and all(_DIRECTION.search(a) for a in body):
            n += 1
    return n


def inventory(spark, queries, sf_dir: str) -> dict[str, int]:
    out: dict[str, int] = {}
    for name in sorted(queries):
        try:
            df = queries[name](spark, sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as exc:  # surface, don't hide, a broken entry
            print(f"[window-inventory] ERROR {name}: {exc}", file=sys.stderr)
            out[name] = -1
            continue
        k = global_window_count(plan)
        if k:
            out[name] = k
    return out


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    from iceberg_benchmark_java_spark.queries import all_queries
    from iceberg_benchmark_java_spark.session import (
        build_session,
        local_test_config,
    )

    spark = build_session(local_test_config("window-inventory"))
    try:
        out = inventory(spark, all_queries(), sf_dir)
    finally:
        spark.stop()
    for name, k in sorted(out.items()):
        print(f"{name} {k}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
