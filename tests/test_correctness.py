"""Oracle-diff tests: every registered query vs its DuckDB oracle (sf0.001).

Mirrors the driver's gate (row count + columns + order-insensitive value
compare). The full sf0.01 sweep runs via tools/check_correctness.py; tests
use the smoke fixtures to stay fast.
"""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tools.check_correctness import compare  # reuse the canonical comparator

from iceberg_benchmark_java_spark.queries import all_oracles, all_queries
from tests.conftest import SF_SMOKE

QUERIES = all_queries()
ORACLES = all_oracles()

# Two-tier invocation: the 125 verbatim corpus entries re-execute the full
# reference SQL through Spark AND DuckDB — the bulk of the suite's wall
# time — and are additionally swept by tools/check_correctness.py each
# round, so the fast tier (`pytest -m "not slow"`) keeps every non-corpus
# operator oracle-checked while the corpus tier runs under `-m slow` /
# the plain full suite.
_PARAMS = [
    pytest.param(n, marks=pytest.mark.slow) if n.startswith("corpus_") else n
    for n in sorted(QUERIES)
]


@pytest.mark.parametrize("name", _PARAMS)
def test_query_matches_oracle(spark, duck, name):
    sdf = QUERIES[name](spark, SF_SMOKE).toPandas()
    if name not in ORACLES:
        assert len(sdf) >= 0  # rows-only check (non-SQL-expressible op)
        return
    ddf = duck.sql(ORACLES[name]).df()
    errs = compare(name, sdf, ddf)
    assert not errs, f"{name}: " + "; ".join(errs)


def test_every_query_has_oracle_or_is_documented():
    missing = set(QUERIES) - set(ORACLES)
    # Policy: every registered query ships an oracle unless genuinely
    # non-SQL-expressible; keep this list explicit and tiny. Round 4:
    # the list is EMPTY — the last holdout (pipe_ann_ivf_refined) became
    # oracle-checkable once k-means member means moved to fixed-point
    # accumulation (order-independent BIGINT sums, bit-identical across
    # engines; see operators/similarity.py kmeans_refine).
    assert missing == set(), f"queries without oracles: {missing}"
