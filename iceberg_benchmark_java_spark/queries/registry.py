"""Query registry: the engine's operator inventory as named, testable units.

Every operator capability from SURVEY.md §2-B (plus the training-data
pipeline extensions) is registered here as:

- ``builder(spark, sf_dir) -> DataFrame`` — the idiomatic-PySpark
  implementation (DataFrame API or spark.sql where SQL is the natural form,
  e.g. correlated subqueries which Catalyst decorrelates itself), and
- ``oracle`` — an equivalent ANSI-SQL string DuckDB can run over the same
  parquet fixtures, for the driver's hash-compare correctness gate. ``None``
  marks genuinely non-SQL-expressible ops (weaker rows-only check).

Column names are aliased identically on both sides — the driver sorts
columns by name before hashing.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

Builder = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    name: str
    builder: Builder
    oracle: str | None
    doc: str


REGISTRY: dict[str, Query] = {}


def query(name: str, oracle: str | None = None) -> Callable[[Builder], Builder]:
    """Decorator registering a query builder + its DuckDB oracle SQL."""

    def wrap(fn: Builder) -> Builder:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = Query(name=name, builder=fn, oracle=oracle, doc=fn.__doc__ or "")
        return fn

    return wrap


def all_queries() -> dict[str, Builder]:
    _load_all()
    return {n: q.builder for n, q in REGISTRY.items()}


def all_oracles() -> dict[str, str]:
    _load_all()
    return {n: q.oracle for n, q in REGISTRY.items() if q.oracle is not None}


_LOADED = False


def _load_all() -> None:
    """Import every module that registers queries (idempotent)."""
    global _LOADED
    if _LOADED:
        return
    from . import (  # noqa: F401
        aggregates,
        corpus,
        joins,
        pipeline,
        setops,
        subqueries,
        tpch,
        tpch2,
        windows,
    )

    _LOADED = True
