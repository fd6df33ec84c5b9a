"""Query discovery & templating (harness operators A6/A7).

Reproduces the reference's semantics exactly:
- discovery lists a directory, keeps regular ``*.sql`` files, and sorts by
  filename so execution order is fixed (IcebergBenchmark.java:155-169);
  a missing directory is a warning, not an error.
- templating substitutes ``${database}`` → catalog name and ``${schema}`` →
  database name by plain string replacement (IcebergBenchmark.java:174-175).
"""

from __future__ import annotations

import warnings
from pathlib import Path


def discover_queries(query_dir: str | Path) -> list[Path]:
    """Sorted regular *.sql files in query_dir (A6). Missing dir → []."""
    d = Path(query_dir)
    if not d.is_dir():
        warnings.warn(f"query directory not found: {d}", stacklevel=2)
        return []
    return sorted(p for p in d.glob("*.sql") if p.is_file())


def render_query(sql_text: str, catalog: str, schema: str) -> str:
    """``${database}``/``${schema}`` substitution (A7).

    Extension over the reference: with no catalog configured (local
    temp-view mode) the whole dotted prefix is stripped — temp views are
    unqualified — so one corpus serves both the Iceberg-catalog and
    parquet-view paths."""
    if not catalog:
        return sql_text.replace("${database}.${schema}.", "")
    return sql_text.replace("${database}", catalog).replace("${schema}", schema)


def load_query(path: str | Path, catalog: str, schema: str) -> str:
    return render_query(Path(path).read_text(), catalog, schema)
