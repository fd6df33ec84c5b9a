"""Join-shape operators beyond the TPC-H module (SURVEY §2-B "Joins").

FULL OUTER with multi-key ON, self-joins with theta predicates,
equality-on-expression joins, and the case/coalesce scalar-function surface
— each cited to its corpus source.

Scale notes: self-joins re-use the same scan (Spark reuses the exchange
under AQE); full outer joins shuffle both sides on the join key — keys here
are group keys of pre-aggregated inputs, so cardinality is bounded before
the join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions import sql_dsum
from .registry import query


# --- FULL OUTER JOIN with two-key ON (tpcds/q51.sql:47-48, q97.sql:33) -------
@query(
    "join_full_outer_channels",
    oracle=f"""
    WITH open_m AS (
      SELECT EXTRACT(YEAR FROM o_orderdate) AS yr, EXTRACT(MONTH FROM o_orderdate) AS mth,
             {sql_dsum("o_totalprice", "open_sales")}
      FROM orders WHERE o_orderstatus = 'O' GROUP BY 1, 2
    ),
    fin_m AS (
      SELECT EXTRACT(YEAR FROM o_orderdate) AS yr, EXTRACT(MONTH FROM o_orderdate) AS mth,
             {sql_dsum("o_totalprice", "fin_sales")}
      FROM orders WHERE o_orderstatus = 'F' GROUP BY 1, 2
    )
    SELECT COALESCE(o.yr, f.yr) AS yr, COALESCE(o.mth, f.mth) AS mth,
           COALESCE(o.open_sales, 0.0) AS open_sales,
           COALESCE(f.fin_sales, 0.0) AS fin_sales
    FROM open_m o FULL JOIN fin_m f ON o.yr = f.yr AND o.mth = f.mth
    """,
)
def full_outer_channels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL JOIN aligning two channel aggregates on a two-part key, with
    COALESCE on both key and measure (tpcds/q51.sql:43-59 web/store
    alignment; COALESCE idiom of tpcds/q80.sql:6-7)."""
    o = load_table(spark, sf_dir, "orders")

    def monthly(status: str, alias: str) -> DataFrame:
        return (
            o.filter(F.col("o_orderstatus") == status)
            .groupBy(
                F.year("o_orderdate").alias("yr"), F.month("o_orderdate").alias("mth")
            )
            .agg(
                F.round(F.sum(F.col("o_totalprice").cast("decimal(18,4)")), 2)
                .cast("double")
                .alias(alias)
            )
        )

    om = monthly("O", "open_sales")
    fm = monthly("F", "fin_sales").withColumnsRenamed({"yr": "f_yr", "mth": "f_mth"})
    return om.join(
        fm, (om.yr == fm.f_yr) & (om.mth == fm.f_mth), "full"
    ).select(
        F.coalesce(om.yr, fm.f_yr).alias("yr"),
        F.coalesce(om.mth, fm.f_mth).alias("mth"),
        F.coalesce(F.col("open_sales"), F.lit(0.0)).alias("open_sales"),
        F.coalesce(F.col("fin_sales"), F.lit(0.0)).alias("fin_sales"),
    )


# --- self-join with <> and <= theta predicates (tpcds/q64.sql:102-109) -------
@query(
    "join_self_theta",
    oracle="""
    WITH per_year AS (
      SELECT o_custkey AS custkey, EXTRACT(YEAR FROM o_orderdate) AS yr,
             CAST(COUNT(*) AS BIGINT) AS cnt
      FROM orders GROUP BY 1, 2
    )
    SELECT y1.custkey AS custkey, y1.yr AS yr1, y1.cnt AS cnt1,
           y2.yr AS yr2, y2.cnt AS cnt2
    FROM per_year y1 JOIN per_year y2
      ON y1.custkey = y2.custkey AND y2.yr = y1.yr + 1 AND y2.cnt <= y1.cnt
    WHERE y1.cnt >= 3
    """,
)
def self_theta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Self-join of a grouped CTE on offset key + <= theta residual —
    the cs1/cs2 cross_sales shape of tpcds/q64.sql:102-109 and the
    inv1/inv2 month-offset shape of tpcds/q39_1.sql:44-51."""
    o = load_table(spark, sf_dir, "orders")
    per_year = o.groupBy(
        F.col("o_custkey").alias("custkey"), F.year("o_orderdate").alias("yr")
    ).agg(F.count("*").alias("cnt"))
    y1 = per_year.alias("y1")
    y2 = per_year.alias("y2")
    return (
        y1.filter(F.col("cnt") >= 3)
        .join(
            y2,
            (F.col("y1.custkey") == F.col("y2.custkey"))
            & (F.col("y2.yr") == F.col("y1.yr") + 1)
            & (F.col("y2.cnt") <= F.col("y1.cnt")),
        )
        .select(
            F.col("y1.custkey").alias("custkey"),
            F.col("y1.yr").alias("yr1"),
            F.col("y1.cnt").alias("cnt1"),
            F.col("y2.yr").alias("yr2"),
            F.col("y2.cnt").alias("cnt2"),
        )
    )


# --- equality-on-expression join (tpcds/q08.sql:438, q24_1.sql:27) -----------
@query(
    "join_on_expression",
    oracle="""
    SELECT n.n_name AS nation, CAST(COUNT(*) AS BIGINT) AS n_pairs
    FROM supplier s JOIN customer c
      ON (s.s_suppkey % 25) = (c.c_custkey % 25)
         AND s.s_nationkey = c.c_nationkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    GROUP BY n.n_name
    """,
)
def on_expression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join keyed on computed expressions (substr/upper equality joins of
    tpcds/q08.sql:438 and q24_1.sql:27 — here modulo-bucket equality).
    Still an equi-join: Spark hashes the expression values."""
    s = load_table(spark, sf_dir, "supplier")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    return (
        s.join(
            c,
            ((s.s_suppkey % 25) == (c.c_custkey % 25))
            & (s.s_nationkey == c.c_nationkey),
        )
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(F.count("*").alias("n_pairs"))
    )


# --- scalar-function surface: CASE forms, coalesce, round, abs, upper, concat
@query(
    "join_scalar_function_surface",
    oracle="""
    SELECT CONCAT(UPPER(p_brand), '-', SUBSTR(p_type, 1, 3)) AS brand_code,
           CASE WHEN p_size < 10 THEN 'small'
                WHEN p_size < 30 THEN 'medium'
                ELSE 'large' END AS size_class,
           CASE p_type WHEN 'PROMO' THEN 1 ELSE 0 END AS is_promo,
           ROUND(ABS(p_retailprice - 1000.0), 2) AS price_dist,
           COALESCE(NULLIF(p_brand, 'Brand#1'), '<hidden>') AS brand_masked,
           p_partkey AS partkey
    FROM part
    WHERE p_partkey <= 100
    """,
)
def scalar_function_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The complete scalar-function surface of SURVEY §2-B in one
    projection: searched CASE (tpch/q14.sql:1), simple CASE
    (tpcds/q39_1.sql:10), concat (tpcds/q80.sql:81), coalesce
    (tpcds/q78.sql:54), round (tpcds/q02.sql:39), abs (tpcds/q57.sql:56),
    upper (tpcds/q24_1.sql:27), substr (tpch/q22.sql:8)."""
    p = load_table(spark, sf_dir, "part").filter(F.col("p_partkey") <= 100)
    return p.select(
        F.concat(F.upper("p_brand"), F.lit("-"), F.substring("p_type", 1, 3)).alias(
            "brand_code"
        ),
        F.when(F.col("p_size") < 10, "small")
        .when(F.col("p_size") < 30, "medium")
        .otherwise("large")
        .alias("size_class"),
        F.when(F.col("p_type") == "PROMO", 1).otherwise(0).alias("is_promo"),
        F.round(F.abs(F.col("p_retailprice") - 1000.0), 2).alias("price_dist"),
        F.coalesce(F.nullif("p_brand", F.lit("Brand#1")), F.lit("<hidden>")).alias(
            "brand_masked"
        ),
        F.col("p_partkey").alias("partkey"),
    )


# --- extended string-function surface (beyond-reference breadth) -------------
@query(
    "join_string_functions_extended",
    oracle="""
    SELECT p_partkey AS partkey,
           TRIM(CONCAT('  ', p_name, ' ')) AS trimmed,
           LPAD(p_brand, 12, '*') AS padded,
           TRANSLATE(p_type, 'AEIOU', 'aeiou') AS translated,
           REGEXP_EXTRACT(p_name, '([a-z]+)$', 1) AS last_word,
           REVERSE(p_brand) AS rev_brand,
           CAST(LENGTH(p_name) AS INTEGER) AS name_len,
           CONCAT_WS('|', p_brand, p_type) AS joined
    FROM part WHERE p_partkey < 100
    """,
)
def string_functions_extended(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String-function breadth beyond the corpus's substr/concat/upper
    (SURVEY §2-B scalar 'not present' row): trim, pad, translate,
    regexp_extract, reverse, concat_ws — all JVM built-ins, all portable
    to the DuckDB oracle."""
    p = load_table(spark, sf_dir, "part").filter(F.col("p_partkey") < 100)
    return p.select(
        F.col("p_partkey").alias("partkey"),
        F.trim(F.concat(F.lit("  "), F.col("p_name"), F.lit(" "))).alias("trimmed"),
        F.lpad("p_brand", 12, "*").alias("padded"),
        F.translate("p_type", "AEIOU", "aeiou").alias("translated"),
        F.regexp_extract("p_name", r"([a-z]+)$", 1).alias("last_word"),
        F.reverse("p_brand").alias("rev_brand"),
        F.length("p_name").cast("int").alias("name_len"),
        F.concat_ws("|", "p_brand", "p_type").alias("joined"),
    )


# --- extended date-function surface ------------------------------------------
@query(
    "join_date_functions_extended",
    oracle="""
    SELECT CAST(EXTRACT(QUARTER FROM o_orderdate) AS INTEGER) AS qtr,
           CAST(DATE_TRUNC('month', CAST(o_orderdate AS DATE)) AS DATE) AS month_start,
           CAST(LAST_DAY(CAST(o_orderdate AS DATE)) AS DATE) AS month_end,
           CAST(CAST(o_orderdate AS DATE) + INTERVAL 2 MONTH AS DATE) AS plus_2m,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM orders WHERE o_custkey < 20
    GROUP BY 1, 2, 3, 4
    """,
)
def date_functions_extended(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date-function breadth beyond the corpus's extract/interval: quarter,
    date_trunc, last_day, add_months — grouped so the oracle compare also
    exercises date-keyed aggregation."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") < 20)
    d = F.col("o_orderdate").cast("date")
    return (
        o.groupBy(
            F.quarter("o_orderdate").alias("qtr"),
            F.date_trunc("month", d).cast("date").alias("month_start"),
            F.last_day(d).alias("month_end"),
            F.add_months(d, 2).alias("plus_2m"),
        )
        .agg(F.count("*").alias("n"))
    )


# --- returns-adjusted sales: compound-key LEFT JOIN (tpcds/q93.sql) ----------
@query(
    "join_compound_key_left_adjust",
    oracle="""
    SELECT t.l_suppkey AS suppkey,
           CAST(ROUND(SUM(CAST(act_sales AS DECIMAL(38,12))), 2) AS DOUBLE)
             AS sumsales
    FROM (SELECT l1.l_suppkey,
                 CASE WHEN r.l_orderkey IS NOT NULL
                      THEN (l1.l_quantity - r.ret_qty) * l1.l_extendedprice
                           / NULLIF(l1.l_quantity, 0)
                      ELSE l1.l_extendedprice END AS act_sales
          FROM lineitem l1
          LEFT JOIN (SELECT l_orderkey, l_linenumber,
                            SUM(l_quantity) AS ret_qty
                     FROM lineitem WHERE l_returnflag = 'R'
                     GROUP BY l_orderkey, l_linenumber) r
            ON l1.l_orderkey = r.l_orderkey
           AND l1.l_linenumber = r.l_linenumber) t
    GROUP BY t.l_suppkey
    """,
)
def compound_key_left_adjust(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-key LEFT JOIN against a pre-aggregated returns side with a
    null-branch CASE adjustment (tpcds/q93.sql:1-15 shape). The join keys
    are the fact's natural compound key — one shuffle each side, no
    row-count blowup."""
    l = load_table(spark, sf_dir, "lineitem")
    returns = (
        l.filter(F.col("l_returnflag") == "R")
        .groupBy("l_orderkey", "l_linenumber")
        .agg(F.sum("l_quantity").alias("ret_qty"))
        .withColumnRenamed("l_orderkey", "r_orderkey")
        .withColumnRenamed("l_linenumber", "r_linenumber")
    )
    joined = l.join(
        returns,
        (l.l_orderkey == returns.r_orderkey)
        & (l.l_linenumber == returns.r_linenumber),
        "left",
    )
    act = F.when(
        F.col("r_orderkey").isNotNull(),
        (F.col("l_quantity") - F.col("ret_qty"))
        * F.col("l_extendedprice")
        / F.nullif(F.col("l_quantity"), F.lit(0.0)),
    ).otherwise(F.col("l_extendedprice"))
    return (
        joined.select(F.col("l_suppkey").alias("suppkey"), act.alias("act_sales"))
        .groupBy("suppkey")
        .agg(
            F.round(F.sum(F.col("act_sales").cast("decimal(38,12)")), 2)
            .cast("double")
            .alias("sumsales")
        )
    )


# --- as-of join (backward, events) -------------------------------------------
@query(
    "join_asof_events",
    oracle="""
    WITH build AS (
      SELECT user_id, ts, MAX(event_id) AS purchase_id
      FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts
    ),
    probe AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click')
    SELECT p.event_id AS click_id, p.user_id AS user_id, p.ts AS click_ts,
           b.purchase_id AS purchase_id, b.ts AS purchase_ts
    FROM probe p
    ASOF LEFT JOIN build b ON p.user_id = b.user_id AND p.ts >= b.ts
    """,
)
def asof_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backward as-of join: each click matched to the user's most recent
    purchase at-or-before it (NULL when none). Spark lacks ASOF JOIN;
    operators.asof.asof_join_backward composes it as union + one running
    window — a single shuffle on user_id, no pair-space materialization
    (DuckDB's native ASOF JOIN is the oracle). Build-side (user_id, ts)
    ties are pre-resolved with MAX(event_id) on both sides, since as-of
    over an ambiguous build side is nondeterministic in any engine."""
    from ..operators.asof import asof_join_backward

    e = load_table(spark, sf_dir, "events")
    probe = e.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), F.col("user_id"), F.col("ts")
    )
    build = (
        e.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("purchase_id"))
        .select("user_id", "ts", "purchase_id", F.col("ts").alias("purchase_ts"))
    )
    out = asof_join_backward(
        probe, build, key="user_id", ts="ts",
        payload_cols=["purchase_id", "purchase_ts"],
    )
    return out.select(
        "click_id", "user_id", F.col("ts").alias("click_ts"),
        "purchase_id", "purchase_ts",
    )


# --- range (interval containment) join ---------------------------------------
@query(
    "join_range_interval",
    oracle="""
    WITH bands AS (
      SELECT n_nationkey AS band_id,
             CAST(n_nationkey * 400 - 500 AS DOUBLE) AS lo,
             CAST(n_nationkey * 400 + 800 AS DOUBLE) AS hi
      FROM nation
    )
    SELECT band_id, CAST(COUNT(*) AS BIGINT) AS n_customers,
           MIN(c_acctbal) AS min_bal, MAX(c_acctbal) AS max_bal
    FROM customer JOIN bands ON c_acctbal >= lo AND c_acctbal < hi
    GROUP BY band_id
    """,
)
def range_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-interval join of customers against overlapping balance
    bands. Written directly, Spark plans the non-equi predicate as a
    BroadcastNestedLoopJoin (quadratic off-broadcast);
    operators.asof.range_join_bucketed turns it into an equi-join on a
    quantized bucket + exact residual filter — the 100 TB formulation.
    The oracle is the naive BETWEEN join (same semantics by construction)."""
    from ..operators.asof import range_join_bucketed

    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    n = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("band_id"),
        (F.col("n_nationkey") * 400 - 500).cast("double").alias("lo"),
        (F.col("n_nationkey") * 400 + 800).cast("double").alias("hi"),
    )
    joined = range_join_bucketed(
        c, n, point_col="c_acctbal", lo_col="lo", hi_col="hi", bucket_width=400.0
    )
    return joined.groupBy("band_id").agg(
        F.count("*").alias("n_customers"),
        F.min("c_acctbal").alias("min_bal"),
        F.max("c_acctbal").alias("max_bal"),
    )


# --- collection / higher-order function surface ------------------------------
@query(
    "join_collection_functions",
    oracle="""
    WITH t AS (
      SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS w
      FROM documents WHERE doc_id < 50
    )
    SELECT doc_id,
           CAST(len(w) AS INTEGER) AS n_tokens,
           CAST(len(list_filter(w, t -> strlen(t) >= 5)) AS INTEGER) AS n_long,
           CAST(list_sum(list_transform(w, t -> strlen(t))) AS BIGINT)
             AS total_chars,
           array_to_string(list_sort(list_distinct(w))[1:3], ' ') AS first3,
           CAST(len(list_filter(w, t -> regexp_matches(t, '^[A-Z]'))) > 0
                AS INTEGER) AS has_capitalized
    FROM t
    """,
)
def collection_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order collection functions — transform/filter/exists/
    aggregate/array_sort/array_distinct/slice — all Catalyst
    HigherOrderFunctions (JVM-side, codegen'd; zero Python). The inventory
    row proving the engine's array surface maps 1:1 onto DuckDB's list_*
    family for oracle purposes."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    w = F.split(F.trim(F.col("text")), r"\s+")
    tok_len = lambda t: F.length(t)  # noqa: E731
    return d.select(
        "doc_id",
        F.size(w).alias("n_tokens"),
        F.size(F.filter(w, lambda t: F.length(t) >= 5)).alias("n_long"),
        F.aggregate(
            F.transform(w, tok_len), F.lit(0).cast("long"), lambda a, x: a + x
        ).alias("total_chars"),
        F.array_join(
            F.slice(F.array_sort(F.array_distinct(w)), 1, 3), " "
        ).alias("first3"),
        F.exists(w, lambda t: t.rlike("^[A-Z]")).cast("int").alias("has_capitalized"),
    )


# --- map-type function surface -----------------------------------------------
@query(
    "join_map_functions",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT) * 2)
                AS BIGINT) AS sum_k2,
           CAST(SUM(CASE WHEN json_extract_string(props, '$.flag') IS NOT NULL
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged
    FROM events GROUP BY event_type
    """,
)
def map_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-type surface: parse the JSON props column into map<string,string>
    (from_json), then map_contains_key + element_at + transform_values —
    all JVM-side. The oracle reads the same facts via JSON path extraction;
    equality proves the map round-trip is lossless."""
    e = load_table(spark, sf_dir, "events")
    m = F.from_json(F.col("props"), "map<string,string>")
    k2 = F.element_at(
        F.transform_values(m, lambda _, v: v.cast("long") * 2), "k"
    )
    return (
        e.select(
            "event_type",
            k2.alias("k2"),
            F.map_contains_key(m, "flag").cast("int").alias("flagged"),
        )
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum("k2").alias("sum_k2"),
            F.sum("flagged").alias("n_flagged"),
        )
    )
