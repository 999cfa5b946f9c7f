"""Declared query registry — the driver contract surface.

Each entry pairs a Spark implementation (built on the operator library) with
an ANSI-SQL oracle that DuckDB runs over the same parquet tables.  Names key
into SURVEY.md §2's operator inventory.

Cross-engine determinism rules used throughout (so order-insensitive value
hashes match bit-for-bit):

* money/metric sums go through ``DECIMAL`` so addition is exact in both
  engines (double summation order differs between engines), then cast back
  to double (exact for the magnitudes here);
* top-k queries always carry a unique tiebreak column in the ordering;
* vector dot products accumulate in index order with explicit double casts
  on both sides (identical IEEE op sequence → identical bits);
* every computed column is aliased identically in Spark and SQL.
"""

from __future__ import annotations

import os
import shutil
import tempfile
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .catalog import load_table
from .functions import text as TXT
from .operators import dedup, eav, relational, similarity


def _repo_tmp() -> str:
    """Scratch space inside the repo (the environment forbids writes
    elsewhere); gitignored."""
    d = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".tmp")
    os.makedirs(d, exist_ok=True)
    return d

# ---------------------------------------------------------------------------
# §2.4/§2.3/§2.9 — the flagship: QA count-reconciliation report (X6 = A1 ⋈ J1)
# ---------------------------------------------------------------------------


def q_x6_qa_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship (SURVEY §2.9 X6; reference runcommand.py:188-203): per-class
    counts from the live store vs expected counts from the catalog,
    full-outer broadcast join, diff, desc sort.  Stand-ins per FIXTURES.md:
    actual = customers per nation, expected = suppliers-per-nation ×15."""
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    actual = relational.per_class_counts(
        customer.join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey),
        "n_name",
    )
    expected = (
        supplier.join(F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey)
        .groupBy(F.col("n_name").alias("class_name"))
        .agg((F.count(F.lit(1)) * 15).cast("long").alias("expected_count"))
    )
    return relational.qa_count_report(actual, expected)


ORACLE_X6 = """
WITH actual AS (
  SELECT n_name AS class_name, count(*) AS actual_count
  FROM customer JOIN nation ON c_nationkey = n_nationkey
  GROUP BY n_name
), expected AS (
  SELECT n_name AS class_name, count(*) * 15 AS expected_count
  FROM supplier JOIN nation ON s_nationkey = n_nationkey
  GROUP BY n_name
)
SELECT coalesce(a.class_name, e.class_name) AS class_name,
       CAST(coalesce(a.actual_count, 0) AS BIGINT) AS actual_count,
       CAST(coalesce(e.expected_count, 0) AS BIGINT) AS expected_count,
       CAST(coalesce(a.actual_count, 0) - coalesce(e.expected_count, 0) AS BIGINT) AS diff,
       coalesce(a.actual_count, 0) = coalesce(e.expected_count, 0) AS matches
FROM actual a FULL OUTER JOIN expected e ON a.class_name = e.class_name
"""


# ---------------------------------------------------------------------------
# §2.4 — aggregations
# ---------------------------------------------------------------------------


def q_a1_count_by_class(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 (pseudoace.py:113-124): per-class counts — orders by status."""
    return relational.per_class_counts(
        load_table(spark, sf_dir, "orders"), "o_orderstatus"
    )


ORACLE_A1 = """
SELECT o_orderstatus AS class_name, count(*) AS actual_count
FROM orders GROUP BY o_orderstatus
"""


def q_a2_max_widths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2 (util.py:75-77): max column display width for table layout."""
    nation = load_table(spark, sf_dir, "nation")
    return nation.agg(
        F.max(F.length("n_name")).alias("max_name_w"),
        F.max(F.length(F.col("n_nationkey").cast("string"))).alias("max_key_w"),
        F.count(F.lit(1)).alias("n_rows"),
    )


ORACLE_A2 = """
SELECT max(length(n_name)) AS max_name_w,
       max(length(CAST(n_nationkey AS VARCHAR))) AS max_key_w,
       count(*) AS n_rows
FROM nation
"""


def q_a3_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3/U2 (util.py:84-85): dedup via distinct."""
    return relational.dedup_rows(
        load_table(spark, sf_dir, "customer").select("c_mktsegment", "c_nationkey")
    )


ORACLE_A3 = "SELECT DISTINCT c_mktsegment, c_nationkey FROM customer"


def q_agg_orders_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1-ext: multi-metric grouped aggregate with exact decimal sums."""
    orders = load_table(spark, sf_dir, "orders")
    dec = F.col("o_totalprice").cast("decimal(18,2)")
    return (
        orders.groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(dec).cast("double").alias("sum_price"),
            (F.sum(dec).cast("double") / F.count(F.lit(1))).alias("avg_price"),
            F.min(F.col("o_totalprice")).alias("min_price"),
            F.max(F.col("o_totalprice")).alias("max_price"),
        )
    )


ORACLE_AGG_STATS = """
SELECT o_orderpriority AS priority,
       count(*) AS n_orders,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_price,
       min(o_totalprice) AS min_price,
       max(o_totalprice) AS max_price
FROM orders GROUP BY o_orderpriority
"""


def q_q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape — the bench headline scan+agg.  Exact decimal sums."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("1998-09-01")
    )
    qty = F.col("l_quantity").cast("decimal(18,2)")
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    disc_price = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(18,4)"
    )
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(qty).cast("double").alias("sum_qty"),
            F.sum(price).cast("double").alias("sum_base_price"),
            F.sum(disc_price).cast("double").alias("sum_disc_price"),
            (F.sum(qty).cast("double") / F.count(F.lit(1))).alias("avg_qty"),
            (F.sum(price).cast("double") / F.count(F.lit(1))).alias("avg_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


ORACLE_Q1 = """
SELECT l_returnflag, l_linestatus,
       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
       CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_qty,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_price,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-01'
GROUP BY l_returnflag, l_linestatus
"""


# ---------------------------------------------------------------------------
# §2.3 — joins
# ---------------------------------------------------------------------------


def q_j1_customer_geo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1/J2: broadcast dim joins — customer → nation → region."""
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    return (
        customer.join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select(
            "c_custkey",
            "c_name",
            F.col("n_name").alias("nation"),
            F.col("r_name").alias("region"),
        )
    )


ORACLE_J1 = """
SELECT c_custkey, c_name, n_name AS nation, r_name AS region
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
"""


def q_q3_top_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: 3-way join + agg + deterministic top-k."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    revenue = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(18,4)"
    )
    joined = (
        customer.filter(F.col("c_mktsegment") == "BUILDING")
        .join(orders, F.col("c_custkey") == F.col("o_custkey"))
        .filter(F.col("o_orderdate") < F.lit("1997-01-01"))
        .join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .filter(F.col("l_shipdate") > F.lit("1997-01-01"))
    )
    agg = joined.groupBy("l_orderkey", "o_orderdate").agg(
        F.sum(revenue).cast("double").alias("revenue")
    )
    return relational.top_k(agg, [F.desc("revenue"), F.col("l_orderkey")], 10)


ORACLE_Q3 = """
SELECT l_orderkey, o_orderdate,
       CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1997-01-01'
  AND l_shipdate > TIMESTAMP '1997-01-01'
GROUP BY l_orderkey, o_orderdate
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


# ---------------------------------------------------------------------------
# §2.5 — sorts / limits / top-k
# ---------------------------------------------------------------------------


def q_t2_top_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T2 (util.py:86): desc count sort + limit, deterministic tiebreak."""
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    counts = relational.per_class_counts(
        customer.join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey),
        "n_name",
    )
    return relational.top_k(
        counts, [F.desc("actual_count"), F.col("class_name")], 10
    )


ORACLE_T2 = """
SELECT n_name AS class_name, count(*) AS actual_count
FROM customer JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
ORDER BY actual_count DESC, class_name
LIMIT 10
"""


def q_t3_first_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T3 (github.py:78): first-element limit over a total order."""
    return relational.top_k(
        load_table(spark, sf_dir, "orders"), [F.col("o_orderkey")], 1
    )


ORACLE_T3 = "SELECT * FROM orders ORDER BY o_orderkey LIMIT 1"


# ---------------------------------------------------------------------------
# §2.6 — set operations
# ---------------------------------------------------------------------------


def _cust_nk(spark, sf_dir):
    return load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )


def _supp_nk(spark, sf_dir):
    return load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )


def q_u1_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1 (runcommand.py:263-271): distinct union."""
    return relational.union_distinct(_cust_nk(spark, sf_dir), _supp_nk(spark, sf_dir))


ORACLE_U1 = """
SELECT c_nationkey AS nationkey FROM customer
UNION
SELECT s_nationkey AS nationkey FROM supplier
"""


def q_u2_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U-ext: EXCEPT via anti-join — the QA-diff shape (SURVEY §2.6):
    (user, hour) cells that saw clicks but no purchases."""
    ev = load_table(spark, sf_dir, "events")
    cell = lambda t: (  # noqa: E731
        ev.filter(F.col("event_type") == t)
        .select("user_id", F.date_trunc("hour", "ts").alias("hour"))
        .distinct()
    )
    # null_safe matches SQL EXCEPT's NULLs-are-equal convention (the
    # plain equality anti-join would keep NULL-keyed rows forever)
    return relational.anti_diff(
        cell("click"), cell("purchase"), ["user_id", "hour"],
        null_safe=True,
    )


ORACLE_U2 = """
SELECT DISTINCT user_id, date_trunc('hour', ts) AS hour
FROM events WHERE event_type = 'click'
EXCEPT
SELECT DISTINCT user_id, date_trunc('hour', ts) AS hour
FROM events WHERE event_type = 'purchase'
"""


def q_u3_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U-ext: INTERSECT."""
    return _cust_nk(spark, sf_dir).intersect(_supp_nk(spark, sf_dir))


ORACLE_U3 = """
SELECT c_nationkey AS nationkey FROM customer
INTERSECT
SELECT s_nationkey AS nationkey FROM supplier
"""


# ---------------------------------------------------------------------------
# §2.2 — projections / filters / predicates
# ---------------------------------------------------------------------------


def q_p1_regex_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1 (runcommand.py:40-44): regex predicate selection."""
    part = load_table(spark, sf_dir, "part")
    return part.filter(F.col("p_name").rlike(r"^(red|blue) (bolt|gear)$")).select(
        "p_partkey", "p_name", "p_brand", "p_type"
    )


ORACLE_P1 = r"""
SELECT p_partkey, p_name, p_brand, p_type
FROM part WHERE regexp_matches(p_name, '^(red|blue) (bolt|gear)$')
"""


def q_p2_project_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P2 (util.py:81-86): positional projection + typed int casts."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_returnflag",
        "l_linestatus",
        F.col("l_quantity").cast("long").alias("qty_int"),
        F.floor("l_extendedprice").cast("long").alias("price_floor"),
    )


ORACLE_P2 = """
SELECT l_returnflag, l_linestatus,
       CAST(floor(l_quantity) AS BIGINT) AS qty_int,
       CAST(floor(l_extendedprice) AS BIGINT) AS price_floor
FROM lineitem
"""


# ---------------------------------------------------------------------------
# §2.8 — scalar function suites
# ---------------------------------------------------------------------------


def q_f_string_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F2-F7: regex extract/replace, case, pad, concat, length."""
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("uname"),
        F.length("c_name").alias("name_len"),
        F.substring("c_name", 1, 8).alias("prefix"),
        F.concat_ws("|", "c_name", "c_mktsegment").alias("joined"),
        F.lpad(F.col("c_custkey").cast("string"), 12, "0").alias("padded"),
        F.regexp_extract("c_name", r"#(\d+)$", 1).alias("digits"),
        F.regexp_replace("c_name", r"^Customer", "Cust").alias("shortname"),
        F.reverse(F.col("c_mktsegment")).alias("rev_seg"),
        F.lower(F.trim(F.col("c_mktsegment"))).alias("lseg"),
    )


ORACLE_F_STRING = r"""
SELECT c_custkey,
       upper(c_name) AS uname,
       length(c_name) AS name_len,
       substring(c_name, 1, 8) AS prefix,
       concat_ws('|', c_name, c_mktsegment) AS joined,
       lpad(CAST(c_custkey AS VARCHAR), 12, '0') AS padded,
       regexp_extract(c_name, '#(\d+)$', 1) AS digits,
       regexp_replace(c_name, '^Customer', 'Cust') AS shortname,
       reverse(c_mktsegment) AS rev_seg,
       lower(trim(c_mktsegment)) AS lseg
FROM customer
"""


def q_f_datetime_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F8-F9: date parts, ISO formatting, epoch, date arithmetic."""
    o = load_table(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        F.year(d).alias("yr"),
        F.month(d).alias("mo"),
        F.dayofmonth(d).alias("dom"),
        F.quarter(d).alias("qtr"),
        F.date_format(d, "yyyy-MM-dd").alias("iso_date"),
        F.unix_timestamp(d).alias("epoch_s"),
        F.date_add(d.cast("date"), 30).alias("plus30"),
        F.datediff(d.cast("date"), F.lit("1995-01-01").cast("date")).alias(
            "days_since"
        ),
        F.date_trunc("month", d).cast("date").alias("month_start"),
    )


ORACLE_F_DATETIME = """
SELECT o_orderkey,
       year(o_orderdate) AS yr,
       month(o_orderdate) AS mo,
       day(o_orderdate) AS dom,
       quarter(o_orderdate) AS qtr,
       strftime(o_orderdate, '%Y-%m-%d') AS iso_date,
       CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s,
       CAST(o_orderdate AS DATE) + 30 AS plus30,
       datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS days_since,
       date_trunc('month', o_orderdate) AS month_start
FROM orders
"""


# ---------------------------------------------------------------------------
# §2.9 — EAV transforms
# ---------------------------------------------------------------------------

_MELT_ATTRS = ["l_quantity", "l_returnflag", "l_linestatus", "l_shipdate"]


def _melt_lineitem_df(li: DataFrame) -> DataFrame:
    prepared = li.select(
        (F.col("l_orderkey") * 8 + F.col("l_linenumber")).alias("__e"),
        F.col("l_quantity").cast("long").cast("string").alias("l_quantity"),
        "l_returnflag",
        "l_linestatus",
        F.col("l_shipdate").cast("date").cast("string").alias("l_shipdate"),
        F.col("l_shipdate").alias("__tx"),
    )
    return eav.melt(prepared, F.col("__e"), _MELT_ATTRS, "__tx")


def _melted_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _melt_lineitem_df(load_table(spark, sf_dir, "lineitem"))


_ORACLE_MELT_BODY = """
SELECT l_orderkey * 8 + l_linenumber AS e, 'l_quantity' AS a,
       CAST(CAST(floor(l_quantity) AS BIGINT) AS VARCHAR) AS v, l_shipdate AS tx, true AS op
FROM lineitem
UNION ALL
SELECT l_orderkey * 8 + l_linenumber, 'l_returnflag', l_returnflag, l_shipdate, true
FROM lineitem
UNION ALL
SELECT l_orderkey * 8 + l_linenumber, 'l_linestatus', l_linestatus, l_shipdate, true
FROM lineitem
UNION ALL
SELECT l_orderkey * 8 + l_linenumber, 'l_shipdate',
       CAST(CAST(l_shipdate AS DATE) AS VARCHAR), l_shipdate, true
FROM lineitem
"""


def q_x1_eav_melt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X1 (pseudoace.py:69-76): wide records → datom stream (e,a,v,tx,op)."""
    return _melted_lineitem(spark, sf_dir)


ORACLE_X1 = _ORACLE_MELT_BODY


def q_x7_pivot_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X7 (SURVEY §2.9): EAV → wide pivot; melt then reassemble.

    Restricted to entities with a unique (orderkey, linenumber) key — the
    synthetic lineitem has collisions there, and pivoting a multi-valued
    card-one attribute is undefined.  The uniqueness check rides the pivot
    aggregate itself (pivot_wide_exact): e = orderkey*8+linenumber is
    injective, so a duplicated key shows up as 2×len(attrs) datoms per e
    and is dropped by the count guard — one shuffle total, no window.
    """
    melted = _melted_lineitem(spark, sf_dir)
    return eav.pivot_wide_exact(melted, _MELT_ATTRS)


ORACLE_X7 = """
WITH unique_li AS (
  SELECT * FROM (
    SELECT *, count(*) OVER (PARTITION BY l_orderkey, l_linenumber) AS __n
    FROM lineitem
  ) WHERE __n = 1
)
SELECT l_orderkey * 8 + l_linenumber AS e,
       CAST(CAST(floor(l_quantity) AS BIGINT) AS VARCHAR) AS l_quantity,
       l_returnflag, l_linestatus,
       CAST(CAST(l_shipdate AS DATE) AS VARCHAR) AS l_shipdate
FROM unique_li
"""


def q_p6_class_subset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P6/X5 (pseudoace.py:127-144): homology-style class-subset filter."""
    datoms = _melted_lineitem(spark, sf_dir).withColumn("class", F.col("a"))
    return eav.homology_split(datoms, ["l_returnflag", "l_linestatus"]).drop("class")


ORACLE_P6 = f"""
SELECT * FROM ({_ORACLE_MELT_BODY})
WHERE a IN ('l_returnflag', 'l_linestatus')
"""


def q_x4_apply_patches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4 (pseudoace.py:105-110): late patches over base, last-write-wins
    per (e,a) by tx; patches (later transactions) beat base on tx ties."""
    ev = load_table(spark, sf_dir, "events").select(
        F.col("user_id").alias("e"),
        F.col("event_type").alias("a"),
        F.col("event_id").cast("string").alias("v"),
        F.col("ts").alias("tx"),
        F.lit(True).alias("op"),
        (F.col("event_id") % 2).alias("__par"),
    )
    base = ev.filter(F.col("__par") == 0).drop("__par")
    patches = ev.filter(F.col("__par") == 1).drop("__par")
    return eav.apply_patches(base, patches, tiebreak_col="v")


ORACLE_X4 = """
WITH datoms AS (
  SELECT user_id AS e, event_type AS a, CAST(event_id AS VARCHAR) AS v,
         ts AS tx, true AS op, event_id % 2 AS src
  FROM events
), ranked AS (
  SELECT e, a, v, tx, op,
         row_number() OVER (PARTITION BY e, a ORDER BY tx DESC, src DESC, v DESC) AS rn
  FROM datoms
)
SELECT e, a, v, tx, op FROM ranked WHERE rn = 1
"""


# ---------------------------------------------------------------------------
# §2.7 — windows
# ---------------------------------------------------------------------------


def q_w1_last_write_wins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1: latest event per user — Datomic tx-order conflict resolution."""
    ev = load_table(spark, sf_dir, "events")
    return relational.last_write_wins(
        ev.select("user_id", "event_id", "ts", "event_type", "value"),
        ["user_id"],
        [F.desc("ts"), F.desc("event_id")],
    )


ORACLE_W1 = """
SELECT user_id, event_id, ts, event_type, value
FROM (
  SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
) WHERE rn = 1
"""


def q_w2_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W2 (runcommand.py:395): ranking window — top-3 orders per customer."""
    o = load_table(spark, sf_dir, "orders")
    ranked = relational.rank_within(
        o.select("o_custkey", "o_orderkey", "o_totalprice"),
        ["o_custkey"],
        [F.desc("o_totalprice"), F.col("o_orderkey")],
    )
    return ranked.filter(F.col("rank") <= 3)


ORACLE_W2 = """
SELECT o_custkey, o_orderkey, o_totalprice, rank FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rank
  FROM orders
) WHERE rank <= 3
"""


def q_w3_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W-ext: running per-user value sum (exact via decimal accumulation)."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return ev.select(
        "user_id",
        "event_id",
        "ts",
        F.sum(F.col("value").cast("decimal(18,6)")).over(w).cast("double").alias(
            "running_value"
        ),
    )


ORACLE_W3 = """
SELECT user_id, event_id, ts,
       CAST(sum(CAST(value AS DECIMAL(18,6)))
            OVER (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
         AS running_value
FROM events
"""


# ---------------------------------------------------------------------------
# §2.10 — streaming-shaped (batch-equivalent rollup; streaming tests in tests/)
# ---------------------------------------------------------------------------


def q_events_hourly_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-window rollup over the event stream (batch plan; the
    streaming variant in streaming/ uses the same logical agg)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.date_trunc("hour", "ts").alias("hour"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias(
                "sum_value"
            ),
        )
    )

ORACLE_HOURLY = """
SELECT date_trunc('hour', ts) AS hour, event_type,
       count(*) AS n_events,
       CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
FROM events GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# §2.12 — text analysis
# ---------------------------------------------------------------------------


def q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting + quality scoring over documents (north-star op)."""
    docs = load_table(spark, sf_dir, "documents")
    t = F.col("text")
    n_tok = TXT.token_count(t)
    mean_wlen = F.length(F.regexp_replace(t, r"\s+", "")) / F.greatest(
        n_tok, F.lit(1)
    )
    return docs.select(
        "doc_id",
        n_tok.alias("n_tokens"),
        F.length(t).alias("len_chars"),
        F.round(mean_wlen, 4).alias("mean_word_len"),
        TXT.quality_score(t).alias("quality"),
    )


ORACLE_TEXT_STATS = r"""
WITH base AS (
  SELECT doc_id, text,
         len(list_filter(regexp_split_to_array(trim(text), '\s+'), x -> x <> '')) AS n_tokens,
         length(text) AS len_chars,
         length(regexp_replace(text, '\s+', '', 'g')) AS n_nonspace,
         length(text) - length(regexp_replace(text, '[^\w\s]', '', 'g')) AS n_punct
  FROM documents
)
SELECT doc_id, n_tokens, len_chars,
       round(CAST(n_nonspace AS DOUBLE) / greatest(n_tokens, 1), 4) AS mean_word_len,
       (CAST(n_tokens >= 5 AND n_tokens <= 100000 AS DOUBLE)
        + CAST(CAST(n_nonspace AS DOUBLE) / greatest(n_tokens, 1) >= 2.0
               AND CAST(n_nonspace AS DOUBLE) / greatest(n_tokens, 1) <= 12.0 AS DOUBLE)
        + CAST(CAST(n_punct AS DOUBLE) / greatest(length(text), 1) <= 0.3 AS DOUBLE)
       ) / 3.0 AS quality
FROM base
"""


def q_text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-vote language ID heuristic (north-star op)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", TXT.lang_id("text").alias("lang_guess"))


def _lang_hits_sql(lang: str) -> str:
    words = ", ".join(f"'{w}'" for w in TXT.STOPWORDS[lang])
    return (
        f"len(list_filter(toks, x -> list_contains([{words}], x))) AS s_{lang}"
    )


ORACLE_LANG_ID = rf"""
WITH toks AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(trim(text)), '\s+'), x -> x <> '') AS toks
  FROM documents
), hits AS (
  SELECT doc_id,
         {_lang_hits_sql('en')},
         {_lang_hits_sql('es')},
         {_lang_hits_sql('de')},
         {_lang_hits_sql('fr')}
  FROM toks
)
SELECT doc_id,
       CASE WHEN greatest(s_en, s_es, s_de, s_fr) = 0 THEN 'und'
            WHEN s_fr = greatest(s_en, s_es, s_de, s_fr) THEN 'fr'
            WHEN s_es = greatest(s_en, s_es, s_de, s_fr) THEN 'es'
            WHEN s_en = greatest(s_en, s_es, s_de, s_fr) THEN 'en'
            ELSE 'de' END AS lang_guess
FROM hits
"""


def q_text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting via md5 of normalized text (north-star op).

    (The engine's fast path is xxhash64 — functions/text.py:fingerprint —
    md5 is used here because both engines expose it for oracle parity.)"""
    docs = load_table(spark, sf_dir, "documents")
    norm = F.lower(F.regexp_replace(F.trim(F.col("text")), r"\s+", " "))
    return docs.select("doc_id", F.md5(norm).alias("fp"))


ORACLE_FINGERPRINT = r"""
SELECT doc_id, md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g'))) AS fp
FROM documents
"""


# ---------------------------------------------------------------------------
# §2.12 — deduplication
# ---------------------------------------------------------------------------


def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: keep lowest doc_id per normalized-text hash."""
    docs = load_table(spark, sf_dir, "documents")
    norm = F.lower(F.regexp_replace(F.trim(F.col("text")), r"\s+", " "))
    return (
        docs.select("doc_id", F.md5(norm).alias("fp"))
        .groupBy("fp")
        .agg(
            F.min("doc_id").alias("keep_id"),
            F.count(F.lit(1)).alias("dup_count"),
        )
    )


ORACLE_DEDUP_EXACT = r"""
SELECT md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g'))) AS fp,
       min(doc_id) AS keep_id, count(*) AS dup_count
FROM documents GROUP BY 1
"""


def q_dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact word-3-gram Jaccard near-dup pairs (threshold 0.2)."""
    docs = load_table(spark, sf_dir, "documents")
    return dedup.ngram_jaccard_pairs(docs, k=3, threshold=0.2).select(
        "id_a", "id_b", F.round("jaccard", 6).alias("jaccard")
    )


# THE shared exact word-3-gram shingle/Jaccard CTE block — single
# definition so a future shingle-rule change cannot fork the ngram
# oracle from the sketch acceptance oracles that gate against it
# (minhash/simhash recompute "exact Jaccard >= threshold" over the
# SAME pair space).
_SHINGLE_JACCARD_CTES = r"""
WITH toks AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(trim(text)), '\s+'), x -> x <> '') AS toks
  FROM documents
), sh AS (
  -- mirrors functions/text.shingles(): docs with < k tokens contribute
  -- ONE whole-text shingle instead of vanishing from the pair space
  SELECT doc_id,
         unnest(CASE WHEN len(toks) < 3
                THEN [array_to_string(toks, ' ')]
                ELSE list_distinct(list_transform(range(1, len(toks) - 3 + 2),
                     i -> array_to_string(list_slice(toks, i, i + 2), ' ')))
                END) AS shingle
  FROM toks
), sizes AS (
  SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id
), inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_inter
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
){extra_ctes}
"""

ORACLE_NGRAM_JACCARD = _SHINGLE_JACCARD_CTES.format(extra_ctes="") + r"""
SELECT id_a, id_b,
       round(CAST(n_inter AS DOUBLE) / (sa.n_sh + sb.n_sh - n_inter), 6) AS jaccard
FROM inter
JOIN sizes sa ON sa.doc_id = id_a
JOIN sizes sb ON sb.doc_id = id_b
WHERE CAST(n_inter AS DOUBLE) / (sa.n_sh + sb.n_sh - n_inter) >= 0.2
"""


def q_dedup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-dup detection, emitted as a DETERMINISTIC
    acceptance row so the sketch is oracle-gateable: the signature
    internals (seeded xxhash64) are not SQL-expressible, but the
    sketch's CONTRACT is — every pair with exact word-3-gram Jaccard
    ≥ 0.8 must be recalled (measured 1.0 at sf0.001/sf0.01; banded
    collision at b=8,r=4 gives P≈0.985+ per such pair and the hashing
    is deterministic) and the signature estimate must sit within 0.15
    of exact Jaccard on the found pairs (measured ≤ 0.06).  The oracle
    recomputes the exact pair count in SQL and pins the booleans TRUE.
    Underlying production operator: operators/dedup.minhash_near_dups
    (banded equi-join, no CartesianProduct — plan-guarded in tests)."""
    docs = load_table(spark, sf_dir, "documents")
    mh = dedup.minhash_near_dups(
        docs, num_hashes=32, bands=8, threshold=0.4
    )
    return _minhash_acceptance(docs, mh)


def _minhash_acceptance(docs: DataFrame, mh: DataFrame) -> DataFrame:
    """The MinHash acceptance-row gate, factored out so the adversarial
    fixture tests can drive it with a crippled sketch and prove it goes
    RED (a silently dead sketch must not pass vacuously)."""
    exact_hi = dedup.ngram_jaccard_pairs(docs, k=3, threshold=0.8)
    joined = exact_hi.join(mh, ["id_a", "id_b"], "left")
    return joined.agg(
        F.count(F.lit(1)).alias("n_exact_hi"),
        # coalesce: an empty exact set makes the ratio NULL (0/0); the
        # contract is vacuously satisfied, matching the oracle's TRUE
        # try_divide: ANSI mode (Spark 4 default) makes 0/0 THROW, not
        # NULL — the vacuous-pass contract needs the NULL back
        F.coalesce(
            F.try_divide(F.count("est_jaccard"), F.count(F.lit(1))) >= 0.9,
            F.lit(True),
        ).alias("recall_ok"),
        F.coalesce(
            F.max(F.abs(F.col("est_jaccard") - F.col("jaccard"))) <= 0.15,
            F.lit(True),
        ).alias("est_err_ok"),
    )


# the exact-pair CTE extends the SAME shared shingle block at the
# high-similarity threshold the sketch contract is stated over
_ORACLE_EXACT_HI_PAIRS = _SHINGLE_JACCARD_CTES.format(
    extra_ctes=r""", hi AS (
  SELECT id_a, id_b
  FROM inter
  JOIN sizes sa ON sa.doc_id = id_a
  JOIN sizes sb ON sb.doc_id = id_b
  WHERE CAST(n_inter AS DOUBLE) / (sa.n_sh + sb.n_sh - n_inter) >= 0.8
)"""
)

ORACLE_DEDUP_MINHASH = (
    _ORACLE_EXACT_HI_PAIRS
    + """
SELECT CAST(count(*) AS BIGINT) AS n_exact_hi,
       TRUE AS recall_ok, TRUE AS est_err_ok
FROM hi
"""
)


def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup detection as a deterministic acceptance row
    (same gating pattern as dedup_minhash): with 64-bit SimHash,
    hamming ≤ 3, 4 bands, the banding is pigeonhole-complete for the
    hamming radius, and the CONTRACT gated here is recall ≥ 0.5 of
    exact-Jaccard ≥ 0.8 pairs (measured 0.60/0.75 — SimHash is the
    weaker sketch on short texts by design) and precision ≥ 0.7
    against exact Jaccard ≥ 0.5 (measured 0.88/0.78).  Underlying
    operator: operators/dedup.simhash_near_dups."""
    docs = load_table(spark, sf_dir, "documents")
    sh = dedup.simhash_near_dups(docs, max_hamming=3, bands=4)
    return _simhash_acceptance(docs, sh)


def _simhash_acceptance(docs: DataFrame, sh: DataFrame) -> DataFrame:
    """The SimHash acceptance-row gate, factored out for the same
    adversarial-fixture reason as :func:`_minhash_acceptance`."""
    exact_hi = dedup.ngram_jaccard_pairs(docs, k=3, threshold=0.8)
    exact_mid = dedup.ngram_jaccard_pairs(docs, k=3, threshold=0.5)
    recall = (
        exact_hi.join(sh, ["id_a", "id_b"], "left_semi").agg(
            F.count(F.lit(1)).alias("n_found")
        )
    )
    n_hi = exact_hi.agg(F.count(F.lit(1)).alias("n_exact_hi"))
    prec = sh.join(exact_mid, ["id_a", "id_b"], "left").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.count("jaccard").alias("n_precise"),
    )
    return (
        n_hi.crossJoin(recall)
        .crossJoin(prec)
        .select(
            "n_exact_hi",
            # coalesce: empty denominators (no exact pairs / no sketch
            # pairs) are vacuous passes, matching the oracle's TRUE
            F.coalesce(
                F.try_divide(F.col("n_found"), F.col("n_exact_hi")) >= 0.5,
                F.lit(True),
            ).alias("recall_ok"),
            F.coalesce(
                F.try_divide(F.col("n_precise"), F.col("n_pairs")) >= 0.7,
                F.lit(True),
            ).alias("precision_ok"),
        )
    )


ORACLE_DEDUP_SIMHASH = (
    _ORACLE_EXACT_HI_PAIRS
    + """
SELECT CAST(count(*) AS BIGINT) AS n_exact_hi,
       TRUE AS recall_ok, TRUE AS precision_ok
FROM hi
"""
)


# ---------------------------------------------------------------------------
# §2.12 — similarity search
# ---------------------------------------------------------------------------


def q_ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-10 for query vectors vec_id < 8.

    Dot/norm accumulate in index order with explicit double casts on both
    sides → bit-identical IEEE results; score rounded to 6 as belt-and-braces.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 8)
    out = similarity.brute_force_topk(emb, queries, k=10)
    return out.select(
        "query_id", "neighbor_id", F.round("score", 6).alias("score"), "rank"
    )


ORACLE_ANN = """
WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 8),
c AS (SELECT vec_id AS neighbor_id, embedding AS cv FROM embeddings),
scored AS (
  SELECT query_id, neighbor_id,
         list_sum(list_transform(range(1, len(qv) + 1),
                  i -> CAST(qv[i] AS DOUBLE) * CAST(cv[i] AS DOUBLE)))
         / (sqrt(list_sum(list_transform(range(1, len(qv) + 1),
                  i -> CAST(qv[i] AS DOUBLE) * CAST(qv[i] AS DOUBLE))))
            * sqrt(list_sum(list_transform(range(1, len(cv) + 1),
                  i -> CAST(cv[i] AS DOUBLE) * CAST(cv[i] AS DOUBLE))))) AS score
  FROM c CROSS JOIN q
  WHERE neighbor_id <> query_id
), ranked AS (
  SELECT query_id, neighbor_id, round(score, 6) AS score,
         CAST(row_number() OVER (PARTITION BY query_id ORDER BY score DESC, neighbor_id)
              AS INTEGER) AS rank
  FROM scored
)
SELECT * FROM ranked WHERE rank <= 10
"""


def _ann_recall_gate(approx: DataFrame, exact: DataFrame, bound: float) -> DataFrame:
    """One deterministic acceptance row for an ANN variant: exact-side
    counts (SQL-recomputable) plus a mean-recall@k boolean.  The
    hashing/seeding inside each variant is deterministic, so the
    boolean is a fixed property of the fixture, not a flaky check."""
    hits = exact.join(
        approx.select("query_id", "neighbor_id"),
        ["query_id", "neighbor_id"],
        "left_semi",
    ).agg(F.count(F.lit(1)).alias("n_hit"))
    base = exact.agg(
        F.countDistinct("query_id").alias("n_queries"),
        F.count(F.lit(1)).alias("n_exact"),
    )
    return base.crossJoin(hits).select(
        "n_queries",
        "n_exact",
        # vacuous pass on an empty exact set (matches the oracle's TRUE)
        F.coalesce(
            F.try_divide(F.col("n_hit"), F.col("n_exact")) >= bound,
            F.lit(True),
        ).alias("recall_ok"),
    )


# exact top-10 head shared by the three ANN acceptance oracles
_ORACLE_ANN_EXACT_HEAD = """
WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 8),
c AS (SELECT vec_id AS neighbor_id, embedding AS cv FROM embeddings),
scored AS (
  SELECT query_id, neighbor_id,
         list_sum(list_transform(range(1, len(qv) + 1),
                  i -> CAST(qv[i] AS DOUBLE) * CAST(cv[i] AS DOUBLE)))
         / (sqrt(list_sum(list_transform(range(1, len(qv) + 1),
                  i -> CAST(qv[i] AS DOUBLE) * CAST(qv[i] AS DOUBLE))))
            * sqrt(list_sum(list_transform(range(1, len(cv) + 1),
                  i -> CAST(cv[i] AS DOUBLE) * CAST(cv[i] AS DOUBLE))))) AS score
  FROM c CROSS JOIN q
  WHERE neighbor_id <> query_id
), ranked AS (
  SELECT query_id, neighbor_id,
         row_number() OVER (PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS rank
  FROM scored
)
SELECT CAST(count(DISTINCT query_id) AS BIGINT) AS n_queries,
       CAST(count(*) AS BIGINT) AS n_exact,
       TRUE AS recall_ok
FROM ranked WHERE rank <= 10
"""


def q_ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sign-LSH bucketed ANN, emitted as a deterministic acceptance row
    (the xxhash64-derived hyperplanes are not SQL-expressible; the
    recall CONTRACT is): mean recall@10 vs the in-query brute-force
    exact top-10 must be ≥ 0.4 (measured 0.56/0.61 at sf0.001/sf0.01
    on the unclustered embeddings table; 0.994 on the clustered
    fixture — tools/recall_report.py).  Underlying production
    operator: operators/similarity.lsh_topk (bucket equi-join)."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 8)
    approx = similarity.lsh_topk(emb, queries, dim=64, k=10, num_planes=4)
    exact = similarity.brute_force_topk(emb, queries, k=10).select(
        "query_id", "neighbor_id"
    )
    return _ann_recall_gate(approx, exact, bound=0.4)


ORACLE_ANN_LSH = _ORACLE_ANN_EXACT_HEAD


# ---------------------------------------------------------------------------
# §2.12 — multimodal columns
# ---------------------------------------------------------------------------


def q_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column plumbing: payload bytes + typed metadata extraction.
    Text stands in for the opaque payload (see multimodal/ for the decode
    stubs); the plan shape — binary col + metadata struct — is the real thing.
    """
    docs = load_table(spark, sf_dir, "documents")
    payload = F.encode(F.col("text"), "UTF-8")
    return docs.select(
        "doc_id",
        F.length(payload).alias("n_bytes"),
        F.md5(F.col("text")).alias("content_md5"),
        F.lit("text/plain").alias("mime"),
    )


ORACLE_MULTIMODAL = """
SELECT doc_id,
       octet_length(encode(text)) AS n_bytes,
       md5(text) AS content_md5,
       'text/plain' AS mime
FROM documents
"""


# ---------------------------------------------------------------------------
# §2.1 — sources/sinks: CSV round-trip (S11 + S12)
# ---------------------------------------------------------------------------


def q_s11_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S11/S12 (pseudoace.py:147-153, QUOTE_ALL report CSV): write the
    nation dim as a quoted CSV, read it back with an explicit schema.

    Written under a stable per-sf path and read back LAZILY — no collect
    inside the declared query (the report is tiny, but a declared query
    should never materialize driver-side; VERDICT r1)."""
    from .queries_e2e import _fx

    nation = load_table(spark, sf_dir, "nation")
    path = _fx(sf_dir, "s11_csv")
    (
        nation.coalesce(1)
        .write.mode("overwrite")
        .option("header", True)
        .option("quoteAll", True)
        .csv(path)
    )
    return spark.read.schema(
        "n_nationkey INT, n_name STRING, n_regionkey INT"
    ).option("header", True).csv(path)


ORACLE_S11 = "SELECT n_nationkey, n_name, n_regionkey FROM nation"


# ---------------------------------------------------------------------------
# Registry
# ---------------------------------------------------------------------------

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "x6_qa_report": q_x6_qa_report,
    "a1_count_by_class": q_a1_count_by_class,
    "a2_max_widths": q_a2_max_widths,
    "a3_distinct": q_a3_distinct,
    "agg_orders_stats": q_agg_orders_stats,
    "q1_pricing_summary": q_q1_pricing_summary,
    "j1_customer_geo": q_j1_customer_geo,
    "q3_top_revenue": q_q3_top_revenue,
    "t2_top_nations": q_t2_top_nations,
    "t3_first_order": q_t3_first_order,
    "u1_union": q_u1_union,
    "u2_except": q_u2_except,
    "u3_intersect": q_u3_intersect,
    "p1_regex_filter": q_p1_regex_filter,
    "p2_project_cast": q_p2_project_cast,
    "f_string_suite": q_f_string_suite,
    "f_datetime_suite": q_f_datetime_suite,
    "x1_eav_melt": q_x1_eav_melt,
    "x7_pivot_roundtrip": q_x7_pivot_roundtrip,
    "p6_class_subset": q_p6_class_subset,
    "x4_apply_patches": q_x4_apply_patches,
    "w1_last_write_wins": q_w1_last_write_wins,
    "w2_rank": q_w2_rank,
    "w3_running_sum": q_w3_running_sum,
    "events_hourly_rollup": q_events_hourly_rollup,
    "text_stats": q_text_stats,
    "text_lang_id": q_text_lang_id,
    "text_fingerprint": q_text_fingerprint,
    "dedup_exact": q_dedup_exact,
    "dedup_ngram_jaccard": q_dedup_ngram_jaccard,
    "dedup_minhash": q_dedup_minhash,
    "dedup_simhash": q_dedup_simhash,
    "ann_cosine_topk": q_ann_cosine_topk,
    "ann_lsh_topk": q_ann_lsh_topk,
    "multimodal_meta": q_multimodal_meta,
    "s11_csv_roundtrip": q_s11_csv_roundtrip,
}

ORACLES: dict[str, str] = {
    "x6_qa_report": ORACLE_X6,
    "a1_count_by_class": ORACLE_A1,
    "a2_max_widths": ORACLE_A2,
    "a3_distinct": ORACLE_A3,
    "agg_orders_stats": ORACLE_AGG_STATS,
    "q1_pricing_summary": ORACLE_Q1,
    "j1_customer_geo": ORACLE_J1,
    "q3_top_revenue": ORACLE_Q3,
    "t2_top_nations": ORACLE_T2,
    "t3_first_order": ORACLE_T3,
    "u1_union": ORACLE_U1,
    "u2_except": ORACLE_U2,
    "u3_intersect": ORACLE_U3,
    "p1_regex_filter": ORACLE_P1,
    "p2_project_cast": ORACLE_P2,
    "f_string_suite": ORACLE_F_STRING,
    "f_datetime_suite": ORACLE_F_DATETIME,
    "x1_eav_melt": ORACLE_X1,
    "x7_pivot_roundtrip": ORACLE_X7,
    "p6_class_subset": ORACLE_P6,
    "x4_apply_patches": ORACLE_X4,
    "w1_last_write_wins": ORACLE_W1,
    "w2_rank": ORACLE_W2,
    "w3_running_sum": ORACLE_W3,
    "events_hourly_rollup": ORACLE_HOURLY,
    "text_stats": ORACLE_TEXT_STATS,
    "text_lang_id": ORACLE_LANG_ID,
    "text_fingerprint": ORACLE_FINGERPRINT,
    "dedup_exact": ORACLE_DEDUP_EXACT,
    "dedup_ngram_jaccard": ORACLE_NGRAM_JACCARD,
    "ann_cosine_topk": ORACLE_ANN,
    "multimodal_meta": ORACLE_MULTIMODAL,
    "s11_csv_roundtrip": ORACLE_S11,
    # intentionally no oracle (non-SQL-expressible, rows-only check):
    #   dedup_minhash, dedup_simhash, ann_lsh_topk
}


# ---------------------------------------------------------------------------
# §2.3-ext — as-of join (custom operator Spark lacks; union+carry-forward)
# ---------------------------------------------------------------------------


def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each purchase matched to the user's latest prior click.
    One shuffle + window (operators/relational.py:asof_join) — never a
    range theta-join."""
    ev = load_table(spark, sf_dir, "events")
    clicks = relational.last_write_wins(
        ev.filter(F.col("event_type") == "click").select(
            "user_id",
            F.col("ts").alias("last_click_ts"),
            F.col("event_id").alias("last_click_id"),
        ),
        ["user_id", "last_click_ts"],
        [F.desc("last_click_id")],
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "event_id", "ts", "value"
    )
    return relational.asof_join(
        purchases,
        clicks,
        on=["user_id"],
        left_ts="ts",
        right_ts="last_click_ts",
        right_cols=["last_click_id", "last_click_ts"],
    )


ORACLE_ASOF = """
WITH c0 AS (
  SELECT user_id, ts AS last_click_ts, event_id AS last_click_id,
         row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn
  FROM events WHERE event_type = 'click'
), c AS (
  SELECT user_id, last_click_ts, last_click_id FROM c0 WHERE rn = 1
), p AS (
  SELECT user_id, event_id, ts, value FROM events WHERE event_type = 'purchase'
)
SELECT p.user_id, p.event_id, p.ts, p.value, c.last_click_id, c.last_click_ts
FROM p ASOF LEFT JOIN c
  ON p.user_id = c.user_id AND p.ts >= c.last_click_ts
"""


# ---------------------------------------------------------------------------
# §2.4-ext — rollup / approx distinct
# ---------------------------------------------------------------------------


def q_a4_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rollup aggregation (SURVEY §2.4: exposed built-ins): order counts
    with subtotals per priority and a grand total."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.rollup("o_orderpriority", "o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


ORACLE_A4 = """
SELECT o_orderpriority, o_orderstatus, count(*) AS n_orders
FROM orders GROUP BY ROLLUP (o_orderpriority, o_orderstatus)
"""


def q_a5_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL approximate distinct, emitted as a deterministic acceptance
    row (the sketch registers are engine-specific; the error CONTRACT
    is not): exact distinct counts plus booleans pinning the HLL
    estimate within 10% relative error (measured ≤ 6.4% across
    sf0.001–0.1; Spark's default rsd is 5% and the hashing is
    deterministic, so the booleans are fixture-stable).  The oracle
    recomputes the exact counts and pins the booleans TRUE."""
    li = load_table(spark, sf_dir, "lineitem")
    agg = li.agg(
        F.approx_count_distinct("l_partkey").alias("ap"),
        F.countDistinct("l_partkey").alias("exact_parts"),
        F.approx_count_distinct("l_orderkey").alias("ao"),
        F.countDistinct("l_orderkey").alias("exact_orders"),
    )
    return agg.select(
        "exact_parts",
        "exact_orders",
        (
            F.abs(F.col("ap") - F.col("exact_parts"))
            / F.col("exact_parts")
            <= 0.10
        ).alias("parts_within_10pct"),
        (
            F.abs(F.col("ao") - F.col("exact_orders"))
            / F.col("exact_orders")
            <= 0.10
        ).alias("orders_within_10pct"),
    )


ORACLE_A5 = """
SELECT CAST(count(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
       CAST(count(DISTINCT l_orderkey) AS BIGINT) AS exact_orders,
       TRUE AS parts_within_10pct,
       TRUE AS orders_within_10pct
FROM lineitem
"""


# ---------------------------------------------------------------------------
# §2.9 X3 — schema-driven typed normalization
# ---------------------------------------------------------------------------

_X3_SCHEMA = {
    "l_quantity": "long",
    "l_returnflag": "string",
    "l_linestatus": "string",
    "l_shipdate": "date",
}


def q_x3_typed_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X3 (prepare-import): models-schema-driven casts over the datom
    stream — stringly v → typed columns, CASE-compiled, no shuffle."""
    datoms = _melted_lineitem(spark, sf_dir).select("e", "a", "v")
    return eav.typed_cast(datoms, _X3_SCHEMA)


ORACLE_X3 = f"""
SELECT e, a, v,
       CASE WHEN a = 'l_quantity' THEN CAST(v AS BIGINT) END AS v_long,
       CASE WHEN a = 'l_shipdate' THEN CAST(v AS DATE) END AS v_date
FROM ({_ORACLE_MELT_BODY})
"""


QUERIES.update(
    {
        "asof_join": q_asof_join,
        "a4_rollup": q_a4_rollup,
        "a5_approx_distinct": q_a5_approx_distinct,
        "x3_typed_cast": q_x3_typed_cast,
    }
)
ORACLES.update(
    {
        "asof_join": ORACLE_ASOF,
        "a4_rollup": ORACLE_A4,
        "x3_typed_cast": ORACLE_X3,
        # sketch queries gate on deterministic acceptance rows: the
        # oracle recomputes the exact side and pins the bound booleans
        "a5_approx_distinct": ORACLE_A5,
        "dedup_minhash": ORACLE_DEDUP_MINHASH,
        "dedup_simhash": ORACLE_DEDUP_SIMHASH,
        "ann_lsh_topk": ORACLE_ANN_LSH,
    }
)


def q_dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs (threshold 0.4 — the synthetic
    embeddings are near-orthogonal random vectors; real corpora use ~0.9).

    Runs the LSH-blocked plan (sign-random-projection OR-construction →
    equi self-join on (table, bucket) → exact cosine verify) — no
    CartesianProduct node (plan-guarded).  The oracle is the exact
    all-pairs SQL: at this weak threshold the auto-chosen (P=2, L=23)
    construction has per-pair miss < 1e-5, and the seeded hyperplanes are
    deterministic, so blocked ≡ exact is a stable, verified property of
    this dataset (asserted at sf0.001/0.01 in tests), not luck per run."""
    emb = load_table(spark, sf_dir, "embeddings")
    out = dedup.embedding_cosine_pairs_blocked(emb, dim=64, threshold=0.4)
    return out.select("id_a", "id_b", F.round("score", 6).alias("score"))


ORACLE_DEDUP_COSINE = """
WITH e AS (SELECT vec_id, embedding FROM embeddings),
s AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         list_sum(list_transform(range(1, len(a.embedding) + 1),
                  i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))
         / (sqrt(list_sum(list_transform(range(1, len(a.embedding) + 1),
                  i -> CAST(a.embedding[i] AS DOUBLE) * CAST(a.embedding[i] AS DOUBLE))))
          * sqrt(list_sum(list_transform(range(1, len(b.embedding) + 1),
                  i -> CAST(b.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE))))) AS score
  FROM e a JOIN e b ON a.vec_id < b.vec_id
)
SELECT id_a, id_b, round(score, 6) AS score FROM s WHERE score >= 0.4
"""


def q_text_bpe_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-ish token counting: word/digit/punct segmentation by regex —
    the cheap deterministic token estimator for data budgeting."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        TXT.bpe_ish_token_count("text").alias("n_bpe_tokens"),
        TXT.token_count("text").alias("n_ws_tokens"),
    )


ORACLE_BPE = r"""
SELECT doc_id,
       len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]')) AS n_bpe_tokens,
       len(list_filter(regexp_split_to_array(trim(text), '\s+'), x -> x <> '')) AS n_ws_tokens
FROM documents
"""


def q_dedup_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (dedup.semantic_dedup): within-cluster cosine dedup —
    drop every vector with a lower-id neighbor at cosine ≥ 0.3 inside
    its cluster (the ``label`` column stands in for the k-means
    assignment; the pair space is Σ|cluster|², the SemDeDup scale
    contract).  Output: per cluster the total, survivor count, and a
    survivor-id checksum; the oracle replays the pairwise keep rule as
    a NOT EXISTS self-join with the identical rounded-cosine cut."""
    emb = load_table(spark, sf_dir, "embeddings")
    kept = dedup.semantic_dedup(
        emb, cluster_col="label", threshold=0.3
    )
    return (
        emb.groupBy("label")
        .agg(F.count(F.lit(1)).alias("n_total"))
        .join(
            kept.groupBy("label").agg(
                F.count(F.lit(1)).alias("n_kept"),
                F.sum("vec_id").alias("kept_id_sum"),
            ),
            "label",
        )
        .orderBy("label")
    )


ORACLE_DEDUP_SEMANTIC = """
WITH e AS (SELECT vec_id, label, embedding FROM embeddings),
dropped AS (
  SELECT DISTINCT v.vec_id
  FROM e u JOIN e v ON u.label = v.label AND u.vec_id < v.vec_id
  WHERE round(
      list_sum(list_transform(range(1, len(u.embedding) + 1),
        i -> CAST(u.embedding[i] AS DOUBLE) * CAST(v.embedding[i] AS DOUBLE)))
      / (sqrt(list_sum(list_transform(range(1, len(u.embedding) + 1),
          i -> CAST(u.embedding[i] AS DOUBLE) * CAST(u.embedding[i] AS DOUBLE))))
       * sqrt(list_sum(list_transform(range(1, len(v.embedding) + 1),
          i -> CAST(v.embedding[i] AS DOUBLE) * CAST(v.embedding[i] AS DOUBLE)))))
    , 6) >= 0.3
),
kept AS (
  SELECT label, vec_id FROM e
  WHERE vec_id NOT IN (SELECT vec_id FROM dropped)
)
SELECT t.label, t.n_total, k.n_kept, k.kept_id_sum
FROM (SELECT label, count(*) AS n_total FROM e GROUP BY label) t
JOIN (SELECT label, count(*) AS n_kept, CAST(sum(vec_id) AS BIGINT) AS kept_id_sum
      FROM kept GROUP BY label) k
  ON t.label = k.label
ORDER BY t.label
"""


QUERIES.update(
    {
        "dedup_embedding_cosine": q_dedup_embedding_cosine,
        "dedup_semantic": q_dedup_semantic,
        "text_bpe_tokens": q_text_bpe_tokens,
    }
)
ORACLES.update(
    {
        "dedup_embedding_cosine": ORACLE_DEDUP_COSINE,
        "dedup_semantic": ORACLE_DEDUP_SEMANTIC,
        "text_bpe_tokens": ORACLE_BPE,
    }
)


# ---------------------------------------------------------------------------
# §2.8-ext — misc scalar suite (F4, F10, F11, F13, F14) + JSON extraction
# ---------------------------------------------------------------------------


def q_f_misc_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F4 format, F10/F11 math, F13 base64/decode, F14 struct→JSON, and
    JSON field extraction from the events props column."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.format_string("%s-%05d", F.col("event_type"), F.col("event_id")).alias(
            "tag"
        ),
        F.base64(F.encode(F.col("event_type"), "UTF-8")).alias("b64"),
        F.decode(F.unbase64(F.base64(F.encode("event_type", "UTF-8"))), "UTF-8").alias(
            "roundtrip"
        ),
        F.round(F.abs(F.col("value") - 250.0), 2).alias("abs_dev"),
        F.greatest("user_id", "event_id").alias("gr"),
        F.floor(F.col("value")).cast("long").alias("value_floor"),
        F.get_json_object("props", "$.k").alias("prop_k"),
        F.to_json(
            F.struct(F.col("event_type").alias("t"), F.col("user_id").alias("u"))
        ).alias("payload"),
    )


ORACLE_F_MISC = """
SELECT event_id,
       printf('%s-%05d', event_type, event_id) AS tag,
       base64(encode(event_type)) AS b64,
       decode(from_base64(base64(encode(event_type)))) AS roundtrip,
       round(abs(value - 250.0), 2) AS abs_dev,
       greatest(user_id, event_id) AS gr,
       CAST(floor(value) AS BIGINT) AS value_floor,
       json_extract_string(props, '$.k') AS prop_k,
       CAST(to_json(struct_pack(t := event_type, u := user_id)) AS VARCHAR) AS payload
FROM events
"""


# ---------------------------------------------------------------------------
# §2.3 J2 — versions lookup join (util.py:270-276, install.py:173-176)
# ---------------------------------------------------------------------------

_VERSIONS = [
    ("click", "1.0"),
    ("view", "1.1"),
    ("purchase", "2.0"),
    ("signup", "2.1"),
    ("error", "0.9"),
]


def q_j2_versions_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2: tiny versions table broadcast-joined onto the fact stream —
    the versions.ini lookup as a dim join."""
    ev = load_table(spark, sf_dir, "events")
    versions = spark.createDataFrame(_VERSIONS, "event_type STRING, version STRING")
    return ev.join(F.broadcast(versions), "event_type").select(
        "event_id", "event_type", "version"
    )


ORACLE_J2 = """
SELECT event_id, e.event_type, version
FROM events e
JOIN (VALUES ('click','1.0'), ('view','1.1'), ('purchase','2.0'),
             ('signup','2.1'), ('error','0.9')) AS v(event_type, version)
  ON e.event_type = v.event_type
"""


QUERIES.update(
    {
        "f_misc_suite": q_f_misc_suite,
        "j2_versions_lookup": q_j2_versions_lookup,
    }
)
ORACLES.update(
    {
        "f_misc_suite": ORACLE_F_MISC,
        "j2_versions_lookup": ORACLE_J2,
    }
)


def q_ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-partitioned ANN as a deterministic acceptance row (centroid
    seeding is hash-ranked and deterministic; the gated CONTRACT is
    mean recall@10 ≥ 0.4 vs the in-query brute-force exact top-10 —
    measured 0.58/0.65 at sf0.001/sf0.01, 0.988 on the clustered
    fixture).  Underlying production operator:
    operators/similarity.ivf_topk (probe-pruned equi-join)."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 8)
    approx = similarity.ivf_topk(emb, queries, k=10, n_lists=16, n_probe=6)
    exact = similarity.brute_force_topk(emb, queries, k=10).select(
        "query_id", "neighbor_id"
    )
    return _ann_recall_gate(approx, exact, bound=0.4)


QUERIES["ann_ivf_topk"] = q_ann_ivf_topk
ORACLES["ann_ivf_topk"] = _ORACLE_ANN_EXACT_HEAD


def q_ann_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ADC ANN with exact re-rank, as a
    deterministic acceptance row (codebook seeding is hash-ranked like
    IVF's; gated CONTRACT: mean recall@10 ≥ 0.4 vs brute force —
    measured 0.51/0.54 at sf0.001/sf0.01, 0.98 on the clustered
    fixture).  The corpus is scanned compressed — 8 int codes per
    vector instead of 64 floats, the storage/serving form a 100 TB
    vector store actually holds in memory; only the 50-deep shortlist
    fetches full vectors for the exact cosine re-rank.  Underlying
    production operator: operators/similarity.pq_topk."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 8)
    approx = similarity.pq_topk(
        emb, queries, k=10, n_sub=8, n_codes=16, rerank=50
    )
    exact = similarity.brute_force_topk(emb, queries, k=10).select(
        "query_id", "neighbor_id"
    )
    return _ann_recall_gate(approx, exact, bound=0.4)


QUERIES["ann_pq_topk"] = q_ann_pq_topk
ORACLES["ann_pq_topk"] = _ORACLE_ANN_EXACT_HEAD


# ---------------------------------------------------------------------------
# §2.9 X7-ext — Datalog query surface over the datoms store
# ---------------------------------------------------------------------------


def q_datalog_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Datomic-style Datalog compiled to Catalyst self-joins: entities whose
    returnflag is 'R' and linestatus is 'F', with their quantity."""
    from . import datalog

    datoms = _melted_lineitem(spark, sf_dir)
    return datalog.query(
        datoms,
        find=["?e", "?qty"],
        where=[
            ["?e", "l_returnflag", "R"],
            ["?e", "l_linestatus", "F"],
            ["?e", "l_quantity", "?qty"],
        ],
    )


# NB: datom-level join semantics, not row-level — entities melted from
# colliding (orderkey, linenumber) keys legitimately combine facts from
# different source rows, exactly as an EAV store would
ORACLE_DATALOG = f"""
WITH m AS ({_ORACLE_MELT_BODY})
SELECT DISTINCT r.e, q.v AS qty
FROM m r, m s, m q
WHERE r.a = 'l_returnflag' AND r.v = 'R'
  AND s.a = 'l_linestatus' AND s.v = 'F'
  AND q.a = 'l_quantity'
  AND r.e = s.e AND s.e = q.e
"""

QUERIES["datalog_query"] = q_datalog_query
ORACLES["datalog_query"] = ORACLE_DATALOG


def q_datalog_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TWO-entity-variable Datalog — orders (?o) joined to customers (?c)
    through the shared value variable ?ck, with a literal status
    constraint.  Exercises the general clause-fold path (multi-entity
    equi-joins, string-unification of value variables), not the
    single-entity grouped rewrite that datalog_query covers."""
    from . import datalog

    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    order_datoms = o.select(
        F.col("o_orderkey").alias("e"),
        F.lit("order/cust").alias("a"),
        F.col("o_custkey").cast("string").alias("v"),
    ).unionByName(
        o.select(
            F.col("o_orderkey").alias("e"),
            F.lit("order/status").alias("a"),
            F.col("o_orderstatus").alias("v"),
        )
    )
    cust_datoms = c.select(
        (F.col("c_custkey") + 100_000_000).alias("e"),
        F.lit("cust/key").alias("a"),
        F.col("c_custkey").cast("string").alias("v"),
    ).unionByName(
        c.select(
            (F.col("c_custkey") + 100_000_000).alias("e"),
            F.lit("cust/segment").alias("a"),
            F.col("c_mktsegment").alias("v"),
        )
    )
    datoms = order_datoms.unionByName(cust_datoms)
    return datalog.query(
        datoms,
        find=["?o", "?ck", "?seg"],
        where=[
            ["?o", "order/cust", "?ck"],
            ["?o", "order/status", "F"],
            ["?c", "cust/key", "?ck"],
            ["?c", "cust/segment", "?seg"],
        ],
    )


ORACLE_DATALOG_JOIN = """
SELECT DISTINCT o.o_orderkey AS o, CAST(o.o_custkey AS VARCHAR) AS ck,
       c.c_mktsegment AS seg
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
WHERE o.o_orderstatus = 'F'
"""

QUERIES["datalog_join"] = q_datalog_join
ORACLES["datalog_join"] = ORACLE_DATALOG_JOIN


def q_datalog_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Datomic-style aggregate find: per attribute, the count of distinct
    entities carrying it — ``[:find ?a (count ?e) :where [?e ?a _]]``.
    Set semantics: the aggregate runs over distinct (a, e) solutions, so
    (count ?e) is a distinct-entity count, exactly Datomic's default."""
    from . import datalog

    ev = load_table(spark, sf_dir, "events")
    datoms = ev.select(
        F.col("user_id").alias("e"),
        F.col("event_type").alias("a"),
        F.col("event_id").cast("string").alias("v"),
    )
    return datalog.query(datoms, find=["?a", "(count ?e)"], where=[["?e", "?a", "_"]])


ORACLE_DATALOG_AGG = """
SELECT event_type AS a, count(DISTINCT user_id) AS count_e
FROM events GROUP BY event_type
"""

QUERIES["datalog_agg"] = q_datalog_agg
ORACLES["datalog_agg"] = ORACLE_DATALOG_AGG


def q_datalog_not(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Datomic not-clause → anti-join: users who clicked but never
    errored — ``[:find ?e :where [?e "click" _] (not [?e "error" _])]``."""
    from . import datalog

    ev = load_table(spark, sf_dir, "events")
    datoms = ev.select(
        F.col("user_id").alias("e"),
        F.col("event_type").alias("a"),
        F.col("event_id").cast("string").alias("v"),
    )
    return datalog.query(
        datoms,
        find=["?e"],
        where=[["?e", "click", "_"], ("not", ["?e", "error", "_"])],
    )


ORACLE_DATALOG_NOT = """
SELECT DISTINCT user_id AS e FROM events
WHERE event_type = 'click'
  AND user_id NOT IN (SELECT user_id FROM events WHERE event_type = 'error')
"""

QUERIES["datalog_not"] = q_datalog_not
ORACLES["datalog_not"] = ORACLE_DATALOG_NOT


def q_datalog_or(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Datomic or + not composed: users with a click OR a view who never
    errored — the or-clause rewrites to a union of branch queries, the
    not-clause anti-joins the result."""
    from . import datalog

    ev = load_table(spark, sf_dir, "events")
    datoms = ev.select(
        F.col("user_id").alias("e"),
        F.col("event_type").alias("a"),
        F.col("event_id").cast("string").alias("v"),
    )
    return datalog.query(
        datoms,
        find=["?e"],
        where=[
            ("or", [["?e", "click", "_"], ["?e", "view", "_"]]),
            ("not", ["?e", "error", "_"]),
        ],
    )


ORACLE_DATALOG_OR = """
SELECT DISTINCT user_id AS e FROM events
WHERE event_type IN ('click', 'view')
  AND user_id NOT IN (SELECT user_id FROM events WHERE event_type = 'error')
"""

QUERIES["datalog_or"] = q_datalog_or
ORACLES["datalog_or"] = ORACLE_DATALOG_OR


def q_datalog_ancestors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive Datalog rule (ancestor over a parent relation) via path
    doubling: parent edges k → k/2 over the customer keys form a binary
    tree ~log₂(n) deep; the closure finds every (node, ancestor) pair in
    ⌈log₂ depth⌉ self-join rounds.  Oracled by a DuckDB recursive CTE —
    the iterative fixpoint sits inside the exact-correctness gate."""
    from . import datalog

    cust = load_table(spark, sf_dir, "customer")
    edges = cust.filter(F.col("c_custkey") >= 1).select(
        F.col("c_custkey").alias("src"),
        (F.col("c_custkey") / 2).cast("long").alias("dst"),
    )
    return datalog.transitive_closure(edges)


ORACLE_DATALOG_ANCESTORS = """
WITH RECURSIVE edges AS (
  SELECT c_custkey AS src, CAST(floor(c_custkey / 2) AS BIGINT) AS dst
  FROM customer WHERE c_custkey >= 1
), reach(src, dst) AS (
  SELECT src, dst FROM edges
  UNION
  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
)
SELECT src, dst FROM reach
"""

QUERIES["datalog_ancestors"] = q_datalog_ancestors
ORACLES["datalog_ancestors"] = ORACLE_DATALOG_ANCESTORS


def q_datalog_pull(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Datomic pull-pattern surface (datalog.pull): nation entities pulled
    with a card-one attribute, a card-many attribute (two planted tag
    datoms per nation), and a ref navigation into region entities —
    ``pull(e, ["nation/name", "nation/tag", {"nation/region":
    ["region/name"]}])``.  The output is the canonical-JSON document the
    pull API defines (pattern-order keys, sorted value arrays), which the
    oracle rebuilds byte-for-byte with plain string concatenation."""
    from . import datalog

    nat = load_table(spark, sf_dir, "nation")
    reg = load_table(spark, sf_dir, "region")
    e = F.col("n_nationkey").cast("long")
    datoms = (
        nat.select(e.alias("e"), F.lit("nation/name").alias("a"),
                   F.col("n_name").alias("v"))
        .unionByName(nat.select(
            e.alias("e"), F.lit("nation/tag").alias("a"),
            F.format_string("alpha_%d", (F.col("n_nationkey") % 3)).alias("v")))
        .unionByName(nat.select(
            e.alias("e"), F.lit("nation/tag").alias("a"),
            F.format_string("beta_%d", (F.col("n_nationkey") % 2)).alias("v")))
        .unionByName(nat.select(
            e.alias("e"), F.lit("nation/region").alias("a"),
            (F.col("n_regionkey").cast("long") + 1000).cast("string").alias("v")))
        .unionByName(reg.select(
            (F.col("r_regionkey").cast("long") + 1000).alias("e"),
            F.lit("region/name").alias("a"), F.col("r_name").alias("v")))
    )
    return datalog.pull(
        datoms,
        ["nation/name", "nation/tag", {"nation/region": ["region/name"]}],
    )


ORACLE_DATALOG_PULL = """
SELECT CAST(n.n_nationkey AS BIGINT) AS e,
       '{"nation/name":["' || n.n_name || '"],"nation/tag":["' ||
       array_to_string(list_sort(['alpha_' || CAST(n.n_nationkey % 3 AS VARCHAR),
                                  'beta_'  || CAST(n.n_nationkey % 2 AS VARCHAR)]),
                       '","') ||
       '"],"nation/region":[{"region/name":["' || r.r_name || '"]}]}'
       AS pulled
FROM nation n JOIN region r ON r.r_regionkey = n.n_regionkey
"""

QUERIES["datalog_pull"] = q_datalog_pull
ORACLES["datalog_pull"] = ORACLE_DATALOG_PULL


def q_datalog_pull_wildcard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Datomic wildcard pull ``[*]`` (datalog.pull with "*"): every
    attribute of every entity in the universe, keys in sorted attribute
    order, absent attributes as empty arrays.  Same planted fixture as
    datalog_pull, so region entities (ref targets) also surface — with
    their one region/name attribute filled and the nation attributes
    empty.  The attribute universe is resolved schema-tier (one tiny
    distinct collect), exactly how Datomic reads its ident registry."""
    from . import datalog

    nat = load_table(spark, sf_dir, "nation")
    reg = load_table(spark, sf_dir, "region")
    e = F.col("n_nationkey").cast("long")
    datoms = (
        nat.select(e.alias("e"), F.lit("nation/name").alias("a"),
                   F.col("n_name").alias("v"))
        .unionByName(nat.select(
            e.alias("e"), F.lit("nation/tag").alias("a"),
            F.format_string("alpha_%d", (F.col("n_nationkey") % 3)).alias("v")))
        .unionByName(nat.select(
            e.alias("e"), F.lit("nation/region").alias("a"),
            (F.col("n_regionkey").cast("long") + 1000).cast("string").alias("v")))
        .unionByName(reg.select(
            (F.col("r_regionkey").cast("long") + 1000).alias("e"),
            F.lit("region/name").alias("a"), F.col("r_name").alias("v")))
    )
    return datalog.pull(datoms, ["*"])


ORACLE_DATALOG_PULL_WILDCARD = """
SELECT CAST(n.n_nationkey AS BIGINT) AS e,
       '{"nation/name":["' || n.n_name || '"],"nation/region":["' ||
       CAST(n.n_regionkey + 1000 AS VARCHAR) ||
       '"],"nation/tag":["alpha_' || CAST(n.n_nationkey % 3 AS VARCHAR) ||
       '"],"region/name":[]}' AS pulled
FROM nation n
UNION ALL
SELECT CAST(r.r_regionkey + 1000 AS BIGINT) AS e,
       '{"nation/name":[],"nation/region":[],"nation/tag":[],' ||
       '"region/name":["' || r.r_name || '"]}' AS pulled
FROM region r
"""

QUERIES["datalog_pull_wildcard"] = q_datalog_pull_wildcard
ORACLES["datalog_pull_wildcard"] = ORACLE_DATALOG_PULL_WILDCARD


def q_eav_cas_patch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Datomic ``:db.fn/cas`` semantics (eav.apply_cas): a CAS patch
    asserts only when the store's CURRENT visible value equals the
    expected one — expected NULL matches an absent/retracted datom.
    Fixture: every customer has a segment; every 7th is then retracted
    (CAS with NULL expected re-creates it), every remaining 3rd carries
    a stale expectation (rejected — value stays), the rest swap cleanly.
    The oracle computes the same case split in closed form."""
    from .operators.eav import apply_cas

    cust = load_table(spark, sf_dir, "customer")
    k = F.col("c_custkey")
    seg = F.format_string("seg_%d", k % 5)
    base = cust.select(
        k.alias("e"), F.lit("cust/segment").alias("a"), seg.alias("v"),
        F.lit(1).alias("tx"), F.lit(True).alias("op"),
    ).unionByName(
        cust.filter(k % 7 == 0).select(
            k.alias("e"), F.lit("cust/segment").alias("a"), seg.alias("v"),
            F.lit(2).alias("tx"), F.lit(False).alias("op"),
        )
    )
    cas = cust.select(
        k.alias("e"),
        F.lit("cust/segment").alias("a"),
        F.when(k % 7 == 0, F.lit(None).cast("string"))
        .when(k % 3 == 0, F.lit("WRONG"))
        .otherwise(seg)
        .alias("expected"),
        F.format_string("updated_%d", k % 10).alias("v"),
        F.lit(3).alias("tx"),
    )
    resolved = apply_cas(base, cas)
    return resolved.select("e", "v").orderBy("e")


ORACLE_EAV_CAS = """
SELECT c_custkey AS e,
       CASE WHEN c_custkey % 7 = 0
              THEN 'updated_' || CAST(c_custkey % 10 AS VARCHAR)
            WHEN c_custkey % 3 = 0
              THEN 'seg_' || CAST(c_custkey % 5 AS VARCHAR)
            ELSE 'updated_' || CAST(c_custkey % 10 AS VARCHAR) END AS v
FROM customer ORDER BY e
"""

QUERIES["eav_cas_patch"] = q_eav_cas_patch
ORACLES["eav_cas_patch"] = ORACLE_EAV_CAS


def q_range_join_campaigns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-containment join: events matched to overlapping campaign
    windows (6-day windows every 5 days, derived from region — adjacent
    campaigns overlap so multi-match is exercised).  Runs the bucketed
    range join (relational.range_join): interval side explodes into day
    buckets, facts equi-join on their bucket, exact predicate refines —
    never the nested-loop plan a raw range predicate compiles to."""
    ev = load_table(spark, sf_dir, "events").select("event_id", "ts")
    base = F.to_date(F.lit("2024-01-01"))
    iv = load_table(spark, sf_dir, "region").select(
        F.format_string("CAMP_%d", F.col("r_regionkey")).alias("campaign"),
        F.to_timestamp(
            F.date_add(base, (F.col("r_regionkey") * 5).cast("int"))
        ).alias("c_start"),
        F.to_timestamp(
            F.date_add(base, (F.col("r_regionkey") * 5 + 6).cast("int"))
        ).alias("c_end"),
    )
    out = relational.range_join(ev, iv, "ts", "c_start", "c_end")
    return out.select("event_id", "campaign")


ORACLE_RANGE_JOIN = """
SELECT e.event_id, 'CAMP_' || r.r_regionkey AS campaign
FROM events e
JOIN region r
  ON e.ts >= TIMESTAMP '2024-01-01' + r.r_regionkey * 5 * INTERVAL 1 DAY
 AND e.ts <  TIMESTAMP '2024-01-01' + (r.r_regionkey * 5 + 6) * INTERVAL 1 DAY
"""

QUERIES["range_join_campaigns"] = q_range_join_campaigns
ORACLES["range_join_campaigns"] = ORACLE_RANGE_JOIN


def q_f_variant_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured ingestion via Spark 4's VARIANT type: ``parse_json``
    once, then typed ``variant_get`` extraction — the shredded-JSON path a
    training-data metadata column takes (vs per-access get_json_object
    re-parsing, covered by f_misc_suite)."""
    ev = load_table(spark, sf_dir, "events")
    v = F.parse_json("props")
    return ev.select(
        "event_id",
        F.variant_get(v, "$.k", "long").alias("k_long"),
        F.variant_get(v, "$.k", "string").alias("k_str"),
        F.variant_get(v, "$.missing", "string").alias("absent"),
    )


ORACLE_VARIANT = """
SELECT event_id,
       CAST(json_extract(props, '$.k') AS BIGINT) AS k_long,
       json_extract_string(props, '$.k') AS k_str,
       json_extract_string(props, '$.missing') AS absent
FROM events
"""

QUERIES["f_variant_json"] = q_f_variant_json
ORACLES["f_variant_json"] = ORACLE_VARIANT


def q_multimodal_png_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image decode, oracled: one constant-color PNG per nation is
    encoded distributed (pure-stdlib codec: struct + zlib + row filters),
    then decoded back — header parse, inflate, unfilter, per-channel
    pixel means — in the Arrow-batched codec seam.  The oracle recomputes
    width/height/means from the generation formulas, so a wrong filter or
    inflate path shifts the means and fails the gate.  (PIL/ffmpeg are
    not in this container; PNG needs neither.)"""
    from collections.abc import Iterator as _It

    import pandas as _pd

    from .multimodal.binary_ops import decode_pixel_stats
    from .multimodal.png_codec import encode_png_rgb

    nat = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").cast("long").alias("media_id")
    )

    def gen(batches: _It[_pd.DataFrame]) -> _It[_pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid in pdf["media_id"]:
                k = int(mid)
                w, h = 8 + k % 16, 8 + (3 * k) % 16
                color = bytes([(k * 9) % 256, (k * 5) % 256, (k * 3) % 256])
                rows.append((k, encode_png_rgb(w, h, color * (w * h))))
            yield _pd.DataFrame(rows, columns=["media_id", "payload"])

    media = nat.mapInPandas(gen, "media_id LONG, payload BINARY")
    stats = decode_pixel_stats(media)
    return stats.select(
        "media_id",
        "width",
        "height",
        "channels",
        F.element_at("means", 1).alias("mean_r"),
        F.element_at("means", 2).alias("mean_g"),
        F.element_at("means", 3).alias("mean_b"),
    )


ORACLE_MULTIMODAL_PNG = """
SELECT CAST(n_nationkey AS BIGINT) AS media_id,
       CAST(8 + n_nationkey % 16 AS INTEGER) AS width,
       CAST(8 + (3 * n_nationkey) % 16 AS INTEGER) AS height,
       CAST(3 AS INTEGER) AS channels,
       CAST((n_nationkey * 9) % 256 AS DOUBLE) AS mean_r,
       CAST((n_nationkey * 5) % 256 AS DOUBLE) AS mean_g,
       CAST((n_nationkey * 3) % 256 AS DOUBLE) AS mean_b
FROM nation
"""

QUERIES["multimodal_png_decode"] = q_multimodal_png_decode
ORACLES["multimodal_png_decode"] = ORACLE_MULTIMODAL_PNG


def q_multimodal_jpeg_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL baseline-JPEG decode, oracled: per nation a grayscale JPEG of
    flat 8×8 blocks (pure-stdlib encoder: Annex-K Huffman tables, uniform
    quant of 8s — block value ``(k·37 + 11·i) % 256`` decodes bit-exactly,
    see jpeg_codec.py) is encoded distributed, then decoded back through
    the real marker-parse → Huffman → dequant → IDCT path in the Arrow
    codec seam.  The oracle recomputes width/height/mean from the
    generation formulas, so a wrong Huffman table, predictor, or IDCT
    shifts the mean and fails the gate.  (libjpeg is not in this
    container; baseline JPEG needs only stdlib.)"""
    from collections.abc import Iterator as _It

    import pandas as _pd

    from .multimodal.binary_ops import decode_pixel_stats
    from .multimodal.jpeg_codec import encode_jpeg_gray_blocks

    nat = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").cast("long").alias("media_id")
    )

    def gen(batches: _It[_pd.DataFrame]) -> _It[_pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid in pdf["media_id"]:
                k = int(mid)
                wb, hb = 1 + k % 4, 1 + (k // 4) % 3
                vals = [(k * 37 + 11 * i) % 256 for i in range(wb * hb)]
                rows.append((k, encode_jpeg_gray_blocks(wb, hb, vals)))
            yield _pd.DataFrame(rows, columns=["media_id", "payload"])

    media = nat.mapInPandas(gen, "media_id LONG, payload BINARY")
    stats = decode_pixel_stats(media)
    return stats.select(
        "media_id",
        "width",
        "height",
        "channels",
        F.element_at("means", 1).alias("mean_gray"),
    )


ORACLE_MULTIMODAL_JPEG = """
SELECT CAST(n.n_nationkey AS BIGINT) AS media_id,
       CAST(8 * (1 + n.n_nationkey % 4) AS INTEGER) AS width,
       CAST(8 * (1 + (n.n_nationkey // 4) % 3) AS INTEGER) AS height,
       CAST(1 AS INTEGER) AS channels,
       avg(CAST((n.n_nationkey * 37 + 11 * r.range) % 256 AS DOUBLE))
           AS mean_gray
FROM nation n CROSS JOIN range(12) r
WHERE r.range < (1 + n.n_nationkey % 4) * (1 + (n.n_nationkey // 4) % 3)
GROUP BY 1, 2, 3, 4
"""

QUERIES["multimodal_jpeg_decode"] = q_multimodal_jpeg_decode
ORACLES["multimodal_jpeg_decode"] = ORACLE_MULTIMODAL_JPEG


def q_multimodal_gif_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL GIF decode, oracled: per nation a palettized GIF (pure-stdlib
    codec — real variable-width LZW with dictionary growth, 4-pass
    interlace on odd keys, palette sizes 2/4/8) is encoded distributed,
    then decoded back — LZW, palette mapping, de-interlace — in the
    Arrow codec seam.  Pixel index (x + 2y + k) mod ncolors and the
    palette formulas give closed-form channel means, so a wrong LZW
    width transition or palette offset fails the gate.  (Means are
    pixel-order-invariant; the interlace reorder itself is pinned by the
    exact-pixel roundtrip tests in test_gif_codec.py.)"""
    from collections.abc import Iterator as _It

    import pandas as _pd

    from .multimodal.binary_ops import decode_pixel_stats
    from .multimodal.gif_codec import encode_gif

    nat = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").cast("long").alias("media_id")
    )

    def gen(batches: _It[_pd.DataFrame]) -> _It[_pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid in pdf["media_id"]:
                k = int(mid)
                w, h = 6 + k % 10, 4 + (3 * k) % 10
                n = 2 << (k % 3)
                palette = b"".join(
                    bytes(
                        (
                            (i * 41 + k * 7) % 256,
                            (i * 29 + k * 11) % 256,
                            (i * 17 + k * 13) % 256,
                        )
                    )
                    for i in range(n)
                )
                idx = bytes(
                    (x + 2 * y + k) % n for y in range(h) for x in range(w)
                )
                rows.append(
                    (k, encode_gif(w, h, palette, idx, interlaced=k % 2 == 1))
                )
            yield _pd.DataFrame(rows, columns=["media_id", "payload"])

    media = nat.mapInPandas(gen, "media_id LONG, payload BINARY")
    stats = decode_pixel_stats(media)
    return stats.select(
        "media_id",
        "width",
        "height",
        "channels",
        F.element_at("means", 1).alias("mean_r"),
        F.element_at("means", 2).alias("mean_g"),
        F.element_at("means", 3).alias("mean_b"),
    )


ORACLE_MULTIMODAL_GIF = """
WITH px AS (
  SELECT n.n_nationkey AS k,
         6 + n.n_nationkey % 10 AS w,
         4 + (3 * n.n_nationkey) % 10 AS h,
         2 * power(2, n.n_nationkey % 3) AS nc,
         x.range AS x, y.range AS y
  FROM nation n CROSS JOIN range(16) x CROSS JOIN range(14) y
  WHERE x.range < 6 + n.n_nationkey % 10
    AND y.range < 4 + (3 * n.n_nationkey) % 10
),
idx AS (
  SELECT k, w, h,
         CAST((x + 2 * y + k) % CAST(nc AS BIGINT) AS BIGINT) AS i
  FROM px
)
SELECT CAST(k AS BIGINT) AS media_id,
       CAST(w AS INTEGER) AS width,
       CAST(h AS INTEGER) AS height,
       CAST(3 AS INTEGER) AS channels,
       avg(CAST((i * 41 + k * 7) % 256 AS DOUBLE)) AS mean_r,
       avg(CAST((i * 29 + k * 11) % 256 AS DOUBLE)) AS mean_g,
       avg(CAST((i * 17 + k * 13) % 256 AS DOUBLE)) AS mean_b
FROM idx
GROUP BY k, w, h
"""

QUERIES["multimodal_gif_decode"] = q_multimodal_gif_decode
ORACLES["multimodal_gif_decode"] = ORACLE_MULTIMODAL_GIF


def q_multimodal_video_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL video frame sampling, oracled: per region an MJPEG AVI
    (pure-stdlib RIFF writer, avi_codec.py) holding 4+k DC-block JPEG
    frames; every 2nd frame is container-walked out and decoded through
    the REAL baseline-JPEG kernel.  The oracle recomputes each sampled
    frame's mean from the block-value formula — a wrong RIFF walk,
    chunk alignment, or frame-sample stride changes which frames (and
    which means) appear."""
    from collections.abc import Iterator as _It

    import pandas as _pd

    from .multimodal.avi_codec import encode_avi_mjpeg
    from .multimodal.binary_ops import decode_video_frame_stats
    from .multimodal.jpeg_codec import encode_jpeg_gray_blocks

    reg = load_table(spark, sf_dir, "region").select(
        F.col("r_regionkey").cast("long").alias("media_id")
    )

    def gen(batches: _It[_pd.DataFrame]) -> _It[_pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid in pdf["media_id"]:
                k = int(mid)
                frames = [
                    encode_jpeg_gray_blocks(
                        2,
                        2,
                        [(k * 23 + j * 37 + 11 * b) % 256 for b in range(4)],
                    )
                    for j in range(4 + k)
                ]
                rows.append((k, encode_avi_mjpeg(16, 16, 10, frames)))
            yield _pd.DataFrame(rows, columns=["media_id", "payload"])

    media = reg.mapInPandas(gen, "media_id LONG, payload BINARY")
    return decode_video_frame_stats(media, every_n=2)


ORACLE_MULTIMODAL_VIDEO = """
WITH f AS (
  SELECT r.r_regionkey AS k, j.range AS j
  FROM region r CROSS JOIN range(9) j
  WHERE j.range < 4 + r.r_regionkey AND j.range % 2 = 0
)
SELECT CAST(k AS BIGINT) AS media_id,
       CAST(j AS INTEGER) AS frame_idx,
       CAST(16 AS INTEGER) AS width,
       CAST(16 AS INTEGER) AS height,
       avg(CAST((k * 23 + j * 37 + 11 * b.range) % 256 AS DOUBLE))
           AS mean_gray
FROM f CROSS JOIN range(4) b
GROUP BY k, j
"""

QUERIES["multimodal_video_frames"] = q_multimodal_video_frames
ORACLES["multimodal_video_frames"] = ORACLE_MULTIMODAL_VIDEO


def q_multimodal_g711_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL G.711 companded-audio decode, oracled: per region a
    telephony WAV (format code 7 µ-law on even keys, 6 A-law on odd —
    formats stdlib ``wave`` cannot read) with companded bytes
    ``(i·7 + k·13) mod 256``, expanded through the exact ITU integer
    math and profiled (RMS/peak/zero-crossings).  The oracle replays
    the SAME G.711 expansion in SQL bit arithmetic — a wrong segment
    shift, sign convention (A-law's is inverted!), or bias constant
    shifts every statistic."""
    from collections.abc import Iterator as _It

    import pandas as _pd

    from .multimodal.binary_ops import decode_g711_stats
    from .multimodal.g711_codec import encode_wav_g711

    reg = load_table(spark, sf_dir, "region").select(
        F.col("r_regionkey").cast("long").alias("media_id")
    )

    def gen(batches: _It[_pd.DataFrame]) -> _It[_pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid in pdf["media_id"]:
                k = int(mid)
                n = 400 + 100 * k
                comp = bytes((i * 7 + k * 13) % 256 for i in range(n))
                law = "ulaw" if k % 2 == 0 else "alaw"
                rows.append((k, encode_wav_g711(8000, comp, law)))
            yield _pd.DataFrame(rows, columns=["media_id", "payload"])

    media = reg.mapInPandas(gen, "media_id LONG, payload BINARY")
    return decode_g711_stats(media)


ORACLE_MULTIMODAL_G711 = """
WITH bytes_ AS (
  SELECT r.r_regionkey AS k, i.range AS i,
         (i.range * 7 + r.r_regionkey * 13) % 256 AS b
  FROM region r CROSS JOIN range(900) i
  WHERE i.range < 400 + 100 * r.r_regionkey
),
expanded AS (
  SELECT k, i,
    CASE WHEN k % 2 = 0 THEN
      -- mu-law: complement, 3-bit exponent, 4-bit mantissa, bias 0x84
      CASE WHEN (255 - b) >= 128
           THEN -((((((255 - b) % 16) * 8 + 132) << (((255 - b) // 16) % 8)) - 132))
           ELSE (((((255 - b) % 16) * 8 + 132) << (((255 - b) // 16) % 8)) - 132)
      END
    ELSE
      -- A-law: 0x55 toggle; sign bit SET means POSITIVE
      CASE WHEN xor(b, 85) >= 128
           THEN CASE WHEN ((xor(b, 85) // 16) % 8) = 0
                     THEN (xor(b, 85) % 16) * 16 + 8
                     ELSE ((xor(b, 85) % 16) * 16 + 264)
                          << (((xor(b, 85) // 16) % 8) - 1) END
           ELSE -(CASE WHEN ((xor(b, 85) // 16) % 8) = 0
                       THEN (xor(b, 85) % 16) * 16 + 8
                       ELSE ((xor(b, 85) % 16) * 16 + 264)
                            << (((xor(b, 85) // 16) % 8) - 1) END)
      END
    END AS x
  FROM bytes_
),
with_prev AS (
  SELECT k, x, lag(x) OVER (PARTITION BY k ORDER BY i) AS px
  FROM expanded
)
SELECT CAST(k AS BIGINT) AS media_id,
       CASE WHEN k % 2 = 0 THEN 'ulaw' ELSE 'alaw' END AS law,
       CAST(count(*) AS INTEGER) AS n_samples,
       sqrt(CAST(sum(CAST(x AS BIGINT) * CAST(x AS BIGINT)) AS DOUBLE)
            / count(*)) AS rms,
       CAST(max(abs(x)) AS INTEGER) AS peak,
       CAST(sum(CASE WHEN px IS NOT NULL
                      AND (x >= 0) <> (px >= 0) THEN 1 ELSE 0 END)
            AS INTEGER) AS zero_crossings
FROM with_prev
GROUP BY k
"""

QUERIES["multimodal_g711_stats"] = q_multimodal_g711_stats
ORACLES["multimodal_g711_stats"] = ORACLE_MULTIMODAL_G711


def q_multimodal_wav_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio metadata decode, oracled: one 16-bit PCM WAV per region
    (stdlib ``wave`` encode — rate and length derived from the region
    key), RIFF header parsed back in the Arrow codec seam.  Oracle
    recomputes channels/rate/frames/duration from the formulas."""
    from collections.abc import Iterator as _It

    import pandas as _pd

    from .multimodal.binary_ops import decode_wav_meta, encode_wav_pcm16

    reg = load_table(spark, sf_dir, "region").select(
        F.col("r_regionkey").cast("long").alias("media_id")
    )

    def gen(batches: _It[_pd.DataFrame]) -> _It[_pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid in pdf["media_id"]:
                k = int(mid)
                rate = 8000 + 1000 * k
                n_frames = 1600 + 100 * k
                frames = bytes(2 * n_frames)  # silence, 16-bit mono
                rows.append((k, encode_wav_pcm16(rate, frames)))
            yield _pd.DataFrame(rows, columns=["media_id", "payload"])

    media = reg.mapInPandas(gen, "media_id LONG, payload BINARY")
    return decode_wav_meta(media)


ORACLE_MULTIMODAL_WAV = """
SELECT CAST(r_regionkey AS BIGINT) AS media_id,
       CAST(1 AS INTEGER) AS n_channels,
       CAST(8000 + 1000 * r_regionkey AS INTEGER) AS sample_rate,
       CAST(1600 + 100 * r_regionkey AS BIGINT) AS n_frames,
       CAST(1600 + 100 * r_regionkey AS DOUBLE) * 1000.0
         / (8000 + 1000 * r_regionkey) AS duration_ms
FROM region
"""

QUERIES["multimodal_wav_meta"] = q_multimodal_wav_meta
ORACLES["multimodal_wav_meta"] = ORACLE_MULTIMODAL_WAV


def q_multimodal_image_sniff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Format sniffing + header-only dimension extraction across four
    raster formats (PNG real encode; JPEG/GIF/BMP minimal real headers)
    — the first pass over a raw media corpus, no codec libs involved.
    One payload per (nation, format); oracle recomputes format and the
    formula dimensions."""
    from collections.abc import Iterator as _It

    import pandas as _pd

    from .multimodal.binary_ops import sniff_image_meta
    from .multimodal.image_meta import (
        make_bmp_header,
        make_gif_header,
        make_jpeg_header,
    )
    from .multimodal.png_codec import encode_png_rgb

    nat = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").cast("long").alias("k")
    )

    def gen(batches: _It[_pd.DataFrame]) -> _It[_pd.DataFrame]:
        for pdf in batches:
            rows = []
            for kk in pdf["k"]:
                k = int(kk)
                w, h = 4 + k % 8, 4 + (k * 7) % 8
                rows.append((k * 4 + 0, encode_png_rgb(w, h, b"\x10" * (w * h * 3))))
                rows.append((k * 4 + 1, make_jpeg_header(w + 100, h + 100)))
                rows.append((k * 4 + 2, make_gif_header(w + 200, h + 200)))
                rows.append((k * 4 + 3, make_bmp_header(w + 300, h + 300)))
            yield _pd.DataFrame(rows, columns=["media_id", "payload"])

    media = nat.mapInPandas(gen, "media_id LONG, payload BINARY")
    return sniff_image_meta(media)


ORACLE_IMAGE_SNIFF = """
WITH base AS (
  SELECT n_nationkey AS k,
         4 + n_nationkey % 8 AS w,
         4 + (n_nationkey * 7) % 8 AS h
  FROM nation
)
SELECT CAST(k * 4 + f.i AS BIGINT) AS media_id, f.fmt AS format,
       CAST(w + f.off AS INTEGER) AS width,
       CAST(h + f.off AS INTEGER) AS height
FROM base
CROSS JOIN (VALUES (0, 'png', 0), (1, 'jpeg', 100),
                   (2, 'gif', 200), (3, 'bmp', 300)) AS f(i, fmt, off)
"""

QUERIES["multimodal_image_sniff"] = q_multimodal_image_sniff
ORACLES["multimodal_image_sniff"] = ORACLE_IMAGE_SNIFF


def q_x7_multi_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X7 cardinality-many pivot: EAV → one sorted ``array<string>`` per
    attribute per entity (pivot_multi) — the wide form for multi-valued
    ACeDB tags (the card-one exact pivot is x7_pivot_roundtrip).  Arrays
    are sorted, so results are layout-independent and hashable."""
    melted = _melted_lineitem(spark, sf_dir)
    return eav.pivot_multi(
        melted.filter(F.col("a").isin("l_returnflag", "l_linestatus")),
        ["l_returnflag", "l_linestatus"],
    )


ORACLE_X7_MULTI = f"""
WITH m AS ({_ORACLE_MELT_BODY})
SELECT e,
       array_agg(v ORDER BY v) FILTER (WHERE a = 'l_returnflag')
         AS l_returnflag,
       array_agg(v ORDER BY v) FILTER (WHERE a = 'l_linestatus')
         AS l_linestatus
FROM m
WHERE a IN ('l_returnflag', 'l_linestatus')
GROUP BY e
"""

QUERIES["x7_multi_pivot"] = q_x7_multi_pivot
ORACLES["x7_multi_pivot"] = ORACLE_X7_MULTI


def q_x7_attr_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X7 escape hatch for very wide/sparse classes: one ``map<a,v>`` per
    entity instead of thousands of sparse columns (to_attr_map), rendered
    as sorted-key JSON for engine-portable comparison.  Restricted to
    entities with unique (orderkey, linenumber) — duplicate map keys are
    an error by design (mapKeyDedupPolicy=EXCEPTION)."""
    melted = _melted_lineitem(spark, sf_dir)
    w = Window.partitionBy("e")
    unique = (
        melted.withColumn("__n", F.count(F.lit(1)).over(w))
        .filter(F.col("__n") == len(_MELT_ATTRS))
        .drop("__n")
    )
    mapped = eav.to_attr_map(unique)
    return mapped.select("e", F.to_json("attrs").alias("attrs_json"))


ORACLE_X7_ATTR_MAP = (
    "WITH m AS ("
    + _ORACLE_MELT_BODY
    + """),
u AS (
  SELECT * FROM (
    SELECT m.*, count(*) OVER (PARTITION BY e) AS __n FROM m
  ) WHERE __n = """
    + str(len(_MELT_ATTRS))
    + """
)
SELECT e,
       '{' || string_agg('"' || a || '":"' || v || '"', ',' ORDER BY a, v)
           || '}' AS attrs_json
FROM u GROUP BY e
"""
)

QUERIES["x7_attr_map"] = q_x7_attr_map
ORACLES["x7_attr_map"] = ORACLE_X7_ATTR_MAP


def q_x7_sparse_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X7 wide-class fallback at PIPELINE level (SURVEY §7 hard part (c)):
    ``materialize_wide`` with the attribute-count threshold forced below
    the class width, so the class materializes as one ``map<a, array<v>>``
    column (to_attr_multimap) instead of pivoted columns — the layout a
    thousand-tag ACeDB class needs.

    The store fixture melts unique-keyed lineitem rows into class-qualified
    datoms: four card-one attributes plus a card-many ``lineitem/flags``
    (two datoms per entity) that would be a duplicate-map-key ERROR in the
    card-one map — the multimap absorbs it as a sorted array.  The declared
    result projects map size and per-attribute lookups; the oracle
    recomputes them straight from lineitem."""
    import os

    from .migrate import materialize_wide
    from .queries_e2e import _fx

    store = _fx(sf_dir, "sparse_map_store")
    schema_p = _fx(sf_dir, "sparse_map_schema")
    if not os.path.exists(os.path.join(store, "_SUCCESS")):
        melted = _melted_lineitem(spark, sf_dir)
        w = Window.partitionBy("e")
        unique = (
            melted.withColumn("__n", F.count(F.lit(1)).over(w))
            .filter(F.col("__n") == len(_MELT_ATTRS))
            .drop("__n")
        )
        qualified = unique.select(
            "e",
            F.concat(F.lit("lineitem/"), F.col("a")).alias("a"),
            "v",
            "tx",
            "op",
        )
        flags = (
            unique.filter(F.col("a").isin("l_returnflag", "l_linestatus"))
            .select(
                "e",
                F.lit("lineitem/flags").alias("a"),
                "v",
                "tx",
                "op",
            )
        )
        qualified.unionByName(flags).withColumn(
            "class", F.lit("lineitem")
        ).write.mode("overwrite").parquet(store)
        spark.createDataFrame(
            [("lineitem", a, "one") for a in _MELT_ATTRS]
            + [("lineitem", "flags", "many")],
            ["class", "attribute", "cardinality"],
        ).coalesce(1).write.mode("overwrite").parquet(schema_p)
    out = materialize_wide(
        spark,
        store,
        schema_p,
        _fx(sf_dir, "sparse_map_out"),
        wide_attr_threshold=3,  # class has 5 attrs -> forces the map form
    )
    wide = spark.read.parquet(out["lineitem"])
    return wide.select(
        "e",
        F.size("attrs").alias("n_attrs"),
        F.element_at(F.col("attrs"), "lineitem/l_returnflag")[0].alias(
            "returnflag"
        ),
        F.element_at(F.col("attrs"), "lineitem/l_quantity")[0].alias(
            "quantity"
        ),
        F.element_at(F.col("attrs"), "lineitem/l_shipdate")[0].alias(
            "shipdate"
        ),
        F.array_join(
            F.element_at(F.col("attrs"), "lineitem/flags"), ","
        ).alias("flags"),
    )


ORACLE_X7_SPARSE_MAP = """
WITH unique_li AS (
  SELECT * FROM (
    SELECT *, count(*) OVER (PARTITION BY l_orderkey, l_linenumber) AS __n
    FROM lineitem
  ) WHERE __n = 1
)
SELECT l_orderkey * 8 + l_linenumber AS e,
       5 AS n_attrs,
       l_returnflag AS returnflag,
       CAST(CAST(floor(l_quantity) AS BIGINT) AS VARCHAR) AS quantity,
       CAST(CAST(l_shipdate AS DATE) AS VARCHAR) AS shipdate,
       array_to_string(list_sort([l_returnflag, l_linestatus]), ',') AS flags
FROM unique_li
"""

QUERIES["x7_sparse_map"] = q_x7_sparse_map
ORACLES["x7_sparse_map"] = ORACLE_X7_SPARSE_MAP


def q_j_salted_hot_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-salted equi-join under the oracle gate: events (user_id is the
    hot-key-prone fact side) ⋈ a small per-user dim built from customer.
    The salted plan must produce exactly the plain-join result — the
    oracle IS the plain join."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type"
    )
    dim = (
        load_table(spark, sf_dir, "customer")
        .select(
            (F.col("c_custkey") % 500).alias("user_id"),
            F.col("c_mktsegment").alias("segment"),
        )
        .groupBy("user_id")
        .agg(F.max("segment").alias("segment"))
    )
    return relational.salted_join(ev, dim, on="user_id", salt=8)


ORACLE_SALTED = """
WITH dim AS (
  SELECT c_custkey % 500 AS user_id, max(c_mktsegment) AS segment
  FROM customer GROUP BY 1
)
SELECT e.event_id, e.user_id, e.event_type, d.segment
FROM events e JOIN dim d ON e.user_id = d.user_id
"""

QUERIES["j_salted_hot_key"] = q_j_salted_hot_key
ORACLES["j_salted_hot_key"] = ORACLE_SALTED


def q_corpus_datacard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset-card rollup — the per-(lang, source) summary a training-data
    release ships with: doc and token counts, exact-dup rate, mean quality
    score.  One composed plan: per-doc map stage (tokens, fingerprint,
    quality) → two-level aggregate; shuffles carry per-doc scalars only."""
    docs = load_table(spark, sf_dir, "documents")
    per_doc = docs.select(
        "lang",
        "source",
        "doc_id",
        TXT.token_count("text").alias("n_tok"),
        TXT.fingerprint("text").alias("fp"),
        TXT.quality_score("text").alias("q"),
    )
    # dup rate = 1 - distinct fingerprints / docs, per (lang, source)
    return (
        per_doc.groupBy("lang", "source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").alias("n_tokens"),
            F.countDistinct("fp").alias("n_unique_fp"),
            F.round(
                F.sum(F.col("q").cast("decimal(18,6)"))
                / F.count(F.lit(1)),
                6,
            ).cast("double").alias("mean_quality"),
        )
        .withColumn(
            "dup_rate",
            F.round(
                F.lit(1.0) - F.col("n_unique_fp") / F.col("n_docs"), 6
            ),
        )
    )


ORACLE_DATACARD = r"""
WITH base AS (
  SELECT lang, source, doc_id, text,
         len(list_filter(regexp_split_to_array(trim(text), '\s+'),
                         x -> x <> '')) AS n_tok,
         length(regexp_replace(text, '\s+', '', 'g')) AS n_nonspace,
         length(text) - length(regexp_replace(text, '[^\w\s]', '', 'g'))
           AS n_punct
  FROM documents
), per_doc AS (
  SELECT lang, source, doc_id, n_tok,
         md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g'))) AS fp,
         (CAST(n_tok >= 5 AND n_tok <= 100000 AS DOUBLE)
          + CAST(CAST(n_nonspace AS DOUBLE) / greatest(n_tok, 1) >= 2.0
                 AND CAST(n_nonspace AS DOUBLE) / greatest(n_tok, 1) <= 12.0
                 AS DOUBLE)
          + CAST(CAST(n_punct AS DOUBLE) / greatest(length(text), 1) <= 0.3
                 AS DOUBLE)
         ) / 3.0 AS q
  FROM base
)
SELECT lang, source,
       count(*) AS n_docs,
       CAST(sum(n_tok) AS BIGINT) AS n_tokens,
       count(DISTINCT fp) AS n_unique_fp,
       CAST(round(sum(CAST(q AS DECIMAL(18,6))) / count(*), 6) AS DOUBLE)
         AS mean_quality,
       round(1.0 - CAST(count(DISTINCT fp) AS DOUBLE) / count(*), 6)
         AS dup_rate
FROM per_doc
GROUP BY lang, source
"""

QUERIES["corpus_datacard"] = q_corpus_datacard
ORACLES["corpus_datacard"] = ORACLE_DATACARD


# ---------------------------------------------------------------------------
# §2.4-ext — exact percentiles; deterministic sampling; composed pipeline
# ---------------------------------------------------------------------------


def q_a6_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact continuous percentiles of document length per language —
    the distribution stats a data-budgeting pass needs."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.expr("percentile(n_chars, 0.5)").alias("p50_chars"),
        F.expr("percentile(n_chars, 0.9)").alias("p90_chars"),
        F.min("n_chars").alias("min_chars"),
        F.max("n_chars").alias("max_chars"),
    )


ORACLE_PERCENTILES = """
SELECT lang, count(*) AS n_docs,
       quantile_cont(n_chars, 0.5) AS p50_chars,
       quantile_cont(n_chars, 0.9) AS p90_chars,
       min(n_chars) AS min_chars,
       max(n_chars) AS max_chars
FROM documents GROUP BY lang
"""


def q_sample_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 5% sample by key residue — reproducible across runs,
    partitionings, and engines (training-data splits must never depend on
    an RNG seed tied to cluster layout)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.filter(F.col("event_id") % 20 == 3).select(
        "event_id", "user_id", "event_type"
    )


ORACLE_SAMPLE = """
SELECT event_id, user_id, event_type
FROM events WHERE event_id % 20 = 3
"""


def q_data_pipeline_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composed training-data pass: quality-gate + exact-dedup survivorship
    in one plan (filter → fingerprint group → keep lowest id)."""
    docs = load_table(spark, sf_dir, "documents")
    t = F.col("text")
    n_tok = TXT.token_count(t)
    quality = TXT.quality_score(t)
    norm = F.lower(F.regexp_replace(F.trim(t), r"\s+", " "))
    gated = docs.select(
        "doc_id", n_tok.alias("n_tokens"), F.md5(norm).alias("fp")
    ).filter((quality >= 0.99) & (n_tok >= 20))
    w = Window.partitionBy("fp").orderBy("doc_id")
    return (
        gated.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select("doc_id", "n_tokens")
    )


ORACLE_PIPELINE_FILTER = r"""
WITH base AS (
  SELECT doc_id, text,
         len(list_filter(regexp_split_to_array(trim(text), '\s+'), x -> x <> '')) AS n_tokens,
         length(regexp_replace(text, '\s+', '', 'g')) AS n_nonspace,
         length(text) - length(regexp_replace(text, '[^\w\s]', '', 'g')) AS n_punct,
         md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g'))) AS fp
  FROM documents
), gated AS (
  SELECT doc_id, n_tokens, fp
  FROM base
  WHERE n_tokens >= 20
    AND (CAST(n_tokens >= 5 AND n_tokens <= 100000 AS DOUBLE)
         + CAST(CAST(n_nonspace AS DOUBLE) / greatest(n_tokens, 1) >= 2.0
                AND CAST(n_nonspace AS DOUBLE) / greatest(n_tokens, 1) <= 12.0 AS DOUBLE)
         + CAST(CAST(n_punct AS DOUBLE) / greatest(length(text), 1) <= 0.3 AS DOUBLE)
        ) / 3.0 >= 0.99
)
SELECT doc_id, n_tokens FROM (
  SELECT doc_id, n_tokens,
         row_number() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
  FROM gated
) WHERE rn = 1
"""


QUERIES.update(
    {
        "a6_percentiles": q_a6_percentiles,
        "sample_deterministic": q_sample_deterministic,
        "data_pipeline_filter": q_data_pipeline_filter,
    }
)
ORACLES.update(
    {
        "a6_percentiles": ORACLE_PERCENTILES,
        "sample_deterministic": ORACLE_SAMPLE,
        "data_pipeline_filter": ORACLE_PIPELINE_FILTER,
    }
)


def q_text_tfidf_topterms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF top-3 terms per document — the CountVectorizer-style weighting
    as pure DataFrame ops: explode tokens → tf per (doc, term) → df per
    term → idf = ln(N/df) → top-3 by tfidf (term tiebreak).  Rounded to 6
    (libm ln may differ in the last ulp across engines).

    Scale notes: N rides the plan as a 1-row broadcast (no eager
    ``docs.count()`` extra job), and the tf⋈df join is left to AQE — at
    web-corpus vocabulary size the term side does NOT fit a broadcast, so
    forcing one would OOM the driver; AQE still broadcasts it when it
    actually fits."""
    docs = load_table(spark, sf_dir, "documents")
    n_docs = docs.agg(F.count(F.lit(1)).cast("double").alias("__n_docs"))
    terms = docs.select(
        "doc_id", F.explode(TXT.tokens(F.lower(F.col("text")))).alias("term")
    )
    tf = terms.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df_ = terms.select("doc_id", "term").distinct().groupBy("term").agg(
        F.count(F.lit(1)).alias("df")
    )
    scored = tf.join(df_, "term").join(F.broadcast(n_docs)).select(
        "doc_id",
        "term",
        "tf",
        F.round(
            F.col("tf") * F.log(F.col("__n_docs") / F.col("df")), 6
        ).alias("tfidf"),
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.col("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
    )


ORACLE_TFIDF = r"""
WITH toks AS (
  SELECT doc_id,
         unnest(list_filter(regexp_split_to_array(lower(trim(text)), '\s+'),
                            x -> x <> '')) AS term
  FROM documents
), tf AS (
  SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2
), df_ AS (
  SELECT term, count(*) AS df FROM (SELECT DISTINCT doc_id, term FROM toks)
  GROUP BY term
), n AS (SELECT count(*) AS n_docs FROM documents),
scored AS (
  SELECT doc_id, tf.term, tf,
         round(tf * ln(CAST(n_docs AS DOUBLE) / df), 6) AS tfidf
  FROM tf JOIN df_ ON tf.term = df_.term CROSS JOIN n
)
SELECT doc_id, term, tf, tfidf, rank FROM (
  SELECT *, CAST(row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term)
                 AS INTEGER) AS rank
  FROM scored
) WHERE rank <= 3
"""

QUERIES["text_tfidf_topterms"] = q_text_tfidf_topterms
ORACLES["text_tfidf_topterms"] = ORACLE_TFIDF


def q_profile_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Table-profiling sweep over orders (row/null/distinct/min/max per
    column, one fused aggregation pass)."""
    orders = load_table(spark, sf_dir, "orders")
    return relational.profile_table(
        orders, ["o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority"]
    )


ORACLE_PROFILE = """
SELECT 'o_orderkey' AS column, count(*) AS n_rows,
       CAST(sum(CAST(o_orderkey IS NULL AS INT)) AS BIGINT) AS n_nulls,
       count(DISTINCT o_orderkey) AS n_distinct,
       CAST(min(o_orderkey) AS VARCHAR) AS min_value,
       CAST(max(o_orderkey) AS VARCHAR) AS max_value
FROM orders
UNION ALL
SELECT 'o_custkey', count(*),
       CAST(sum(CAST(o_custkey IS NULL AS INT)) AS BIGINT),
       count(DISTINCT o_custkey),
       CAST(min(o_custkey) AS VARCHAR), CAST(max(o_custkey) AS VARCHAR)
FROM orders
UNION ALL
SELECT 'o_orderstatus', count(*),
       CAST(sum(CAST(o_orderstatus IS NULL AS INT)) AS BIGINT),
       count(DISTINCT o_orderstatus),
       min(o_orderstatus), max(o_orderstatus)
FROM orders
UNION ALL
SELECT 'o_orderpriority', count(*),
       CAST(sum(CAST(o_orderpriority IS NULL AS INT)) AS BIGINT),
       count(DISTINCT o_orderpriority),
       min(o_orderpriority), max(o_orderpriority)
FROM orders
"""

QUERIES["profile_orders"] = q_profile_orders
ORACLES["profile_orders"] = ORACLE_PROFILE


# ---------------------------------------------------------------------------
# §2.3/2.4-ext breadth: multi-way join, selective scan, cube, lag windows,
# semi/anti joins.  The reference's only joins are tiny reconciles
# (pseudoace.py:113-124); these declare the full Spark join/agg surface the
# engine exposes, each with an exact DuckDB oracle.
# ---------------------------------------------------------------------------


def q_q5_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-table join — fact tables shuffle-join on their
    keys, every dim (supplier/nation/region) broadcasts, so the plan has
    exactly two shuffles (orders⋈customer, lineitem⋈orders) regardless of
    fact size."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    revenue = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(18,4)"
    )
    joined = (
        customer.join(orders, F.col("c_custkey") == F.col("o_custkey"))
        .filter(
            (F.col("o_orderdate") >= F.lit("1996-01-01"))
            & (F.col("o_orderdate") < F.lit("1998-01-01"))
        )
        .join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(
            F.broadcast(supplier),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .filter(F.col("r_name") == "ASIA")
    )
    return (
        joined.groupBy("n_name")
        .agg(F.sum(revenue).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), F.col("n_name"))
    )


ORACLE_Q5 = """
SELECT n_name,
       CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1998-01-01'
GROUP BY n_name
ORDER BY revenue DESC, n_name
"""


def q_q6_selective_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: highly selective scan → single global agg.  All
    three predicates push to the parquet reader (row-group pruning at
    scale); map-side partial sum means the single-row exchange is bytes."""
    li = load_table(spark, sf_dir, "lineitem")
    forgone = (F.col("l_extendedprice") * F.col("l_discount")).cast("decimal(18,4)")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01"))
            & (F.col("l_shipdate") < F.lit("1998-01-01"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(forgone).cast("double").alias("forgone_revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


ORACLE_Q6 = """
SELECT CAST(sum(CAST(l_extendedprice * l_discount AS DECIMAL(18,4))) AS DOUBLE)
         AS forgone_revenue,
       count(*) AS n_lines
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate < TIMESTAMP '1998-01-01'
  AND l_discount >= 0.05 AND l_discount <= 0.07
  AND l_quantity < 24
"""


def q_a7_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (returnflag, linestatus): all four grouping-set levels in
    one pass (SURVEY §2.4 exposed built-ins beyond the reference's flat
    groupBy)."""
    li = load_table(spark, sf_dir, "lineitem")
    qty = F.col("l_quantity").cast("decimal(18,2)")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum(qty).cast("double").alias("sum_qty"),
    )


ORACLE_A7 = """
SELECT l_returnflag, l_linestatus, count(*) AS n_lines,
       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
"""


def q_w4_lag_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user event-over-event delta: lag/lead frames over the stream
    table (ordering key event_id is unique → deterministic across
    engines; IEEE double subtraction is bit-identical)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("event_id")
    return ev.select(
        "event_id",
        "user_id",
        "value",
        F.lag("value").over(w).alias("prev_value"),
        (F.col("value") - F.lag("value").over(w)).alias("delta"),
        F.lead("event_type").over(w).alias("next_type"),
    )


ORACLE_W4 = """
SELECT event_id, user_id, value,
       lag(value) OVER w AS prev_value,
       value - lag(value) OVER w AS delta,
       lead(event_type) OVER w AS next_type
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY event_id)
"""


def q_j4_semi_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi + left-anti joins (the QA diff's anti-join semantics,
    SURVEY §2.6, as first-class operators): customers partitioned into
    has-order / no-order, one flag column, single shuffle per branch."""
    customer = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    ok = load_table(spark, sf_dir, "orders").select("o_custkey")
    with_orders = customer.join(
        ok, customer.c_custkey == ok.o_custkey, "left_semi"
    ).withColumn("has_order", F.lit(True))
    without = customer.join(
        ok, customer.c_custkey == ok.o_custkey, "left_anti"
    ).withColumn("has_order", F.lit(False))
    return with_orders.unionByName(without)


ORACLE_J4 = """
SELECT c_custkey, c_name, TRUE AS has_order
FROM customer WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
UNION ALL
SELECT c_custkey, c_name, FALSE AS has_order
FROM customer WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
"""


QUERIES.update(
    {
        "q5_region_revenue": q_q5_region_revenue,
        "q6_selective_sum": q_q6_selective_sum,
        "a7_cube": q_a7_cube,
        "w4_lag_delta": q_w4_lag_delta,
        "j4_semi_anti": q_j4_semi_anti,
    }
)
ORACLES.update(
    {
        "q5_region_revenue": ORACLE_Q5,
        "q6_selective_sum": ORACLE_Q6,
        "a7_cube": ORACLE_A7,
        "w4_lag_delta": ORACLE_W4,
        "j4_semi_anti": ORACLE_J4,
    }
)


def q_events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization with session_window (30-min gap) — the same
    operator the streaming profile builder uses (SURVEY §2.10), here as a
    batch agg with an exact gaps-and-islands oracle.  One shuffle on
    user_id; merge happens inside the aggregation, not a window-function
    sort."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id", F.session_window("ts", "30 minutes"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            "n_events",
        )
    )


# Spark sessions are half-open [first, last+gap): an event exactly `gap`
# after the previous one starts a NEW session → island break on diff >= gap
ORACLE_SESSIONIZE = """
WITH e AS (
  SELECT user_id, ts,
         CASE WHEN ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
                OR lag(ts) OVER w IS NULL
              THEN 1 ELSE 0 END AS brk
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
), g AS (
  SELECT user_id, ts,
         sum(brk) OVER (PARTITION BY user_id ORDER BY ts
                        ROWS UNBOUNDED PRECEDING) AS sid
  FROM e
)
SELECT user_id, min(ts) AS session_start, count(*) AS n_events
FROM g GROUP BY user_id, sid
"""

QUERIES["events_sessionize"] = q_events_sessionize
ORACLES["events_sessionize"] = ORACLE_SESSIONIZE


def q_q12_priority_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: fact-fact join + conditional aggregation — the
    two-branch CASE counts fold into one pass (no per-branch scans), and
    the cross-table predicate (shipped after ordered) filters post-join."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linestatus", "l_shipdate"
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(F.col("l_shipdate") > F.col("o_orderdate"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
    )


ORACLE_Q12 = """
SELECT l_linestatus,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate > o_orderdate
GROUP BY l_linestatus
"""


def q_dedup_levenshtein(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance near-dup pairs, blocked: candidate pairs only form
    inside a (lang, length-bucket) block — the standard O(n²)→blocked
    reduction — and the distance runs on a 120-char normalized prefix so
    per-pair cost is bounded.  JVM levenshtein expression; no UDF."""
    docs = load_table(spark, sf_dir, "documents")
    norm = F.lower(F.trim(F.col("text")))
    base = docs.select(
        F.col("doc_id"),
        F.col("lang"),
        F.floor(F.col("n_chars") / 20).alias("len_bucket"),
        F.substring(norm, 1, 120).alias("pfx"),
    )
    a = base.select(
        F.col("lang"), F.col("len_bucket"),
        F.col("doc_id").alias("id_a"), F.col("pfx").alias("pfx_a"),
    )
    b = base.select(
        F.col("lang"), F.col("len_bucket"),
        F.col("doc_id").alias("id_b"), F.col("pfx").alias("pfx_b"),
    )
    return (
        a.join(b, ["lang", "len_bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.levenshtein("pfx_a", "pfx_b").alias("edit_dist"),
        )
        .filter(F.col("edit_dist") <= 10)
    )


ORACLE_LEVENSHTEIN = """
WITH base AS (
  SELECT doc_id, lang, CAST(floor(n_chars / 20.0) AS BIGINT) AS len_bucket,
         substr(lower(trim(text)), 1, 120) AS pfx
  FROM documents
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(levenshtein(a.pfx, b.pfx) AS INTEGER) AS edit_dist
FROM base a JOIN base b
  ON a.lang = b.lang AND a.len_bucket = b.len_bucket AND a.doc_id < b.doc_id
WHERE levenshtein(a.pfx, b.pfx) <= 10
"""

QUERIES.update(
    {
        "q12_priority_lines": q_q12_priority_lines,
        "dedup_levenshtein": q_dedup_levenshtein,
    }
)
ORACLES.update(
    {
        "q12_priority_lines": ORACLE_Q12,
        "dedup_levenshtein": ORACLE_LEVENSHTEIN,
    }
)


def q_f_array_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array-function surface over token arrays (F12's restructuring
    toolbox as first-class expressions): size, distinct size, slice+join,
    negative indexing, sorted-head — all JVM-side, no explode."""
    docs = load_table(spark, sf_dir, "documents")
    toks = TXT.tokens(F.lower(F.col("text")))
    return docs.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_unique"),
        F.array_join(F.slice(toks, 1, 3), " ").alias("first3"),
        F.element_at(toks, -1).alias("last_tok"),
        F.element_at(F.array_sort(toks), 1).alias("min_tok"),
        F.array_contains(toks, "the").alias("has_the"),
    )


ORACLE_F_ARRAY = r"""
WITH t AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
                     x -> x <> '') AS toks
  FROM documents
)
SELECT doc_id,
       len(toks) AS n_tokens,
       len(list_distinct(toks)) AS n_unique,
       array_to_string(toks[1:3], ' ') AS first3,
       toks[-1] AS last_tok,
       list_sort(toks)[1] AS min_tok,
       list_contains(toks, 'the') AS has_the
FROM t
"""

QUERIES["f_array_suite"] = q_f_array_suite
ORACLES["f_array_suite"] = ORACLE_F_ARRAY


def q_emb_norm_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vector L2 norm + dimensionality over the embedding column —
    the sanity scan a similarity pipeline runs before indexing (catches
    zero/denormalized vectors).  F.aggregate accumulates index-order in
    doubles; rounded to 6 for cross-engine ulp safety."""
    from .functions import vectors as V

    emb = load_table(spark, sf_dir, "embeddings")
    return emb.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.round(V.norm("embedding"), 6).alias("l2_norm"),
    )


ORACLE_EMB_NORMS = """
SELECT vec_id,
       CAST(len(embedding) AS INTEGER) AS dim,
       round(sqrt(list_sum(list_transform(range(1, len(embedding) + 1),
             i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)))), 6)
         AS l2_norm
FROM embeddings
"""

QUERIES["emb_norm_stats"] = q_emb_norm_stats
ORACLES["emb_norm_stats"] = ORACLE_EMB_NORMS


# ---------------------------------------------------------------------------
# §2.9 X4 — cardinality-aware patch resolution
# ---------------------------------------------------------------------------

_X4CM_MANY = ["click", "view", "error"]  # stand-in card-many attributes


def q_x4_card_many(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4 cardinality-aware (pseudoace.py:105-110 + the models schema's
    UNIQUE flag): card-one attributes upsert LWW per (e,a); card-many
    attributes resolve per (e,a,v) — asserts accumulate, and only a
    retraction of the same value removes it.  ``v = event_id % 50`` forces
    value collisions so retractions actually meet asserts; ``op`` is a
    function of v so tx-ties resolve deterministically."""
    ev = load_table(spark, sf_dir, "events").select(
        F.col("user_id").alias("e"),
        F.col("event_type").alias("a"),
        (F.col("event_id") % 50).cast("string").alias("v"),
        F.col("ts").alias("tx"),
        ((F.col("event_id") % 50) % 7 != 0).alias("op"),
        (F.col("event_id") % 2).alias("__par"),
    )
    base = ev.filter(F.col("__par") == 0).drop("__par")
    patches = ev.filter(F.col("__par") == 1).drop("__par")
    return eav.apply_patches(
        base, patches, tiebreak_col="v", card_many_attrs=_X4CM_MANY
    )


ORACLE_X4_CARD_MANY = """
WITH datoms AS (
  SELECT user_id AS e, event_type AS a, CAST(event_id % 50 AS VARCHAR) AS v,
         ts AS tx, ((event_id % 50) % 7 <> 0) AS op, event_id % 2 AS src
  FROM events
), ranked AS (
  SELECT e, a, v, tx, op,
         row_number() OVER (
           PARTITION BY e, a,
             CASE WHEN a IN ('click','view','error') THEN v END
           ORDER BY tx DESC, src DESC, v DESC) AS rn
  FROM datoms
)
SELECT e, a, v, tx, op FROM ranked WHERE rn = 1 AND op
"""

QUERIES["x4_card_many"] = q_x4_card_many
ORACLES["x4_card_many"] = ORACLE_X4_CARD_MANY


# ---------------------------------------------------------------------------
# §2.12 — near-dup clustering + survivorship (connected components)
# ---------------------------------------------------------------------------

# the ngram-Jaccard pair graph (same params as dedup_ngram_jaccard) as a
# WITH-clause body reusable by both clustering oracles
_ORACLE_NGRAM_PAIRS_CTES = r"""
toks AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(trim(text)), '\s+'), x -> x <> '') AS toks
  FROM documents
), sh AS (
  -- mirrors functions/text.shingles(): docs with < k tokens contribute
  -- ONE whole-text shingle instead of vanishing from the pair space
  SELECT doc_id,
         unnest(CASE WHEN len(toks) < 3
                THEN [array_to_string(toks, ' ')]
                ELSE list_distinct(list_transform(range(1, len(toks) - 3 + 2),
                     i -> array_to_string(list_slice(toks, i, i + 2), ' ')))
                END) AS shingle
  FROM toks
), sizes AS (
  SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id
), inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_inter
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
), pairs AS (
  SELECT id_a, id_b FROM inter
  JOIN sizes sa ON sa.doc_id = id_a
  JOIN sizes sb ON sb.doc_id = id_b
  WHERE CAST(n_inter AS DOUBLE) / (sa.n_sh + sb.n_sh - n_inter) >= 0.2
), sym AS (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION ALL SELECT id_b, id_a FROM pairs
), reach(a, b) AS (
  SELECT src, dst FROM sym
  UNION
  SELECT r.a, s.dst FROM reach r JOIN sym s ON r.b = s.src
), comps AS (
  SELECT a AS id, least(a, min(b)) AS comp FROM reach GROUP BY a
)
"""


def q_dedup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup family clustering: ngram-Jaccard pair graph → connected
    components by iterative min-label propagation (operators/dedup.py
    connected_components).  The DuckDB oracle computes the same fixpoint
    as a recursive-CTE transitive closure + min — an iterative Spark
    algorithm under the exact-correctness gate."""
    docs = load_table(spark, sf_dir, "documents")
    edges = dedup.ngram_jaccard_pairs(docs, k=3, threshold=0.2)
    return dedup.connected_components(edges.select("id_a", "id_b"))


ORACLE_DEDUP_COMPONENTS = (
    "WITH RECURSIVE " + _ORACLE_NGRAM_PAIRS_CTES + "SELECT id, comp FROM comps"
)


def q_dedup_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus survivorship: every document labeled with its near-dup
    family and canonical-keeper flag (smallest id per family; isolated
    docs keep themselves).  ``WHERE is_canonical`` IS the dedup."""
    docs = load_table(spark, sf_dir, "documents")
    edges = dedup.ngram_jaccard_pairs(docs, k=3, threshold=0.2)
    return dedup.dedup_survivors(docs, edges.select("id_a", "id_b"))


ORACLE_DEDUP_SURVIVORS = (
    "WITH RECURSIVE "
    + _ORACLE_NGRAM_PAIRS_CTES
    + """
SELECT d.doc_id,
       coalesce(c.comp, d.doc_id) AS component,
       coalesce(c.comp, d.doc_id) = d.doc_id AS is_canonical
FROM documents d LEFT JOIN comps c ON c.id = d.doc_id
"""
)

QUERIES.update(
    {
        "dedup_components": q_dedup_components,
        "dedup_survivors": q_dedup_survivors,
    }
)
ORACLES.update(
    {
        "dedup_components": ORACLE_DEDUP_COMPONENTS,
        "dedup_survivors": ORACLE_DEDUP_SURVIVORS,
    }
)


# ---------------------------------------------------------------------------
# §2.12 — training-data hygiene: PII redaction, repetition quality gate,
# benchmark-contamination screen, per-language budget sampling
# ---------------------------------------------------------------------------


def q_text_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing pass: deterministic synthetic PII (email / phone /
    IPv4 derived from doc_id) is planted into each document, then redacted
    to typed tags with RE2-compatible patterns (functions/text.py) — the
    oracle replants and re-redacts the same text in DuckDB, so pattern
    semantics must agree engine-to-engine.  Counts audit what was found."""
    docs = load_table(spark, sf_dir, "documents")
    planted = F.concat(
        F.col("text"),
        F.format_string(
            " contact user%d@example.com or +1-555-%04d from 10.0.%d.%d",
            F.col("doc_id"),
            F.col("doc_id") % 10000,
            F.col("doc_id") % 256,
            (F.col("doc_id") * 7) % 256,
        ),
    )
    return docs.select(
        "doc_id",
        TXT.redact_pii(planted).alias("redacted"),
        F.regexp_count(planted, F.lit(TXT.PII_EMAIL)).alias("n_emails"),
        F.regexp_count(planted, F.lit(TXT.PII_IPV4)).alias("n_ips"),
        F.regexp_count(planted, F.lit(TXT.PII_PHONE)).alias("n_phones"),
    )


ORACLE_PII = r"""
WITH planted AS (
  SELECT doc_id,
         text || ' contact user' || doc_id || '@example.com or +1-555-' ||
         lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || ' from 10.0.' ||
         CAST(doc_id % 256 AS VARCHAR) || '.' ||
         CAST((doc_id * 7) % 256 AS VARCHAR) AS t
  FROM documents
)
SELECT doc_id,
       regexp_replace(
         regexp_replace(
           regexp_replace(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
                          '<EMAIL>', 'g'),
           '\b\d{1,3}(\.\d{1,3}){3}\b', '<IP>', 'g'),
         '\+\d{1,2}-\d{3}-\d{4}', '<PHONE>', 'g') AS redacted,
       CAST(len(regexp_extract_all(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS INTEGER) AS n_emails,
       CAST(len(regexp_extract_all(t, '\b\d{1,3}(\.\d{1,3}){3}\b')) AS INTEGER) AS n_ips,
       CAST(len(regexp_extract_all(t, '\+\d{1,2}-\d{3}-\d{4}')) AS INTEGER) AS n_phones
FROM planted
"""


def q_text_repetition_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition quality gate: top-token frequency ratio
    (explode → codegen'd two-level aggregate) and duplicate-2-gram ratio
    (pure array expressions, no explode) per document, plus the pass
    flag.  The shuffle carries one (doc, token) count row per distinct
    token — never the text."""
    docs = load_table(spark, sf_dir, "documents")
    toks = TXT.tokens(F.lower(F.col("text")))
    ex = docs.select("doc_id", F.explode(toks).alias("tok"))
    per_tok = ex.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("c"))
    top = per_tok.groupBy("doc_id").agg(
        F.max("c").alias("top_cnt"), F.sum("c").alias("n_tok")
    )
    grams = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(toks) - 2, F.lit(0))),
        lambda i: F.array_join(F.slice(toks, i + 1, 2), " "),
    )
    arr = docs.select(
        "doc_id",
        F.size(grams).alias("n2"),
        F.size(F.array_distinct(grams)).alias("n2_distinct"),
    )
    top_ratio = F.col("top_cnt") / F.col("n_tok")
    dup_ratio = (F.col("n2") - F.col("n2_distinct")) / F.col("n2")
    return (
        top.join(arr, "doc_id")
        .select(
            "doc_id",
            F.round(top_ratio, 6).alias("top_tok_ratio"),
            F.round(dup_ratio, 6).alias("dup_2gram_ratio"),
            ((top_ratio <= 0.1) & (dup_ratio <= 0.55)).alias("passes"),
        )
    )


ORACLE_REPETITION = r"""
WITH toks AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(trim(text)), '\s+'), x -> x <> '') AS toks
  FROM documents
), per_tok AS (
  SELECT doc_id, unnest(toks) AS tok FROM toks
), counts AS (
  SELECT doc_id, tok, count(*) AS c FROM per_tok GROUP BY 1, 2
), top AS (
  SELECT doc_id, max(c) AS top_cnt, CAST(sum(c) AS BIGINT) AS n_tok
  FROM counts GROUP BY doc_id
), grams AS (
  SELECT doc_id,
         list_transform(range(1, greatest(len(toks) - 1, 1) + 1),
                        i -> array_to_string(list_slice(toks, i, i + 1), ' ')) AS g
  FROM toks
), arr AS (
  SELECT doc_id, len(g) AS n2, len(list_distinct(g)) AS n2_distinct FROM grams
)
SELECT t.doc_id,
       round(CAST(top_cnt AS DOUBLE) / n_tok, 6) AS top_tok_ratio,
       round(CAST(n2 - n2_distinct AS DOUBLE) / n2, 6) AS dup_2gram_ratio,
       (CAST(top_cnt AS DOUBLE) / n_tok <= 0.1
        AND CAST(n2 - n2_distinct AS DOUBLE) / n2 <= 0.55) AS passes
FROM top t JOIN arr USING (doc_id)
"""


def q_text_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-contamination screen: corpus documents sharing any word
    5-gram with the benchmark set (doc_id < 20 stands in for the eval
    suite).  Join key is the hashed shingle (8-byte longs shuffle, never
    strings); the oracle joins the same shingles as strings — identical
    result barring 64-bit collisions."""
    docs = load_table(spark, sf_dir, "documents")
    sh = docs.select(
        "doc_id",
        F.explode(
            F.transform(
                TXT.shingles("text", 5), lambda s: F.xxhash64(s)
            )
        ).alias("g"),
    )
    bench = sh.filter(F.col("doc_id") < 20).select("g").distinct()
    return (
        sh.filter(F.col("doc_id") >= 20)
        .join(bench, "g")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_shared_5grams"))
    )


ORACLE_CONTAMINATION = r"""
WITH toks AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(trim(text)), '\s+'), x -> x <> '') AS toks
  FROM documents
), sh AS (
  -- mirrors shingles(k=5): short docs contribute one whole-text gram
  SELECT doc_id,
         unnest(CASE WHEN len(toks) < 5
                THEN [array_to_string(toks, ' ')]
                ELSE list_distinct(list_transform(range(1, len(toks) - 5 + 2),
                     i -> array_to_string(list_slice(toks, i, i + 4), ' ')))
                END) AS g
  FROM toks
), bench AS (
  SELECT DISTINCT g FROM sh WHERE doc_id < 20
)
SELECT s.doc_id, count(*) AS n_shared_5grams
FROM sh s JOIN bench b ON s.g = b.g
WHERE s.doc_id >= 20
GROUP BY s.doc_id
"""

_LANG_BUDGET = {"en": 100, "es": 40, "de": 40, "fr": 40, "zh": 40}


def q_sample_lang_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language token-budget sampling: deterministic priority sample —
    rank documents inside each language by md5(doc_id) (an engine-portable
    keyed priority; never an RNG tied to cluster layout) and keep each
    language's budget.  The down-sampling knob of a multilingual data
    mix."""
    docs = load_table(spark, sf_dir, "documents")
    budget = F.create_map(
        *[F.lit(x) for kv in _LANG_BUDGET.items() for x in kv]
    )
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    return (
        docs.select("doc_id", "lang")
        .withColumn("priority_rank", F.row_number().over(w))
        .filter(F.col("priority_rank") <= budget[F.col("lang")])
    )


ORACLE_LANG_BUDGET = """
SELECT doc_id, lang, priority_rank FROM (
  SELECT doc_id, lang,
         CAST(row_number() OVER (
           PARTITION BY lang ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
         ) AS INTEGER) AS priority_rank
  FROM documents
)
WHERE priority_rank <= CASE lang WHEN 'en' THEN 100 WHEN 'es' THEN 40
                       WHEN 'de' THEN 40 WHEN 'fr' THEN 40
                       WHEN 'zh' THEN 40 ELSE 0 END
"""

QUERIES.update(
    {
        "text_pii_redact": q_text_pii_redact,
        "text_repetition_gate": q_text_repetition_gate,
        "text_contamination": q_text_contamination,
        "sample_lang_budget": q_sample_lang_budget,
    }
)
ORACLES.update(
    {
        "text_pii_redact": ORACLE_PII,
        "text_repetition_gate": ORACLE_REPETITION,
        "text_contamination": ORACLE_CONTAMINATION,
        "sample_lang_budget": ORACLE_LANG_BUDGET,
    }
)


# real-boundary end-to-end queries (.ace dump / models / id catalog / EDN)
from .queries_e2e import register as _register_e2e  # noqa: E402

_register_e2e(QUERIES, ORACLES)

# corpus-preparation pipeline queries (LM scoring, scrubbing, packing,
# splits, URL dedup)
from .queries_corpus import register as _register_corpus  # noqa: E402

_register_corpus(QUERIES, ORACLES)

# hard relational patterns (EXISTS/NOT EXISTS, correlated scalar
# subqueries, HAVING join-back, argmax, disjunctive ranges)
from .queries_tpch_ext import register as _register_tpch_ext  # noqa: E402

_register_tpch_ext(QUERIES, ORACLES)

# the five remaining TPC-H shapes (Q2/Q9/Q11/Q16/Q20) over a
# lineitem-derived supply relation (no partsupp in TESTDATA.md)
from .queries_tpch_close import register as _register_tpch_close  # noqa: E402

_register_tpch_close(QUERIES, ORACLES)

# scale showcases (DPP, runtime bloom), exact distributed stats, CMS
# heavy hitters, deterministic sampling, cohort/gap-fill time series,
# Gopher gates, containment dedup, BPE encode, UNPIVOT
from .queries_analytics import register as _register_analytics  # noqa: E402

_register_analytics(QUERIES, ORACLES)

# recursive CTE front door, market-basket rules, RFM, A/B exact stats,
# OHLC bars, k-core peeling, ordered-aggregate suite
from .queries_advanced import register as _register_advanced  # noqa: E402

_register_advanced(QUERIES, ORACLES)

# classical statistics in exact arithmetic (Spearman, OLS, Mann-Whitney),
# per-node clustering coefficient, Jaccard link prediction, dyadic EWMA,
# rolling hourly correlation
from .queries_stats import register as _register_stats  # noqa: E402

_register_stats(QUERIES, ORACLES)

# GROUP BY ALL front door, binaryFile multimodal ingestion source,
# WIMBD-style bigram census, gazetteer entity tagging
from .queries_engine import register as _register_engine  # noqa: E402

_register_engine(QUERIES, ORACLES)

# portable mergeable HLL register rollups (md5-deterministic, register
# digests hash-gated exactly cross-engine; union/intersection algebra)
from .queries_sketches import register as _register_sketches  # noqa: E402

_register_sketches(QUERIES, ORACLES)


# ---------------------------------------------------------------------------
# §2.12 — int8 embedding quantization (storage/serving path)
# ---------------------------------------------------------------------------


def q_emb_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 quantization over ``embeddings``
    (functions/vectors.py quantize_int8): per-vector scale, int8 codes,
    and max reconstruction error — one scan, pure expressions.  The
    round-half-up is spelled ``floor(x+0.5)`` in both engines so codes
    are bit-identical (see the function docstring)."""
    from .functions import vectors as V

    emb = load_table(spark, sf_dir, "embeddings")
    return (
        emb.withColumn("q", V.quantize_int8(F.col("embedding")))
        .select(
            "vec_id",
            F.col("q.scale").alias("scale"),
            F.col("q.qvec").alias("qvec"),
            F.when(
                F.col("q.scale") > 0,
                V.dequant_err(
                    F.col("q.qvec"), F.col("q.scale"), F.col("embedding")
                ),
            )
            .otherwise(F.lit(0.0))
            .alias("max_abs_err"),
        )
    )


ORACLE_EMB_QUANTIZE = """
WITH b AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
), s AS (
  SELECT vec_id, v,
         list_max(list_transform(v, x -> abs(x))) / 127.0 AS scale
  FROM b
)
SELECT vec_id, scale,
       CASE WHEN scale > 0
            THEN list_transform(v, x -> CAST(floor(x / scale + 0.5) AS TINYINT))
            ELSE list_transform(v, x -> CAST(0 AS TINYINT)) END AS qvec,
       CASE WHEN scale > 0
            THEN list_max(list_transform(range(1, len(v) + 1),
                   i -> abs(CAST(floor(v[i] / scale + 0.5) AS INT) * scale - v[i])))
            ELSE 0.0 END AS max_abs_err
FROM s
"""

QUERIES["emb_quantize"] = q_emb_quantize
ORACLES["emb_quantize"] = ORACLE_EMB_QUANTIZE


def q_emb_random_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JL random projection 64→8 over ``embeddings``
    (operators/similarity.py random_projection): seeded md5-derived
    weight matrix (driver-side literals, constant-folded), index-order
    folds — bit-identical to the oracle recomputing the matrix in SQL."""
    emb = load_table(spark, sf_dir, "embeddings")
    return similarity.random_projection(
        emb, "embedding", seed="jl", dim=64, k=8
    ).select("vec_id", "proj")


ORACLE_EMB_RANDOM_PROJECTION = """
SELECT vec_id,
       list_transform(range(0, 8), r ->
         list_sum(list_transform(range(1, 65), j ->
           CAST(embedding[j] AS DOUBLE)
           * (CAST(('0x' || substr(md5('jl:' || r || ':' || j), 1, 8)) AS BIGINT)
              / 2147483648.0 - 1.0)))) AS proj
FROM embeddings
"""

QUERIES["emb_random_projection"] = q_emb_random_projection
ORACLES["emb_random_projection"] = ORACLE_EMB_RANDOM_PROJECTION


def q_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morton/Z-order clustering key over lineitem
    (operators/relational.py zorder_key): interleaves ship-day and part
    buckets so range-partitioned, sorted-within-partition writes give
    parquet row groups that prune on EITHER dimension.  The declared
    query computes the key (pure integer expressions, exact oracle); the
    layout write itself is `repartitionByRange("zval").sortWithinPartitions("zval")`
    at the sink (see DEPLOY.md)."""
    li = load_table(spark, sf_dir, "lineitem")
    a = F.datediff(F.col("l_shipdate"), F.lit("1995-01-01").cast("date")).cast("long")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        relational.zorder_key(a, F.col("l_partkey"), bits=16).alias("zval"),
    )


ORACLE_ZORDER = """
WITH base AS (
  SELECT l_orderkey, l_linenumber,
         CAST(date_diff('day', TIMESTAMP '1995-01-01', l_shipdate) AS BIGINT) & 65535 AS za,
         l_partkey & 65535 AS zb
  FROM lineitem
)
SELECT l_orderkey, l_linenumber,
       CAST((((za >> 0) & 1) << 0) + (((zb >> 0) & 1) << 1) + (((za >> 1) & 1) << 2) + (((zb >> 1) & 1) << 3) + (((za >> 2) & 1) << 4) + (((zb >> 2) & 1) << 5) + (((za >> 3) & 1) << 6) + (((zb >> 3) & 1) << 7) + (((za >> 4) & 1) << 8) + (((zb >> 4) & 1) << 9) + (((za >> 5) & 1) << 10) + (((zb >> 5) & 1) << 11) + (((za >> 6) & 1) << 12) + (((zb >> 6) & 1) << 13) + (((za >> 7) & 1) << 14) + (((zb >> 7) & 1) << 15) + (((za >> 8) & 1) << 16) + (((zb >> 8) & 1) << 17) + (((za >> 9) & 1) << 18) + (((zb >> 9) & 1) << 19) + (((za >> 10) & 1) << 20) + (((zb >> 10) & 1) << 21) + (((za >> 11) & 1) << 22) + (((zb >> 11) & 1) << 23) + (((za >> 12) & 1) << 24) + (((zb >> 12) & 1) << 25) + (((za >> 13) & 1) << 26) + (((zb >> 13) & 1) << 27) + (((za >> 14) & 1) << 28) + (((zb >> 14) & 1) << 29) + (((za >> 15) & 1) << 30) + (((zb >> 15) & 1) << 31) AS BIGINT) AS zval
FROM base
"""

QUERIES["zorder_layout"] = q_zorder_layout
ORACLES["zorder_layout"] = ORACLE_ZORDER


def q_jsonl_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSONL corpus interchange (sources/jsonl.py): write ``documents``
    as gzipped JSONL shards, read back with an explicit schema, and
    profile the round-tripped corpus per (lang, source) — doc count,
    char sum, and distinct text fingerprints, so any encoding loss in
    the writer/reader (unicode escapes, line splitting) breaks the
    oracle match against the original parquet."""
    from .queries_e2e import _fx
    from .sources import jsonl as J

    docs = load_table(spark, sf_dir, "documents")
    path = _fx(sf_dir, "jsonl_docs")
    J.write_jsonl(docs, path, shards=8)
    back, _bad = J.quarantine_split(spark, path, J.DOCUMENTS_SCHEMA)
    return back.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("sum_chars"),
        F.countDistinct(F.md5(F.col("text"))).cast("long").alias("n_fingerprints"),
    )


ORACLE_JSONL = """
SELECT lang, source,
       count(*) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS sum_chars,
       CAST(count(DISTINCT md5(text)) AS BIGINT) AS n_fingerprints
FROM documents
GROUP BY lang, source
"""

QUERIES["jsonl_roundtrip"] = q_jsonl_roundtrip
ORACLES["jsonl_roundtrip"] = ORACLE_JSONL


# structured-streaming executions under the exact oracle gate
from .queries_streaming import register as _register_streaming  # noqa: E402

_register_streaming(QUERIES, ORACLES)

# lakehouse layer: zone-map skipping, exactly-once streaming sink,
# OPTIMIZE ZORDER — the txlog table format's scale features
from .queries_lakehouse import register as _register_lakehouse  # noqa: E402

_register_lakehouse(QUERIES, ORACLES)

# geospatial grid analytics (exact-integer geometry)
from .queries_geo import register as _register_geo  # noqa: E402

_register_geo(QUERIES, ORACLES)

# ranked retrieval / hybrid search (BM25, postings, RRF, Dirichlet LM)
from .queries_search import register as _register_search  # noqa: E402

_register_search(QUERIES, ORACLES)

# web-text extraction + Python UDTF surface
from .queries_textweb import register as _register_textweb  # noqa: E402

_register_textweb(QUERIES, ORACLES)

# round-4 engine surface: merge_asof variants, HOF arrays, SQL PIVOT
from .queries_round4 import register as _register_round4  # noqa: E402

_register_round4(QUERIES, ORACLES)

# data governance: k-anonymity suppression audit, l-diversity histogram
from .queries_governance import register as _register_governance  # noqa: E402

_register_governance(QUERIES, ORACLES)

# persisted LSH band index: incremental near-dup dedup at serving shape
from .queries_dedupstore import register as _register_dedupstore  # noqa: E402

_register_dedupstore(QUERIES, ORACLES)

# persisted graph-ANN store + incrementally-maintained adjacency MV
from .queries_annstore import register as _register_annstore  # noqa: E402

_register_annstore(QUERIES, ORACLES)


def q_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC source/sink (Spark-native columnar alternative to Parquet —
    relevant when an ingest upstream emits ORC): write ``orders`` as
    zlib ORC, read it back, aggregate per status.  Predicate pushdown and
    column pruning work the same as Parquet (ORC readers expose min/max
    stripe stats to Catalyst)."""
    from .queries_e2e import _fx

    orders = load_table(spark, sf_dir, "orders")
    path = _fx(sf_dir, "orders_orc")
    orders.write.mode("overwrite").option("compression", "zlib").orc(path)
    back = spark.read.orc(path)
    return (
        back.filter(F.col("o_orderdate") >= F.lit("1997-01-01"))
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_price"),
        )
    )


ORACLE_ORC = """
SELECT o_orderstatus, count(*) AS n_orders,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-01-01'
GROUP BY o_orderstatus
"""

QUERIES["orc_roundtrip"] = q_orc_roundtrip
ORACLES["orc_roundtrip"] = ORACLE_ORC


def q_bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed co-located fact-fact join — the 100 TB big-join story:
    ``orders`` and ``lineitem`` written bucketed (8 buckets) AND
    bucket-sorted on the join key, then joined WITHOUT a shuffle on
    either side (the plan guard asserts no Exchange above the scans).  At
    cluster scale this is how the recurring orderkey join escapes its
    shuffle entirely: pay the bucketing once at ingest, every subsequent
    join is map-side.  Spark-native bucketing (saveAsTable) — no Hive
    needed; table names carry the sf tag so per-sf runs don't collide."""
    import re as _re

    tag = _re.sub(r"[^A-Za-z0-9]", "_", sf_dir.rstrip("/").split("/")[-1])
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus"
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    for name, df, key in (
        (f"orders_bkt_{tag}", orders, "o_orderkey"),
        (f"lineitem_bkt_{tag}", li, "l_orderkey"),
    ):
        # the warehouse DIRECTORY outlives the in-memory catalog: a fresh
        # session sees no table but an existing location and refuses the
        # save (LOCATION_ALREADY_EXISTS) — drop both sides first
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        wh = spark.conf.get("spark.sql.warehouse.dir", "")
        if wh.startswith("file:"):
            wh = wh[len("file:") :]
        if wh:
            shutil.rmtree(os.path.join(wh, name), ignore_errors=True)
        (
            df.write.mode("overwrite")
            .bucketBy(8, key)
            .sortBy(key)
            .saveAsTable(name)
        )
    ob = spark.table(f"orders_bkt_{tag}")
    lb = spark.table(f"lineitem_bkt_{tag}")
    return (
        lb.join(ob, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                    "decimal(18,4)"
                )
            )
            .cast("double")
            .alias("revenue"),
        )
    )


ORACLE_BUCKETED = """
SELECT o_orderstatus, count(*) AS n_lines,
       CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderstatus
"""

QUERIES["bucketed_join"] = q_bucketed_join
ORACLES["bucketed_join"] = ORACLE_BUCKETED


def q_sql_frontend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SQL front door: every table registered as a view and the query
    submitted as one ANSI SQL string (CTE + window + join) through
    ``spark.sql`` — a user of the reference's SQL layer can paste their
    query unchanged; Catalyst compiles it to the same plan the DataFrame
    API gets.  The oracle is the IDENTICAL string run on DuckDB."""
    for t in ("orders", "customer", "nation"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(SQL_FRONTEND)


SQL_FRONTEND = """
WITH cust_orders AS (
  SELECT c_custkey, n_name,
         count(*) AS n_orders,
         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS spend
  FROM orders
  JOIN customer ON o_custkey = c_custkey
  JOIN nation   ON c_nationkey = n_nationkey
  GROUP BY c_custkey, n_name
)
SELECT n_name, c_custkey, n_orders, spend,
       CAST(row_number() OVER (
              PARTITION BY n_name ORDER BY spend DESC, c_custkey
            ) AS BIGINT) AS rank_in_nation
FROM cust_orders
WHERE n_orders >= 3
"""

QUERIES["sql_frontend"] = q_sql_frontend
ORACLES["sql_frontend"] = SQL_FRONTEND


def q_f_try_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI error-safe function family: try_divide / try_cast /
    try_element_at return NULL where the strict forms would raise
    (division by zero, malformed casts, out-of-range subscripts) — the
    ingest-hardening surface.  The oracle spells each NULL contract as an
    explicit CASE, so the gate pins the exact semantics."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        "l_quantity",
        "l_returnflag",
        "l_tax",
    )
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.try_divide(
            F.col("l_quantity"), F.round(F.col("l_tax") * 10) % 3
        ).alias("safe_div"),
        F.col("l_returnflag").try_cast("int").alias("flag_as_int"),
        F.try_element_at(
            F.split(F.lit("a,b,c"), ","), F.col("l_linenumber").cast("int")
        ).alias("nth_token"),
    )


ORACLE_TRY = """
SELECT l_orderkey, l_linenumber,
       CASE WHEN round(l_tax * 10) % 3 = 0 THEN NULL
            ELSE l_quantity / (round(l_tax * 10) % 3) END AS safe_div,
       TRY_CAST(l_returnflag AS INTEGER) AS flag_as_int,
       CASE WHEN l_linenumber BETWEEN 1 AND 3
            THEN ['a','b','c'][l_linenumber] END AS nth_token
FROM lineitem
"""

QUERIES["f_try_suite"] = q_f_try_suite
ORACLES["f_try_suite"] = ORACLE_TRY


def q_partitioned_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive-style partitioned layout + partition-pruned scan — the coarse
    data-skipping tier at 100 TB (directory-level pruning BEFORE footer
    stats): documents written ``partitionBy(lang)``, read back filtered
    to two languages; the plan's PartitionFilters prune every other
    partition directory without opening a file (guard in
    test_plans_guard)."""
    from .queries_e2e import _fx

    docs = load_table(spark, sf_dir, "documents")
    path = _fx(sf_dir, "docs_by_lang")
    (
        docs.write.mode("overwrite")
        .partitionBy("lang")
        .parquet(path)
    )
    back = spark.read.parquet(path)
    return (
        back.filter(F.col("lang").isin("en", "de"))
        .groupBy("lang", "source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("sum_chars"),
        )
    )


ORACLE_PARTITIONED = """
SELECT lang, source, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS sum_chars
FROM documents
WHERE lang IN ('en', 'de')
GROUP BY lang, source
"""

QUERIES["partitioned_scan"] = q_partitioned_scan
ORACLES["partitioned_scan"] = ORACLE_PARTITIONED


def q_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema drift across shards — the long-lived-corpus reality: an old
    shard (no ``quality`` column) and a new shard (scored) land in one
    dataset; ``mergeSchema`` unifies them with NULL back-fill and the
    engine aggregates presence per language.  Shard membership is
    deterministic (doc_id parity) so the DuckDB oracle recomputes the
    same split from the live table."""
    from .queries_e2e import _fx

    docs = load_table(spark, sf_dir, "documents")
    root = _fx(sf_dir, "evolving_docs")
    old = docs.filter(F.col("doc_id") % 2 == 0).select(
        "doc_id", "lang", "n_chars"
    )
    new = docs.filter(F.col("doc_id") % 2 == 1).select(
        "doc_id",
        "lang",
        "n_chars",
        (F.col("n_chars") % 100 / 100.0).alias("quality"),
    )
    old.write.mode("overwrite").parquet(f"{root}/shard=old")
    new.write.mode("overwrite").parquet(f"{root}/shard=new")
    back = spark.read.option("mergeSchema", "true").parquet(root)
    return back.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.count("quality").alias("n_scored"),
        F.sum(F.col("quality").cast("decimal(10,6)"))
        .cast("double")
        .alias("quality_sum"),
    )


ORACLE_SCHEMA_EVOLUTION = """
SELECT lang, count(*) AS n_docs,
       CAST(sum(CASE WHEN doc_id % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_scored,
       CAST(sum(CASE WHEN doc_id % 2 = 1
                THEN CAST(n_chars % 100 / 100.0 AS DECIMAL(10,6)) END) AS DOUBLE)
         AS quality_sum
FROM documents
GROUP BY lang
"""

QUERIES["schema_evolution"] = q_schema_evolution
ORACLES["schema_evolution"] = ORACLE_SCHEMA_EVOLUTION


def q_crosstab_lang_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crosstab via the DataFrame pivot API with an EXPLICIT value list
    (src0-src3 + an absent control column): fixed values skip the extra
    distinct-scan Spark otherwise runs to discover pivot columns — the
    right call at 100 TB where the category set is known — and missing
    combinations surface as NULL counts (src_absent is all-NULL by
    construction, proving no silent drop).  Distinct from the EAV pivots
    (x7 family): this is the two-categorical-dims reporting crosstab."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.groupBy("lang")
        .pivot("source", ["src0", "src1", "src2", "src3", "src_absent"])
        .agg(F.count(F.lit(1)))
    )


ORACLE_CROSSTAB = """
SELECT lang,
       CAST(sum(CASE WHEN source = 'src0' THEN 1 END) AS BIGINT) AS src0,
       CAST(sum(CASE WHEN source = 'src1' THEN 1 END) AS BIGINT) AS src1,
       CAST(sum(CASE WHEN source = 'src2' THEN 1 END) AS BIGINT) AS src2,
       CAST(sum(CASE WHEN source = 'src3' THEN 1 END) AS BIGINT) AS src3,
       CAST(sum(CASE WHEN source = 'src_absent' THEN 1 END) AS BIGINT) AS src_absent
FROM documents
GROUP BY lang
"""

QUERIES["crosstab_lang_source"] = q_crosstab_lang_source
ORACLES["crosstab_lang_source"] = ORACLE_CROSSTAB


def q_nullsafe_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality join (``<=>`` / IS NOT DISTINCT FROM): NULL
    keys MATCH each other instead of vanishing — the semantics a
    dimension-join on an optional attribute needs (plain ``=`` silently
    drops every NULL-keyed row).  Key is NULLIF(mktsegment, 'BUILDING'),
    so one dim value is genuinely NULL; the oracle uses DuckDB's
    IS NOT DISTINCT FROM."""
    customer = load_table(spark, sf_dir, "customer").withColumn(
        "seg_key", F.nullif(F.col("c_mktsegment"), F.lit("BUILDING"))
    )
    dim = (
        customer.select("seg_key")
        .distinct()
        .withColumn(
            "seg_label",
            F.coalesce(F.concat(F.lit("seg:"), F.col("seg_key")), F.lit("seg:DEFAULT")),
        )
    )
    return (
        customer.join(
            F.broadcast(dim), customer["seg_key"].eqNullSafe(dim["seg_key"])
        )
        .groupBy("seg_label")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


ORACLE_NULLSAFE = """
WITH c AS (
  SELECT nullif(c_mktsegment, 'BUILDING') AS seg_key FROM customer
), dim AS (
  SELECT DISTINCT seg_key,
         coalesce('seg:' || seg_key, 'seg:DEFAULT') AS seg_label
  FROM c
)
SELECT seg_label, count(*) AS n_customers
FROM c JOIN dim ON c.seg_key IS NOT DISTINCT FROM dim.seg_key
GROUP BY seg_label
"""

QUERIES["nullsafe_join"] = q_nullsafe_join
ORACLES["nullsafe_join"] = ORACLE_NULLSAFE


def q_f_map_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order MAP expression family: map_from_arrays,
    transform_values, map_filter, map_concat, element_at and an
    aggregate over map_values — each result extracted to a scalar so the
    oracle pins the semantics with explicit ground-truth arithmetic
    (DuckDB's map internals differ; the CONTRACT is what must match)."""
    c = load_table(spark, sf_dir, "customer")
    m = F.map_from_arrays(
        F.array(F.lit("bal"), F.lit("key")),
        F.array(F.col("c_acctbal"), F.col("c_custkey").cast("double")),
    )
    doubled = F.transform_values(m, lambda k, v: v * 2)
    positive = F.map_filter(m, lambda k, v: v > 0)
    merged = F.map_concat(
        m, F.create_map(F.lit("nation"), F.col("c_nationkey").cast("double"))
    )
    return c.select(
        "c_custkey",
        F.element_at(doubled, "bal").alias("bal_doubled"),
        F.size(positive).cast("long").alias("n_positive"),
        F.size(merged).cast("long").alias("n_merged"),
        F.aggregate(
            F.map_values(m), F.lit(0.0), lambda acc, v: acc + v
        ).alias("values_sum"),
    )


ORACLE_MAP = """
SELECT c_custkey,
       c_acctbal * 2 AS bal_doubled,
       CAST((CASE WHEN c_acctbal > 0 THEN 1 ELSE 0 END)
          + (CASE WHEN c_custkey > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_positive,
       CAST(3 AS BIGINT) AS n_merged,
       c_acctbal + CAST(c_custkey AS DOUBLE) AS values_sum
FROM customer
"""

QUERIES["f_map_suite"] = q_f_map_suite
ORACLES["f_map_suite"] = ORACLE_MAP


def q_hist_doc_lengths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram of document length per language (bin width
    128 chars) — the dataset-profiling staple; one map stage + one
    aggregate, bins derived arithmetically so both engines bucket
    identically (no histogram UDAF needed)."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.withColumn(
            "bin", (F.col("n_chars") / 128).cast("long") * 128
        )
        .groupBy("lang", "bin")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


ORACLE_HIST = """
SELECT lang, CAST(n_chars // 128 * 128 AS BIGINT) AS bin, count(*) AS n_docs
FROM documents
GROUP BY 1, 2
"""

QUERIES["hist_doc_lengths"] = q_hist_doc_lengths
ORACLES["hist_doc_lengths"] = ORACLE_HIST


# ---------------------------------------------------------------------------
# §2.9 ext — Datomic as-of time travel over the datom log
# ---------------------------------------------------------------------------


def q_eav_as_of(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Datomic ``as-of`` view (eav.as_of): a datom log with asserts AND
    retracts derived from events (monotonic tx = event_id, value =
    event_id % 5 so (e,a,v) keys collide across time and the
    latest-fact-wins resolution is actually exercised), cut at tx ≤
    5000, profiled per attribute.  A datom is visible iff its latest
    fact at the cut is an assert — retract hides, re-assert restores.
    The history view needs no operator (the raw log IS Datomic's history
    database)."""
    from .operators.eav import as_of

    ev = load_table(spark, sf_dir, "events")
    datoms = ev.select(
        F.col("user_id").alias("e"),
        F.col("event_type").alias("a"),
        (F.col("event_id") % 5).cast("string").alias("v"),
        F.col("event_id").alias("tx"),
        (F.col("event_id") % 3 != 0).alias("op"),
    )
    visible = as_of(datoms, F.lit(5000), tx_col="tx")
    return visible.groupBy("a").agg(
        F.count(F.lit(1)).alias("n_visible"),
        F.countDistinct("e").alias("n_entities"),
        F.max("tx").alias("latest_tx"),
    )


ORACLE_EAV_AS_OF = """
WITH cut AS (
  SELECT user_id AS e, event_type AS a,
         CAST(event_id % 5 AS VARCHAR) AS v,
         event_id AS tx, (event_id % 3 <> 0) AS op
  FROM events WHERE event_id <= 5000
), latest AS (
  SELECT *, row_number() OVER (PARTITION BY e, a, v ORDER BY tx DESC) AS rn
  FROM cut
)
SELECT a, count(*) AS n_visible, count(DISTINCT e) AS n_entities,
       max(tx) AS latest_tx
FROM latest WHERE rn = 1 AND op
GROUP BY a
"""

QUERIES["eav_as_of"] = q_eav_as_of
ORACLES["eav_as_of"] = ORACLE_EAV_AS_OF


def q_eav_since(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Datomic ``since`` view (eav.since) — the complement of as-of:
    resolution over only the facts transacted AFTER the cut, so a datom
    untouched since the cut is invisible (Datomic's since-db subtlety).
    Same derived datom log as eav_as_of; same per-attribute profile, so
    the two rows directly exhibit the as-of/since split of one store."""
    from .operators.eav import since

    ev = load_table(spark, sf_dir, "events")
    datoms = ev.select(
        F.col("user_id").alias("e"),
        F.col("event_type").alias("a"),
        (F.col("event_id") % 5).cast("string").alias("v"),
        F.col("event_id").alias("tx"),
        (F.col("event_id") % 3 != 0).alias("op"),
    )
    visible = since(datoms, F.lit(500), tx_col="tx")
    return visible.groupBy("a").agg(
        F.count(F.lit(1)).alias("n_visible"),
        F.countDistinct("e").alias("n_entities"),
        F.min("tx").alias("earliest_tx"),
    )


ORACLE_EAV_SINCE = """
WITH tail AS (
  SELECT user_id AS e, event_type AS a,
         CAST(event_id % 5 AS VARCHAR) AS v,
         event_id AS tx, (event_id % 3 <> 0) AS op
  FROM events WHERE event_id > 500
), latest AS (
  SELECT *, row_number() OVER (PARTITION BY e, a, v ORDER BY tx DESC) AS rn
  FROM tail
)
SELECT a, count(*) AS n_visible, count(DISTINCT e) AS n_entities,
       min(tx) AS earliest_tx
FROM latest WHERE rn = 1 AND op
GROUP BY a
"""

QUERIES["eav_since"] = q_eav_since
ORACLES["eav_since"] = ORACLE_EAV_SINCE


def q_eav_upsert_identity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Datomic ``:db.unique/identity`` upsert (eav.resolve_tempids): a
    patch transaction whose entities are named by string tempids, each
    carrying a ``cust/id`` identity datom.  Tempids whose identity value
    exists in the db resolve to the existing entity id; the rest mint
    ``max(e)+1…`` densely in identity order through the distributed
    two-level prefix sum (corpus.dense_ids) — no 1-task row_number.
    Output: one row per patch identity with the resolved id and whether
    it upserted onto an existing entity."""
    from .operators.eav import resolve_tempids

    cust = load_table(spark, sf_dir, "customer")
    db = cust.select(
        F.col("c_custkey").alias("e"),
        F.lit("cust/id").alias("a"),
        F.col("c_name").alias("v"),
        F.lit(1).alias("tx"),
        F.lit(True).alias("op"),
    )
    hits = cust.filter(F.col("c_custkey") % 3 == 0).select(
        F.concat(F.lit("p-"), F.col("c_name")).alias("tempid"),
        F.lit("cust/id").alias("a"),
        F.col("c_name").alias("v"),
    )
    news = load_table(spark, sf_dir, "supplier").select(
        F.concat(F.lit("p-"), F.col("s_name")).alias("tempid"),
        F.lit("cust/id").alias("a"),
        F.col("s_name").alias("v"),
    )
    patches = hits.unionByName(news).select(
        "tempid", "a", "v", F.lit(2).alias("tx"), F.lit(True).alias("op")
    )
    resolved = resolve_tempids(db, patches, "cust/id")
    max_e = db.agg(F.max("e").alias("__m"))
    return (
        resolved.filter(F.col("a") == "cust/id")
        .join(F.broadcast(max_e))
        .select(
            F.col("v").alias("ident"),
            F.col("e").alias("resolved_e"),
            (F.col("e") <= F.col("__m")).alias("upserted"),
        )
        .orderBy("ident")
    )


ORACLE_EAV_UPSERT = """
WITH db AS (
  SELECT c_custkey AS e, c_name AS v FROM customer
),
patch_idents AS (
  SELECT c_name AS ident FROM customer WHERE c_custkey % 3 = 0
  UNION ALL
  SELECT s_name AS ident FROM supplier
),
existing AS (
  SELECT v, min(e) AS e FROM db GROUP BY v
),
hits AS (
  SELECT p.ident, x.e FROM patch_idents p JOIN existing x ON p.ident = x.v
),
misses AS (
  SELECT p.ident,
         (SELECT max(e) FROM db)
         + row_number() OVER (ORDER BY p.ident) AS e
  FROM patch_idents p LEFT JOIN existing x ON p.ident = x.v
  WHERE x.e IS NULL
)
SELECT ident, e AS resolved_e, TRUE AS upserted FROM hits
UNION ALL
SELECT ident, e AS resolved_e, FALSE AS upserted FROM misses
ORDER BY ident
"""

QUERIES["eav_upsert_identity"] = q_eav_upsert_identity
ORACLES["eav_upsert_identity"] = ORACLE_EAV_UPSERT


def q_eav_retract_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Datomic ``:db/retractEntity`` with ``:db/isComponent`` cascade
    (eav.retract_entity): customers own their orders, orders own their
    lines (ACeDB hash-type subtree ownership — the reference's delete
    path drops whole object subtrees).  Entity id spaces are offset so
    the three levels never collide; roots are the first 50 customers.
    The closure is a bounded frontier loop, one hash join per level.
    The oracle is a recursive CTE over the same component edges."""
    from .operators.eav import retract_entity

    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    own_orders = orders.select(
        F.col("o_custkey").alias("e"),
        F.lit("cust/orders").alias("a"),
        (F.col("o_orderkey") + 10000000).cast("string").alias("v"),
        F.lit(1).alias("tx"),
        F.lit(True).alias("op"),
    )
    own_lines = li.select(
        (F.col("l_orderkey") + 10000000).alias("e"),
        F.lit("order/lines").alias("a"),
        (F.col("l_orderkey") * 10 + F.col("l_linenumber") + 100000000)
        .cast("string")
        .alias("v"),
        F.lit(1).alias("tx"),
        F.lit(True).alias("op"),
    )
    datoms = own_orders.unionByName(own_lines)
    roots = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") < 50)
        .select(F.col("c_custkey").alias("e"))
    )
    closed = retract_entity(
        datoms, roots, ["cust/orders", "order/lines"]
    )
    return closed.agg(
        F.count(F.lit(1)).alias("n_entities"),
        F.min("e").alias("min_e"),
        F.max("e").alias("max_e"),
        F.sum(F.col("e").cast("decimal(28,0)")).cast("double").alias("sum_e"),
    )


ORACLE_EAV_RETRACT = """
WITH RECURSIVE edges AS (
  SELECT o_custkey AS parent, o_orderkey + 10000000 AS child FROM orders
  UNION ALL
  SELECT l_orderkey + 10000000 AS parent,
         l_orderkey * 10 + l_linenumber + 100000000 AS child
  FROM lineitem
),
closure AS (
  SELECT c_custkey AS e FROM customer WHERE c_custkey < 50
  UNION
  SELECT child AS e FROM closure JOIN edges ON closure.e = edges.parent
)
SELECT count(*) AS n_entities, min(e) AS min_e, max(e) AS max_e,
       CAST(sum(CAST(e AS DECIMAL(28,0))) AS DOUBLE) AS sum_e
FROM closure
"""

QUERIES["eav_retract_cascade"] = q_eav_retract_cascade
ORACLES["eav_retract_cascade"] = ORACLE_EAV_RETRACT


def q_datalog_with(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Datomic ``:with`` clause — bag semantics for aggregates: ``[:find
    ?t (sum ?amt) :with ?e]``.  Without :with, the solution SET collapses
    two events of the same type and amount into one tuple and the sum
    undercounts; ``:with ?e`` widens the distinct key by the entity var
    so every event contributes.  Amounts are integer-valued, so the
    double-typed sum is order-independent and exact cross-engine."""
    from . import datalog

    ev = load_table(spark, sf_dir, "events")
    datoms = ev.select(
        F.col("event_id").alias("e"), F.lit("ev/type").alias("a"),
        F.col("event_type").alias("v"),
    ).unionByName(
        ev.select(
            F.col("event_id").alias("e"), F.lit("ev/amt").alias("a"),
            F.round(F.col("value")).cast("long").cast("string").alias("v"),
        )
    )
    return datalog.query(
        datoms,
        find=["?t", "(sum ?amt)"],
        where=[["?e", "ev/type", "?t"], ["?e", "ev/amt", "?amt"]],
        with_vars=["?e"],
    ).orderBy("t")


ORACLE_DATALOG_WITH = """
SELECT event_type AS t,
       CAST(sum(CAST(round(value) AS BIGINT)) AS DOUBLE) AS sum_amt
FROM events
GROUP BY event_type
ORDER BY t
"""

QUERIES["datalog_with"] = q_datalog_with
ORACLES["datalog_with"] = ORACLE_DATALOG_WITH


def q_datalog_collection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Datomic collection find-spec ``:find [?n ...]`` — the distinct
    solution values of one variable gathered into a single sorted-array
    row (sorted because an unordered Datomic collection must pick an
    order to be comparable across engines)."""
    from . import datalog

    nation = load_table(spark, sf_dir, "nation")
    datoms = nation.select(
        F.col("n_nationkey").alias("e"), F.lit("nation/name").alias("a"),
        F.col("n_name").alias("v"),
    ).unionByName(
        nation.select(
            F.col("n_nationkey").alias("e"),
            F.lit("nation/region").alias("a"),
            F.col("n_regionkey").cast("string").alias("v"),
        )
    )
    return datalog.collection(
        datoms,
        "?n",
        where=[["?e", "nation/region", "3"], ["?e", "nation/name", "?n"]],
    )


ORACLE_DATALOG_COLLECTION = """
SELECT list_sort(list(DISTINCT n_name)) AS n_coll
FROM nation WHERE n_regionkey = 3
"""

QUERIES["datalog_collection"] = q_datalog_collection
ORACLES["datalog_collection"] = ORACLE_DATALOG_COLLECTION


# ---------------------------------------------------------------------------
# §2.12 — sample-level audio analysis (REAL PCM kernel, stdlib only)
# ---------------------------------------------------------------------------


def q_multimodal_wav_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL sample-level audio decode, oracled: per region a 16-bit mono
    PCM WAV whose samples follow ``s_i = ((i·(k+3)) % 201) − 100``
    (full-scale ±100, deterministic), then RMS / peak / zero-crossing
    analysis through the stdlib wave+struct kernel
    (binary_ops.decode_wav_sample_stats).  The oracle recomputes all
    three statistics from the sample formula in SQL — integer-exact
    sums, so RMS is bit-identical across engines."""
    from collections.abc import Iterator as _It
    import struct as _struct

    import pandas as _pd

    from .multimodal.binary_ops import (
        decode_wav_sample_stats,
        encode_wav_pcm16,
    )

    reg = load_table(spark, sf_dir, "region").select(
        F.col("r_regionkey").cast("long").alias("media_id")
    )

    def gen(batches: _It[_pd.DataFrame]) -> _It[_pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid in pdf["media_id"]:
                k = int(mid)
                n = 1600 + 100 * k
                samples = [((i * (k + 3)) % 201) - 100 for i in range(n)]
                frames = _struct.pack(f"<{n}h", *samples)
                rows.append((k, encode_wav_pcm16(8000, frames)))
            yield _pd.DataFrame(rows, columns=["media_id", "payload"])

    media = reg.mapInPandas(gen, "media_id LONG, payload BINARY")
    return decode_wav_sample_stats(media)


ORACLE_MULTIMODAL_WAV_STATS = """
WITH samples AS (
  SELECT g.r_regionkey AS k, 1600 + 100 * g.r_regionkey AS n,
         r.range AS i,
         ((r.range * (g.r_regionkey + 3)) % 201) - 100 AS s
  FROM region g CROSS JOIN range(2100) r
  WHERE r.range < 1600 + 100 * g.r_regionkey
), lagged AS (
  SELECT k, n, s,
         lag(s) OVER (PARTITION BY k ORDER BY i) AS prev
  FROM samples
)
SELECT CAST(k AS BIGINT) AS media_id,
       CAST(n AS BIGINT) AS n_samples,
       sqrt(avg(CAST(s * s AS DOUBLE))) AS rms,
       CAST(max(abs(s)) AS INTEGER) AS peak,
       count(CASE WHEN prev IS NOT NULL AND ((s >= 0) <> (prev >= 0))
                  THEN 1 END) AS zero_crossings
FROM lagged
GROUP BY k, n
"""

QUERIES["multimodal_wav_stats"] = q_multimodal_wav_stats
ORACLES["multimodal_wav_stats"] = ORACLE_MULTIMODAL_WAV_STATS


def q_multimodal_mp4_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL video-container metadata, oracled: per nation a minimal ISO
    BMFF file (ftyp + moov/mvhd + trak stubs; mvhd alternates 32-bit and
    64-bit versions by key) parsed back through the stdlib box walker
    (multimodal/mp4_meta.py).  Oracle recomputes
    brand/timescale/duration/tracks from the generation formulas."""
    from collections.abc import Iterator as _It

    import pandas as _pd

    from .multimodal.binary_ops import decode_mp4_meta
    from .multimodal.mp4_meta import encode_minimal_mp4

    nat = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").cast("long").alias("media_id")
    )

    def gen(batches: _It[_pd.DataFrame]) -> _It[_pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid in pdf["media_id"]:
                k = int(mid)
                rows.append(
                    (
                        k,
                        encode_minimal_mp4(
                            timescale=600,
                            duration=600 * (k + 7),
                            n_tracks=1 + k % 3,
                            version=k % 2,
                        ),
                    )
                )
            yield _pd.DataFrame(rows, columns=["media_id", "payload"])

    media = nat.mapInPandas(gen, "media_id LONG, payload BINARY")
    return decode_mp4_meta(media)


ORACLE_MULTIMODAL_MP4 = """
SELECT CAST(n_nationkey AS BIGINT) AS media_id,
       'isom' AS major_brand,
       CAST(600 AS INTEGER) AS timescale,
       CAST((n_nationkey + 7) * 1000.0 AS DOUBLE) AS duration_ms,
       CAST(1 + n_nationkey % 3 AS INTEGER) AS n_tracks
FROM nation
"""

QUERIES["multimodal_mp4_meta"] = q_multimodal_mp4_meta
ORACLES["multimodal_mp4_meta"] = ORACLE_MULTIMODAL_MP4


def q_datalog_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Datomic rule set (the ``%`` input): ``notable`` has two
    definitions — big-ticket (price predicate, rule-local variable) or
    urgent (literal constraint) — invoked from the caller's :where and
    expanded disjunctively; per-status distinct-order counts aggregate
    the solution set (datalog.query rules= parameter)."""
    from . import datalog

    o = load_table(spark, sf_dir, "orders")
    datoms = (
        o.select(
            F.col("o_orderkey").alias("e"),
            F.lit("order/price").alias("a"),
            F.col("o_totalprice").cast("string").alias("v"),
        )
        .unionByName(
            o.select(
                F.col("o_orderkey").alias("e"),
                F.lit("order/priority").alias("a"),
                F.col("o_orderpriority").alias("v"),
            )
        )
        .unionByName(
            o.select(
                F.col("o_orderkey").alias("e"),
                F.lit("order/status").alias("a"),
                F.col("o_orderstatus").alias("v"),
            )
        )
    )
    rules = {
        "notable": [
            (
                ["?o"],
                [
                    ["?o", "order/price", "?p"],
                    "CAST(?p AS DOUBLE) > 300000",
                ],
            ),
            (["?o"], [["?o", "order/priority", "1-URGENT"]]),
        ]
    }
    return datalog.query(
        datoms,
        find=["?s", "(count ?o)"],
        where=[("rule", "notable", ["?o"]), ["?o", "order/status", "?s"]],
        rules=rules,
    )


ORACLE_DATALOG_RULES = """
SELECT o_orderstatus AS s, count(DISTINCT o_orderkey) AS count_o
FROM orders
WHERE o_totalprice > 300000 OR o_orderpriority = '1-URGENT'
GROUP BY o_orderstatus
"""

QUERIES["datalog_rules"] = q_datalog_rules
ORACLES["datalog_rules"] = ORACLE_DATALOG_RULES


# ---------------------------------------------------------------------------
# Graph ranking — deterministic fixed-point PageRank under the exact gate
# ---------------------------------------------------------------------------


def q_graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-point PageRank (operators/graph.pagerank) on the directed
    supplier-succession graph (consecutive lines of one order link their
    suppliers), 5 power iterations, damping 85%.  Every operation is
    BIGINT (ranks fixed-point at 1e12, floor division per edge), so the
    iterative result is bit-identical across engines and partitionings —
    the oracle unrolls the same five iterations as chained CTEs.  Top 50
    by rank with unique node tiebreak."""
    from .operators.graph import pagerank

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_suppkey"
    )
    a, b = li.alias("a"), li.alias("b")
    edges = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("b.l_linenumber") == F.col("a.l_linenumber") + 1),
        )
        .filter(F.col("a.l_suppkey") != F.col("b.l_suppkey"))
        .select(
            F.col("a.l_suppkey").alias("src"),
            F.col("b.l_suppkey").alias("dst"),
        )
    )
    nodes = load_table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("node")
    )
    ranked = pagerank(edges, nodes, iterations=5, damping_pct=85)
    return (
        ranked.select(F.col("node").alias("suppkey"), F.col("rank").alias("rank_fp"))
        .orderBy(F.desc("rank_fp"), "suppkey")
        .limit(50)
    )


def _pagerank_oracle(iters: int = 5) -> str:
    head = """
WITH edges AS (
  SELECT DISTINCT a.l_suppkey AS src, b.l_suppkey AS dst
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND b.l_linenumber = a.l_linenumber + 1
  WHERE a.l_suppkey <> b.l_suppkey
),
nodes AS (SELECT s_suppkey AS node FROM supplier),
deg AS (SELECT src, count(*) AS d FROM edges GROUP BY src),
r0 AS (SELECT node, CAST(1000000000000 AS BIGINT) AS r FROM nodes)"""
    steps = []
    for i in range(1, iters + 1):
        steps.append(f""",
r{i} AS (
  SELECT n.node,
         CAST(150000000000 + (85 * COALESCE(c.s, 0)) // 100 AS BIGINT) AS r
  FROM nodes n LEFT JOIN (
    SELECT e.dst AS node, sum(r{i-1}.r // d.d) AS s
    FROM r{i-1} JOIN deg d ON r{i-1}.node = d.src
                JOIN edges e ON e.src = r{i-1}.node
    GROUP BY e.dst
  ) c ON c.node = n.node
)""")
    tail = f"""
SELECT node AS suppkey, r AS rank_fp
FROM r{iters} ORDER BY rank_fp DESC, suppkey LIMIT 50
"""
    return head + "".join(steps) + tail


QUERIES["graph_pagerank"] = q_graph_pagerank
ORACLES["graph_pagerank"] = _pagerank_oracle()


def q_graph_bfs_hops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded BFS hop distances (graph.bfs_hops): minimum hops from the
    suppliers of the first five nations over the supplier-succession graph, ≤ 4 levels.
    Frontier-only expansion — per-level work ∝ frontier out-edges, never
    ∝ path count (the graph is cyclic; naive path enumeration explodes).
    The oracle is a recursive CTE whose UNION (distinct) collapses the
    path explosion the same way, with min(hops) per node on top."""
    from .operators.graph import bfs_hops

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_suppkey"
    )
    a, b = li.alias("a"), li.alias("b")
    edges = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("b.l_linenumber") == F.col("a.l_linenumber") + 1),
        )
        .filter(F.col("a.l_suppkey") != F.col("b.l_suppkey"))
        .select(
            F.col("a.l_suppkey").alias("src"),
            F.col("b.l_suppkey").alias("dst"),
        )
    )
    sources = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_nationkey") < 5)
        .select(F.col("s_suppkey").alias("node"))
    )
    return bfs_hops(edges, sources, max_hops=4).orderBy("hops", "node")


ORACLE_GRAPH_BFS = """
WITH RECURSIVE edges AS (
  SELECT DISTINCT a.l_suppkey AS src, b.l_suppkey AS dst
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND b.l_linenumber = a.l_linenumber + 1
  WHERE a.l_suppkey <> b.l_suppkey
),
walk AS (
  SELECT s_suppkey AS node, 0 AS hops FROM supplier WHERE s_nationkey < 5
  UNION
  SELECT e.dst AS node, w.hops + 1 AS hops
  FROM walk w JOIN edges e ON e.src = w.node
  WHERE w.hops < 4
)
SELECT node, CAST(min(hops) AS INTEGER) AS hops
FROM walk GROUP BY node ORDER BY hops, node
"""

QUERIES["graph_bfs_hops"] = q_graph_bfs_hops
ORACLES["graph_bfs_hops"] = ORACLE_GRAPH_BFS


def q_text_encoding_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL charset detection + decode (sources/encoding.py): per nation
    a byte payload carrying a deterministic mixed-script text, encoded
    per key in one of five ways (plain UTF-8, UTF-8 BOM, UTF-16 LE/BE
    with BOMs, Latin-1 bytes that are invalid UTF-8).  The detection
    ladder (UTF-32 → UTF-16 → UTF-8-sig BOMs → strict UTF-8 scan →
    Latin-1 fallback) must label and decode every payload; the oracle
    recomputes encoding label and char count from the construction."""
    from collections.abc import Iterator as _It

    import pandas as _pd

    from .sources.encoding import decode_text_payloads

    nat = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").cast("long").alias("media_id")
    )

    def gen(batches: _It[_pd.DataFrame]) -> _It[_pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid in pdf["media_id"]:
                k = int(mid)
                text = f"nation {k} café — résumé {'x' * (k % 7)}"
                mode = k % 5
                if mode == 0:
                    payload = text.encode("utf-8")
                elif mode == 1:
                    payload = text.encode("utf-8-sig")
                elif mode == 2:
                    payload = text.encode("utf-16-le")
                    payload = b"\xff\xfe" + payload
                elif mode == 3:
                    payload = b"\xfe\xff" + text.encode("utf-16-be")
                else:
                    # Latin-1 bytes for the accented chars are invalid
                    # UTF-8 sequences -> the fallback branch
                    payload = text.replace("—", "-").encode("latin-1")
                rows.append((k, payload))
            yield _pd.DataFrame(rows, columns=["media_id", "payload"])

    media = nat.mapInPandas(gen, "media_id LONG, payload BINARY")
    return decode_text_payloads(media).select(
        "media_id", "encoding", "n_chars"
    )


ORACLE_TEXT_ENCODING = """
SELECT CAST(n_nationkey AS BIGINT) AS media_id,
       CASE n_nationkey % 5
            WHEN 0 THEN 'utf-8'
            WHEN 1 THEN 'utf-8-sig'
            WHEN 2 THEN 'utf-16-le'
            WHEN 3 THEN 'utf-16-be'
            ELSE 'latin-1' END AS encoding,
       -- text = 'nation {k} café — résumé ' + k%7 x's  (the latin-1
       -- branch swaps the em-dash for '-': same length)
       CAST(7 + len(CAST(n_nationkey AS VARCHAR)) + 15 + (n_nationkey % 7)
            AS INTEGER) AS n_chars
FROM nation
"""

QUERIES["text_encoding_detect"] = q_text_encoding_detect
ORACLES["text_encoding_detect"] = ORACLE_TEXT_ENCODING


def q_er_match_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity resolution, Fellegi-Sunter style: a deterministic "dirty"
    registry (every 4th customer's name loses its last digit to 'X') is
    matched back against the clean table — blocking on (nation,
    segment) so the pair space is Σ|block|², never n², then integer
    agreement weights (edit-distance ≤ 1: +30; exact balance: +20;
    exact name: +10) with a 40 threshold.  Everything integer/exact, so
    the oracle replays the same blocked scoring in SQL (DuckDB's
    levenshtein matches Spark's).  Output: matched pairs + score."""
    cust = load_table(spark, sf_dir, "customer")
    k = F.col("c_custkey")
    dirty = cust.select(
        (k + 1000000).alias("d_id"),
        F.when(
            k % 4 == 0,
            F.concat(F.expr("substring(c_name, 1, length(c_name) - 1)"), F.lit("X")),
        )
        .otherwise(F.col("c_name"))
        .alias("d_name"),
        F.col("c_nationkey").alias("d_nat"),
        F.col("c_acctbal").alias("d_bal"),
        F.col("c_mktsegment").alias("d_seg"),
    )
    clean = cust.select(
        k.alias("c_id"), "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"
    )
    pairs = clean.join(
        dirty,
        (F.col("c_nationkey") == F.col("d_nat"))
        & (F.col("c_mktsegment") == F.col("d_seg")),
    )
    score = (
        F.when(F.levenshtein("c_name", "d_name") <= 1, F.lit(30)).otherwise(
            F.lit(-10)
        )
        + F.when(F.col("c_acctbal") == F.col("d_bal"), F.lit(20)).otherwise(
            F.lit(0)
        )
        + F.when(F.col("c_name") == F.col("d_name"), F.lit(10)).otherwise(
            F.lit(0)
        )
    )
    return (
        pairs.select("c_id", "d_id", score.alias("score"))
        .filter(F.col("score") >= 40)
        .orderBy("c_id", "d_id")
    )


ORACLE_ER_MATCH = """
WITH dirty AS (
  SELECT c_custkey + 1000000 AS d_id,
         CASE WHEN c_custkey % 4 = 0
              THEN substring(c_name, 1, length(c_name) - 1) || 'X'
              ELSE c_name END AS d_name,
         c_nationkey AS d_nat, c_acctbal AS d_bal, c_mktsegment AS d_seg
  FROM customer
),
pairs AS (
  SELECT c.c_custkey AS c_id, d.d_id,
         (CASE WHEN levenshtein(c.c_name, d.d_name) <= 1
               THEN 30 ELSE -10 END)
         + (CASE WHEN c.c_acctbal = d.d_bal THEN 20 ELSE 0 END)
         + (CASE WHEN c.c_name = d.d_name THEN 10 ELSE 0 END) AS score
  FROM customer c JOIN dirty d
    ON c.c_nationkey = d.d_nat AND c.c_mktsegment = d.d_seg
)
SELECT c_id, d_id, score FROM pairs WHERE score >= 40
ORDER BY c_id, d_id
"""

QUERIES["er_match_pairs"] = q_er_match_pairs
ORACLES["er_match_pairs"] = ORACLE_ER_MATCH


def q_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Key-skew diagnostics (the pre-flight a 100 TB join needs before
    choosing salting/AQE strategies): top-20 hottest join keys of
    lineitem's l_suppkey with exact parts-per-million share — integer
    division so the share is bit-exact cross-engine."""
    li = load_table(spark, sf_dir, "lineitem")
    counts = li.groupBy("l_suppkey").agg(F.count(F.lit(1)).alias("cnt"))
    total = counts.agg(F.sum("cnt").alias("total"))
    return (
        counts.join(F.broadcast(total))
        .select(
            "l_suppkey",
            "cnt",
            F.expr("(cnt * 1000000) div total").alias("share_ppm"),
        )
        .orderBy(F.desc("cnt"), "l_suppkey")
        .limit(20)
    )


ORACLE_SKEW = """
WITH counts AS (
  SELECT l_suppkey, count(*) AS cnt FROM lineitem GROUP BY l_suppkey
)
SELECT l_suppkey, cnt,
       CAST((cnt * 1000000) // (SELECT sum(cnt) FROM counts) AS BIGINT) AS share_ppm
FROM counts ORDER BY cnt DESC, l_suppkey LIMIT 20
"""

QUERIES["skew_report"] = q_skew_report
ORACLES["skew_report"] = ORACLE_SKEW


def q_archive_zip_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL data-plane archive scan (sources/encoding.scan_zip_members):
    per region a ZIP (stdlib zipfile, deflate) of 3+k text members is
    built distributed, then exploded back into member rows — names,
    sizes, decompressed content hashes — through the Arrow seam.  CRC
    checks ride ZipFile.read, so a corrupt deflate stream fails the
    query rather than the gate.  Oracle recomputes every member row
    from the construction formulas."""
    from collections.abc import Iterator as _It
    import io as _io
    import zipfile as _zipfile

    import pandas as _pd

    from .sources.encoding import scan_zip_members

    reg = load_table(spark, sf_dir, "region").select(
        F.col("r_regionkey").cast("long").alias("media_id")
    )

    def gen(batches: _It[_pd.DataFrame]) -> _It[_pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid in pdf["media_id"]:
                k = int(mid)
                buf = _io.BytesIO()
                with _zipfile.ZipFile(
                    buf, "w", _zipfile.ZIP_DEFLATED
                ) as zf:
                    for i in range(3 + k):
                        zf.writestr(
                            f"doc_{i}.txt",
                            f"region {k} member {i} " + "ab" * (i + k),
                        )
                rows.append((k, buf.getvalue()))
            yield _pd.DataFrame(rows, columns=["media_id", "payload"])

    media = reg.mapInPandas(gen, "media_id LONG, payload BINARY")
    return scan_zip_members(media).select(
        "media_id", "member", "n_bytes", F.md5("payload").alias("payload_md5")
    )


ORACLE_ARCHIVE_ZIP = """
SELECT CAST(r.r_regionkey AS BIGINT) AS media_id,
       'doc_' || CAST(i.range AS VARCHAR) || '.txt' AS member,
       CAST(length('region ' || CAST(r.r_regionkey AS VARCHAR)
                   || ' member ' || CAST(i.range AS VARCHAR) || ' ')
            + 2 * (i.range + r.r_regionkey) AS INTEGER) AS n_bytes,
       md5('region ' || CAST(r.r_regionkey AS VARCHAR)
           || ' member ' || CAST(i.range AS VARCHAR) || ' '
           || repeat('ab', i.range + r.r_regionkey)) AS payload_md5
FROM region r CROSS JOIN range(8) i
WHERE i.range < 3 + r.r_regionkey
"""

QUERIES["archive_zip_scan"] = q_archive_zip_scan
ORACLES["archive_zip_scan"] = ORACLE_ARCHIVE_ZIP


def q_merge_into_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Delta ``MERGE INTO`` analog over plain Parquet
    (plans/upsert.merge_upsert — copy-on-write against the versioned
    snapshot store): a customer-datom store partitioned by market
    segment takes a patch transaction touching ONLY the BUILDING
    partition (updates for most, retractions for every 10th customer);
    untouched partitions carry over without paying the LWW window.  The
    merged snapshot is read back and profiled per segment; the oracle
    recomputes the post-merge state in closed form.  (Delta itself is
    not installable in this sandbox — probed, STATUS.md — so the COW
    seam IS the production path here.)"""
    import shutil

    from .plans import snapshots as SNAP
    from .plans.upsert import merge_upsert
    from .queries_e2e import _fx

    root = _fx(sf_dir, "merge_store")
    shutil.rmtree(root, ignore_errors=True)
    cust = load_table(spark, sf_dir, "customer")
    k = F.col("c_custkey")
    base = cust.select(
        k.alias("e"),
        F.lit("cust/bal").alias("a"),
        F.floor(F.col("c_acctbal")).cast("long").cast("string").alias("v"),
        F.lit(1).alias("tx"),
        F.lit(True).alias("op"),
        F.col("c_mktsegment").alias("class"),
    )
    SNAP.write_snapshot(base, root, label="base")
    patches = (
        cust.filter(F.col("c_mktsegment") == "BUILDING")
        .select(
            k.alias("e"),
            F.lit("cust/bal").alias("a"),
            (k % 1000).cast("string").alias("v"),
            F.lit(2).alias("tx"),
            (k % 10 != 0).alias("op"),
            F.col("c_mktsegment").alias("class"),
        )
    )
    merge_upsert(spark, root, patches, partition_col="class", label="merged")
    merged = SNAP.read_snapshot(spark, root, label="merged")
    return (
        merged.groupBy("class")
        .agg(
            F.count(F.lit(1)).alias("n_datoms"),
            F.sum(F.col("v").cast("long")).alias("sum_v"),
        )
        .orderBy("class")
    )


ORACLE_MERGE_INTO = """
WITH post AS (
  SELECT c_mktsegment AS class,
         CASE WHEN c_mktsegment = 'BUILDING'
              THEN c_custkey % 1000
              ELSE CAST(floor(c_acctbal) AS BIGINT) END AS v
  FROM customer
  WHERE NOT (c_mktsegment = 'BUILDING' AND c_custkey % 10 = 0)
)
SELECT class, count(*) AS n_datoms, CAST(sum(v) AS BIGINT) AS sum_v
FROM post GROUP BY class ORDER BY class
"""

QUERIES["merge_into_upsert"] = q_merge_into_upsert
ORACLES["merge_into_upsert"] = ORACLE_MERGE_INTO


def q_w7_trailing_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE-frame window with a time interval (the frame mode the ROWS
    suite w3 doesn't cover): per customer, the trailing-30-day order
    total — frame = RANGE [now-30d, now] over o_orderdate, so date PEERS
    aggregate together regardless of row order (deterministic where a
    ROWS frame would not be).  Decimal-exact sums; Spark expresses the
    interval as epoch-second rangeBetween, DuckDB as INTERVAL bounds —
    same frame, value-identical."""
    orders = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.col("o_orderdate").cast("timestamp").cast("long"))
        .rangeBetween(-30 * 86400, 0)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.sum(F.col("o_totalprice").cast("decimal(18,4)"))
        .over(w)
        .cast("double")
        .alias("trailing_30d"),
    )


ORACLE_W7_TRAILING = """
SELECT o_custkey, o_orderkey,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) OVER (
         PARTITION BY o_custkey ORDER BY o_orderdate
         RANGE BETWEEN INTERVAL 30 DAY PRECEDING AND CURRENT ROW
       ) AS DOUBLE) AS trailing_30d
FROM orders
"""

QUERIES["w7_trailing_range"] = q_w7_trailing_range
ORACLES["w7_trailing_range"] = ORACLE_W7_TRAILING


def q_f_generator_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generator-expression coverage: posexplode (ordinal-preserving
    explode), inline (struct-array → rows), and stack (the melt
    primitive) in one pass over nation — DuckDB mirrors with UNNEST
    WITH ORDINALITY and union arms."""
    nat = load_table(spark, sf_dir, "nation")
    arr = F.array(
        F.col("n_name"),
        F.upper("n_name"),
        F.concat(F.lit("r"), F.col("n_regionkey").cast("string")),
    )
    return nat.select(
        "n_nationkey", F.posexplode(arr).alias("pos", "val")
    ).orderBy("n_nationkey", "pos")


ORACLE_F_GENERATOR = """
SELECT n_nationkey, CAST(i.range AS INTEGER) AS pos,
       ([n_name, upper(n_name),
         'r' || CAST(n_regionkey AS VARCHAR)])[i.range + 1] AS val
FROM nation CROSS JOIN range(3) i
ORDER BY n_nationkey, pos
"""

QUERIES["f_generator_suite"] = q_f_generator_suite
ORACLES["f_generator_suite"] = ORACLE_F_GENERATOR


def q_f_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI NULL-semantics battery on one relation: count(*) vs
    count(col) vs count(DISTINCT col), sum/avg null-skipping, NULLS
    FIRST/LAST ordering keys, coalesce/nullif/nvl2, and null-safe
    equality — the parity corners engines most often disagree on.
    NULLs are planted deterministically (every 3rd balance, every 5th
    name)."""
    supp = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey",
        F.when(F.col("s_suppkey") % 3 != 0, F.col("s_acctbal")).alias("bal"),
        F.when(F.col("s_suppkey") % 5 != 0, F.col("s_name")).alias("nm"),
    )
    return supp.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("bal").alias("n_bal"),
        F.countDistinct("nm").alias("n_names"),
        F.sum(F.col("bal").cast("decimal(18,4)")).cast("double").alias("sum_bal"),
        F.sum(
            F.when(F.col("bal").eqNullSafe(F.lit(None).cast("double")), 1)
            .otherwise(0)
        ).alias("n_null_safe_eq_null"),
        F.min(F.coalesce("nm", F.lit("~"))).alias("min_nm_coalesced"),
        F.max(F.nullif(F.col("nm"), F.lit("Supplier#000000001"))).alias(
            "max_nm_nullif"
        ),
        # first(ignorenulls) is scan-order-dependent in Spark — pin the
        # "first" to the minimum key among non-null names (matches the
        # oracle's ORDER BY s_suppkey LIMIT 1) so the result survives
        # any partitioning
        F.expr(
            "min_by(nm, CASE WHEN nm IS NOT NULL THEN s_suppkey END)"
        ).alias("first_nm"),
    )


ORACLE_F_NULLS = """
WITH s AS (
  SELECT s_suppkey,
         CASE WHEN s_suppkey % 3 <> 0 THEN s_acctbal END AS bal,
         CASE WHEN s_suppkey % 5 <> 0 THEN s_name END AS nm
  FROM supplier
)
SELECT count(*) AS n_rows,
       count(bal) AS n_bal,
       count(DISTINCT nm) AS n_names,
       CAST(sum(CAST(bal AS DECIMAL(18,4))) AS DOUBLE) AS sum_bal,
       CAST(sum(CASE WHEN bal IS NOT DISTINCT FROM NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null_safe_eq_null,
       min(coalesce(nm, '~')) AS min_nm_coalesced,
       max(nullif(nm, 'Supplier#000000001')) AS max_nm_nullif,
       (SELECT nm FROM s WHERE nm IS NOT NULL ORDER BY s_suppkey LIMIT 1)
           AS first_nm
FROM s
"""

QUERIES["f_null_semantics"] = q_f_null_semantics
ORACLES["f_null_semantics"] = ORACLE_F_NULLS


def _ensure_index_store(spark: SparkSession, sf_dir: str) -> str:
    """Build the four-index store (eav.write_indexes) once per sf —
    content-deterministic from the parquet tables, so existence-gating
    is safe (same idempotency pattern as queries_e2e fixtures)."""
    import os

    from .operators.eav import write_indexes
    from .queries_e2e import _fx

    root = _fx(sf_dir, "index_store")
    if os.path.exists(f"{root}/avet"):
        return root
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    datoms = (
        cust.select(
            F.col("c_custkey").alias("e"), F.lit("cust/name").alias("a"),
            F.col("c_name").alias("v"), F.lit(1).alias("tx"),
            F.lit(True).alias("op"),
        )
        .unionByName(cust.select(
            F.col("c_custkey").alias("e"), F.lit("cust/segment").alias("a"),
            F.col("c_mktsegment").alias("v"), F.lit(1).alias("tx"),
            F.lit(True).alias("op"),
        ))
        .unionByName(orders.select(
            (F.col("o_orderkey") + 10000000).alias("e"),
            F.lit("order/customer").alias("a"),
            F.col("o_custkey").cast("string").alias("v"),
            F.lit(1).alias("tx"), F.lit(True).alias("op"),
        ))
    )
    write_indexes(datoms, root, ref_attrs=["order/customer"])
    return root


def q_eav_avet_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Datomic's AVET index as a storage layout (eav.write_indexes):
    value-range lookup on cust/name touches ONE hive partition
    directory (the ``a`` key — PartitionFilters plan-guarded) with the
    ``v`` range pushed into v-sorted row groups.  The oracle is the
    direct relational filter — identical rows, radically different scan
    cost at 100 TB."""
    from .operators.eav import avet_lookup

    root = _ensure_index_store(spark, sf_dir)
    return avet_lookup(
        spark, root, "cust/name",
        "Customer#000000100", "Customer#000000199",
    ).select("e", "v").orderBy("e")


ORACLE_EAV_AVET = """
SELECT c_custkey AS e, c_name AS v
FROM customer
WHERE c_name >= 'Customer#000000100' AND c_name <= 'Customer#000000199'
ORDER BY e
"""

QUERIES["eav_avet_lookup"] = q_eav_avet_lookup
ORACLES["eav_avet_lookup"] = ORACLE_EAV_AVET


def q_eav_vaet_reverse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Datomic's VAET index: reverse-ref navigation ("which orders point
    at these customers?") reads ONLY the ref-attribute partition — no
    scan of name/segment datoms.  Profile per target customer; oracle is
    the direct orders filter."""
    from .operators.eav import vaet_reverse_lookup

    root = _ensure_index_store(spark, sf_dir)
    targets = load_table(spark, sf_dir, "customer").filter(
        F.col("c_custkey") < 50
    ).select(F.col("c_custkey").alias("e"))
    rev = vaet_reverse_lookup(spark, root, targets)
    return (
        rev.groupBy("target")
        .agg(
            F.count(F.lit(1)).alias("n_referrers"),
            F.min("referrer").alias("min_referrer"),
        )
        .orderBy("target")
    )


ORACLE_EAV_VAET = """
SELECT o_custkey AS target, count(*) AS n_referrers,
       min(o_orderkey + 10000000) AS min_referrer
FROM orders WHERE o_custkey < 50
GROUP BY o_custkey ORDER BY target
"""

QUERIES["eav_vaet_reverse"] = q_eav_vaet_reverse
ORACLES["eav_vaet_reverse"] = ORACLE_EAV_VAET


# ---------------------------------------------------------------------------
# §2.12 multimodal — REAL BMP pixel decode + nearest-neighbor resize
# ---------------------------------------------------------------------------


def _gradient_media(
    spark: SparkSession, sf_dir: str, fmt: str
) -> DataFrame:
    """One 16×12 gradient image per nation, encoded distributed by the
    pure-stdlib codecs.  The per-pixel formulas depend on (x, y), so any
    row-order / channel-order / padding bug in a codec shifts the sums."""
    from collections.abc import Iterator as _It

    import pandas as _pd

    from .multimodal.bmp_codec import encode_bmp_rgb
    from .multimodal.png_codec import encode_png_rgb

    nat = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").cast("long").alias("media_id")
    )
    enc = encode_bmp_rgb if fmt == "bmp" else encode_png_rgb

    def gen(batches: _It[_pd.DataFrame]) -> _It[_pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid in pdf["media_id"]:
                k = int(mid)
                pix = bytearray()
                for y in range(12):
                    for x in range(16):
                        pix += bytes(
                            (
                                (9 * k + 7 * x + 13 * y) % 256,
                                (5 * k + 11 * x + 3 * y) % 256,
                                (3 * k + x + 17 * y) % 256,
                            )
                        )
                rows.append((k, enc(16, 12, bytes(pix))))
            yield _pd.DataFrame(rows, columns=["media_id", "payload"])

    return nat.mapInPandas(gen, "media_id LONG, payload BINARY")


def q_multimodal_bmp_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL BMP decode, integer-oracled: per-nation gradient BMPs are
    encoded distributed (bmp_codec: bottom-up rows, BGR order, 4-byte
    row padding) and decoded back in the Arrow seam; the oracle
    recomputes the per-channel INTEGER pixel sums from the generation
    formulas over a generated (x, y) grid — exact equality, no float
    tolerance.  A decoder that forgets the bottom-up flip or the BGR
    swap produces different sums and fails the gate."""
    from .multimodal.binary_ops import decode_pixel_sums

    media = _gradient_media(spark, sf_dir, "bmp")
    stats = decode_pixel_sums(media)
    return stats.select(
        "media_id",
        "width",
        "height",
        F.element_at("sums", 1).alias("sum_r"),
        F.element_at("sums", 2).alias("sum_g"),
        F.element_at("sums", 3).alias("sum_b"),
    )


ORACLE_MULTIMODAL_BMP = """
WITH grid AS (
  SELECT gx.x AS x, gy.y AS y
  FROM generate_series(0, 15) gx(x), generate_series(0, 11) gy(y)
)
SELECT CAST(n_nationkey AS BIGINT) AS media_id,
       CAST(16 AS INTEGER) AS width,
       CAST(12 AS INTEGER) AS height,
       CAST(sum((9 * n_nationkey + 7 * x + 13 * y) % 256) AS BIGINT) AS sum_r,
       CAST(sum((5 * n_nationkey + 11 * x + 3 * y) % 256) AS BIGINT) AS sum_g,
       CAST(sum((3 * n_nationkey + x + 17 * y) % 256) AS BIGINT) AS sum_b
FROM nation, grid
GROUP BY n_nationkey
"""

QUERIES["multimodal_bmp_decode"] = q_multimodal_bmp_decode
ORACLES["multimodal_bmp_decode"] = ORACLE_MULTIMODAL_BMP


def q_multimodal_image_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image resize under the exact gate: gradient PNGs are decoded
    (inflate + unfilter) and nearest-neighbor-resized 16×12 → 6×5 in the
    Arrow seam (image_ops.nn_resize — pure floor-index arithmetic), then
    the RESIZED image's integer channel sums are compared against the
    oracle's coordinate-by-coordinate replay: target (x2, y2) samples
    source (x2·16//6, y2·12//5), and the SQL evaluates the generation
    formula at exactly those source coordinates.  Non-divisible target
    dims are chosen on purpose — a round-instead-of-floor index map
    fails the gate."""
    from .multimodal.binary_ops import resize_pixel_sums

    media = _gradient_media(spark, sf_dir, "png")
    stats = resize_pixel_sums(media, 6, 5)
    return stats.select(
        "media_id",
        "width",
        "height",
        F.element_at("sums", 1).alias("sum_r"),
        F.element_at("sums", 2).alias("sum_g"),
        F.element_at("sums", 3).alias("sum_b"),
    )


ORACLE_MULTIMODAL_RESIZE = """
WITH grid AS (
  SELECT CAST(floor(gx.x2 * 16 / 6) AS BIGINT) AS x,
         CAST(floor(gy.y2 * 12 / 5) AS BIGINT) AS y
  FROM generate_series(0, 5) gx(x2), generate_series(0, 4) gy(y2)
)
SELECT CAST(n_nationkey AS BIGINT) AS media_id,
       CAST(6 AS INTEGER) AS width,
       CAST(5 AS INTEGER) AS height,
       CAST(sum((9 * n_nationkey + 7 * x + 13 * y) % 256) AS BIGINT) AS sum_r,
       CAST(sum((5 * n_nationkey + 11 * x + 3 * y) % 256) AS BIGINT) AS sum_g,
       CAST(sum((3 * n_nationkey + x + 17 * y) % 256) AS BIGINT) AS sum_b
FROM nation, grid
GROUP BY n_nationkey
"""

QUERIES["multimodal_image_resize"] = q_multimodal_image_resize
ORACLES["multimodal_image_resize"] = ORACLE_MULTIMODAL_RESIZE


def q_multimodal_audio_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio resampling under the exact gate: per-nation 16-bit mono
    PCM WAVs (deterministic sample formula, 400 samples @ 8 kHz) are
    decoded with stdlib wave/struct and linear-resampled to 11 025 Hz by
    the integer phase accumulator (audio_ops.resample_linear_scaled:
    position j ↦ divmod(j·8000, 11025), outputs scaled by 11 025 so the
    whole kernel stays in ℤ).  The oracle replays the interpolation
    sample-by-sample in SQL from the generation formula — exact integer
    equality, so an off-by-one in the phase map, a truncation-vs-floor
    slip, or a wrong endpoint clamp all fail the gate."""
    from collections.abc import Iterator as _It
    import struct as _struct

    import pandas as _pd

    from .multimodal.binary_ops import encode_wav_pcm16, resample_wav_stats

    nat = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").cast("long").alias("media_id")
    )

    def gen(batches: _It[_pd.DataFrame]) -> _It[_pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid in pdf["media_id"]:
                k = int(mid)
                samples = [
                    ((n * (37 + k)) % 2001) - 1000 for n in range(400)
                ]
                frames = _struct.pack(f"<{len(samples)}h", *samples)
                rows.append((k, encode_wav_pcm16(8000, frames)))
            yield _pd.DataFrame(rows, columns=["media_id", "payload"])

    media = nat.mapInPandas(gen, "media_id LONG, payload BINARY")
    return resample_wav_stats(media, 11025)


ORACLE_MULTIMODAL_RESAMPLE_AUDIO = """
WITH pos AS (
  SELECT n_nationkey AS k, j,
         CAST(floor(j * 8000 / 11025) AS BIGINT) AS idx,
         (j * 8000) % 11025 AS r
  FROM nation, generate_series(0, 549) g(j)
), vals AS (
  SELECT k, j, r,
         ((idx * (37 + k)) % 2001) - 1000 AS s0,
         ((LEAST(idx + 1, 399) * (37 + k)) % 2001) - 1000 AS s1
  FROM pos
), src AS (
  SELECT n_nationkey AS k,
         sum((((n * (37 + n_nationkey)) % 2001) - 1000)
             * (((n * (37 + n_nationkey)) % 2001) - 1000)) AS sumsq
  FROM nation, generate_series(0, 399) g(n)
  GROUP BY n_nationkey
)
SELECT CAST(v.k AS BIGINT) AS media_id,
       CAST(400 AS INTEGER) AS n_src,
       CAST(550 AS INTEGER) AS n_out,
       CAST(sum(11025 * s0 + (s1 - s0) * r) AS BIGINT) AS sum_scaled,
       CAST(any_value(src.sumsq) AS BIGINT) AS sumsq_src
FROM vals v JOIN src ON v.k = src.k
GROUP BY v.k
"""

QUERIES["multimodal_audio_resample"] = q_multimodal_audio_resample
ORACLES["multimodal_audio_resample"] = ORACLE_MULTIMODAL_RESAMPLE_AUDIO


def q_dedup_image_phash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal near-dup detection, fully oracled: per-nation gradient
    PNGs plus a planted perturbed variant of each (+60 on three source
    pixels) flow through the REAL pipeline — decode → 9×8 NN resize →
    gray → 64-bit dHash (binary_ops.image_dhash) — then the standard
    banded LSH join finds pairs with hamming ≤ 3: four 16-bit bands,
    pigeonhole guarantees ≤ 3 differing bits leave at least one band
    identical, so the banding is EXACT (not approximate) at this
    threshold and the all-pairs SQL oracle matches it.  The oracle
    recomputes every hash bit from the generation formulas (resize index
    map and gradient comparisons replayed coordinate-by-coordinate) and
    takes the brute-force pair set.  dHash's brightness invariance shows
    up honestly: distinct nations whose gradients differ by a constant
    offset collapse to the same hash — exactly what a perceptual hash is
    for.  Scale: hashes are 8 bytes/image, candidates come from 4
    equi-join buckets — payloads never join anything."""
    from collections.abc import Iterator as _It

    import pandas as _pd

    from .multimodal.binary_ops import image_dhash
    from .multimodal.png_codec import encode_png_rgb

    nat = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").cast("long").alias("k")
    )

    def gen(batches: _It[_pd.DataFrame]) -> _It[_pd.DataFrame]:
        for pdf in batches:
            rows = []
            for kk in pdf["k"]:
                k = int(kk)
                for variant in (0, 1):
                    pix = bytearray()
                    for y in range(12):
                        for x in range(16):
                            bump = (
                                60
                                if variant and x == 7 and y in (4, 5, 6)
                                else 0
                            )
                            pix += bytes(
                                (
                                    (9 * k + 7 * x + 13 * y + bump) % 256,
                                    (5 * k + 11 * x + 3 * y + bump) % 256,
                                    (3 * k + x + 17 * y + bump) % 256,
                                )
                            )
                    rows.append(
                        (k + 1000 * variant, encode_png_rgb(16, 12, bytes(pix)))
                    )
            yield _pd.DataFrame(rows, columns=["media_id", "payload"])

    media = nat.mapInPandas(gen, "media_id LONG, payload BINARY")
    hashes = image_dhash(media)
    banded = hashes.select(
        "media_id",
        "dhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("band"),
                        (
                            F.shiftright(F.col("dhash"), 16 * j)
                            .bitwiseAND(F.lit(0xFFFF))
                        ).alias("key"),
                    )
                    for j in range(4)
                ]
            )
        ).alias("bk"),
    ).select("media_id", "dhash", F.col("bk.band"), F.col("bk.key"))
    a, b = banded.alias("a"), banded.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.media_id") < F.col("b.media_id")),
        )
        .select(
            F.col("a.media_id").alias("id_a"),
            F.col("b.media_id").alias("id_b"),
            F.bit_count(
                F.col("a.dhash").bitwiseXOR(F.col("b.dhash"))
            ).alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= 3)
    )
    return pairs


ORACLE_DEDUP_IMAGE_PHASH = """
WITH imgs AS (
  SELECT n_nationkey AS k, v.variant,
         n_nationkey + 1000 * v.variant AS media_id
  FROM nation, (VALUES (0), (1)) v(variant)
), bits AS (
  SELECT i.media_id,
         g.y2 * 8 + g.x2 AS idx,
         -- source coords after the 9x8 NN resize index map
         CAST(floor(g.x2 * 16 / 9) AS BIGINT) AS xa,
         CAST(floor((g.x2 + 1) * 16 / 9) AS BIGINT) AS xb,
         CAST(floor(g.y2 * 12 / 8) AS BIGINT) AS ys,
         i.k, i.variant
  FROM imgs i,
       (SELECT gy.y2, gx.x2
        FROM generate_series(0, 7) gy(y2), generate_series(0, 7) gx(x2)) g
), gray AS (
  SELECT media_id, idx,
         ((9*k + 7*xa + 13*ys + CASE WHEN variant=1 AND xa=7
              AND ys IN (4,5,6) THEN 60 ELSE 0 END) % 256)
       + ((5*k + 11*xa + 3*ys + CASE WHEN variant=1 AND xa=7
              AND ys IN (4,5,6) THEN 60 ELSE 0 END) % 256)
       + ((3*k + xa + 17*ys + CASE WHEN variant=1 AND xa=7
              AND ys IN (4,5,6) THEN 60 ELSE 0 END) % 256) AS ga,
         ((9*k + 7*xb + 13*ys + CASE WHEN variant=1 AND xb=7
              AND ys IN (4,5,6) THEN 60 ELSE 0 END) % 256)
       + ((5*k + 11*xb + 3*ys + CASE WHEN variant=1 AND xb=7
              AND ys IN (4,5,6) THEN 60 ELSE 0 END) % 256)
       + ((3*k + xb + 17*ys + CASE WHEN variant=1 AND xb=7
              AND ys IN (4,5,6) THEN 60 ELSE 0 END) % 256) AS gb
  FROM bits
), hashes AS (
  SELECT media_id,
         CAST(sum(CASE WHEN ga > gb
                       THEN (CAST(1 AS HUGEINT) << idx) ELSE 0 END)
              AS HUGEINT) AS uh
  FROM gray GROUP BY media_id
), signed AS (
  SELECT media_id,
         CAST(CASE WHEN uh >= CAST(1 AS HUGEINT) << 63
              THEN uh - (CAST(1 AS HUGEINT) << 64) ELSE uh END
              AS BIGINT) AS dhash
  FROM hashes
)
SELECT a.media_id AS id_a, b.media_id AS id_b,
       bit_count(xor(a.dhash, b.dhash)) AS hamming
FROM signed a JOIN signed b ON a.media_id < b.media_id
WHERE bit_count(xor(a.dhash, b.dhash)) <= 3
"""

QUERIES["dedup_image_phash"] = q_dedup_image_phash
ORACLES["dedup_image_phash"] = ORACLE_DEDUP_IMAGE_PHASH


def q_ace_datasource_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S4 through Spark's source-plugin seam: the gzipped ``.ace`` dump
    dir is read as ``spark.read.format("ace")`` — a Python DataSource
    (sources/ace_datasource.py) with file-granular partition planning —
    and profiled per (class, first tag).  Same grammar, same parser as
    the block-source path; the oracle recomputes the profile from the
    generating tables, so a partition-planning bug (file skipped, file
    read twice) or a parse divergence between the two entry points
    fails the gate."""
    from .queries_e2e import _ensure_ace_dump
    from .sources import ace_datasource

    ace_datasource.register(spark)
    dump = _ensure_ace_dump(spark, sf_dir)
    recs = spark.read.format("ace").load(dump)
    return (
        recs.select(
            "class",
            F.element_at("tag_path", 1).alias("tag"),
            "obj_id",
            "value",
            "ts",
            "comment",
        )
        .groupBy("class", "tag")
        .agg(
            F.count(F.lit(1)).alias("n_records"),
            F.countDistinct("obj_id").alias("n_objs"),
            F.min("value").alias("min_v"),
            F.max("value").alias("max_v"),
            F.sum(F.col("ts").isNotNull().cast("long")).alias("n_ts"),
            F.sum(F.col("comment").isNotNull().cast("long")).alias(
                "n_comments"
            ),
        )
    )


ORACLE_ACE_DATASOURCE = """
SELECT 'Customer' AS class, 'Name' AS tag, count(*) AS n_records,
       count(DISTINCT 'C' || c_custkey) AS n_objs,
       min(c_name) AS min_v, max(c_name) AS max_v,
       count(*) AS n_ts, CAST(0 AS BIGINT) AS n_comments
FROM customer
UNION ALL
SELECT 'Customer', 'Address', count(*), count(DISTINCT 'C' || c_custkey),
       min('CITY_' || c_nationkey), max('CITY_' || c_nationkey), 0, 0
FROM customer
UNION ALL
SELECT 'Customer', 'Acctbal', count(*), count(DISTINCT 'C' || c_custkey),
       min(CAST(CAST(c_acctbal AS DECIMAL(12,2)) AS VARCHAR)),
       max(CAST(CAST(c_acctbal AS DECIMAL(12,2)) AS VARCHAR)), 0, 0
FROM customer
UNION ALL
SELECT 'Customer', 'Segment', count(*), count(DISTINCT 'C' || c_custkey),
       min(c_mktsegment), max(c_mktsegment), 0, 0
FROM customer
UNION ALL
SELECT 'Nation', 'RegionKey', count(*), count(DISTINCT n_name),
       min(CAST(n_regionkey AS VARCHAR)), max(CAST(n_regionkey AS VARCHAR)),
       count(*), count(*)
FROM nation
UNION ALL
SELECT 'Region', 'Comment', count(*), count(DISTINCT r_name),
       min('area ' || r_regionkey), max('area ' || r_regionkey), 0, 0
FROM region
"""

QUERIES["ace_datasource_scan"] = q_ace_datasource_scan
ORACLES["ace_datasource_scan"] = ORACLE_ACE_DATASOURCE

# the format plugin's STREAMING entry point shares the same oracle (the
# profile must be identical whether the dump dir is read batch or stream);
# registered here because the oracle constant lives below the streaming
# module's import point
from .queries_streaming import q_ace_datasource_stream  # noqa: E402

QUERIES["ace_datasource_stream"] = q_ace_datasource_stream
ORACLES["ace_datasource_stream"] = ORACLE_ACE_DATASOURCE


def q_dedup_audio_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio dedup under the exact gate: per nation, a base clip (400
    deterministic samples @ 8 kHz) and a 2×-amplified re-encode of the
    same clip flow through decode → windowed-energy fingerprint
    (binary_ops.audio_fingerprint — 15 adjacent-energy-comparison bits,
    amplitude-invariant by construction), then exact-match grouping on
    the print: each amplified copy collapses onto its original.  The
    oracle recomputes every energy comparison from the sample formula in
    SQL (the ×2 variant scales all energies by 4, so its bits are the
    SAME rows — planted-duplicate semantics proven, not assumed).
    Scale: prints are 8 bytes; grouping shuffles (fingerprint, id) only."""
    from collections.abc import Iterator as _It
    import struct as _struct

    import pandas as _pd

    from .multimodal.binary_ops import audio_fingerprint, encode_wav_pcm16

    nat = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").cast("long").alias("k")
    )

    def gen(batches: _It[_pd.DataFrame]) -> _It[_pd.DataFrame]:
        for pdf in batches:
            rows = []
            for kk in pdf["k"]:
                k = int(kk)
                base = [((n * (37 + k)) % 2001) - 1000 for n in range(400)]
                for variant, gain in ((0, 1), (1, 2)):
                    frames = _struct.pack(
                        "<400h", *[gain * s for s in base]
                    )
                    rows.append(
                        (k + 1000 * variant, encode_wav_pcm16(8000, frames))
                    )
            yield _pd.DataFrame(rows, columns=["media_id", "payload"])

    media = nat.mapInPandas(gen, "media_id LONG, payload BINARY")
    prints = audio_fingerprint(media, window=25)
    return prints.groupBy("fingerprint").agg(
        F.count(F.lit(1)).alias("n_clips"),
        F.min("media_id").alias("min_id"),
        F.max("media_id").alias("max_id"),
        F.sum("media_id").alias("id_sum"),
    )


ORACLE_DEDUP_AUDIO_FP = """
WITH samples AS (
  SELECT n_nationkey AS k, n,
         ((n * (37 + n_nationkey)) % 2001) - 1000 AS s
  FROM nation, generate_series(0, 399) g(n)
), energies AS (
  SELECT k, CAST(floor(n / 25) AS BIGINT) AS w, sum(s * s) AS e
  FROM samples GROUP BY 1, 2
), bits AS (
  SELECT a.k, a.w,
         CASE WHEN b.e > a.e THEN CAST(1 AS BIGINT) << CAST(a.w AS INT)
              ELSE 0 END AS bit
  FROM energies a JOIN energies b ON a.k = b.k AND b.w = a.w + 1
), fp AS (
  SELECT k, CAST(sum(bit) AS BIGINT) AS fingerprint FROM bits GROUP BY k
), clips AS (
  SELECT k + 1000 * v.variant AS media_id, fingerprint
  FROM fp, (VALUES (0), (1)) v(variant)
)
SELECT fingerprint, count(*) AS n_clips,
       min(media_id) AS min_id, max(media_id) AS max_id,
       CAST(sum(media_id) AS BIGINT) AS id_sum
FROM clips GROUP BY fingerprint
"""

QUERIES["dedup_audio_fingerprint"] = q_dedup_audio_fingerprint
ORACLES["dedup_audio_fingerprint"] = ORACLE_DEDUP_AUDIO_FP


def q_ace_datasource_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Format symmetry for S4: records parsed from the dump are written
    BACK through ``spark.write.format("ace")`` (the Python DataSource
    writer — per-partition gzip dump files, ``-O``/``-C`` annotations
    re-emitted, quote escaping) and re-read through the same format; the
    profile of the re-read records must match the oracle computed from
    the generating tables.  Write → parse is the inverse pair the
    migration engine owes its users: Datomic-side edits can be exported
    back to ``.ace`` interchange files."""
    import os

    from .queries_e2e import _ensure_ace_dump, _fx
    from .sources import ace_datasource

    ace_datasource.register(spark)
    dump = _ensure_ace_dump(spark, sf_dir)
    out = _fx(sf_dir, "ace_roundtrip_sink")
    if not os.path.exists(os.path.join(out, "_SUCCESS")):
        recs = spark.read.format("ace").load(dump)
        recs.repartition(8, "obj_id").write.format("ace").mode(
            "overwrite"
        ).save(out)
    back = spark.read.format("ace").load(out)
    return (
        back.select(
            "class",
            F.element_at("tag_path", 1).alias("tag"),
            "obj_id",
            "value",
            "ts",
            "comment",
        )
        .groupBy("class", "tag")
        .agg(
            F.count(F.lit(1)).alias("n_records"),
            F.countDistinct("obj_id").alias("n_objs"),
            F.min("value").alias("min_v"),
            F.max("value").alias("max_v"),
            F.sum(F.col("ts").isNotNull().cast("long")).alias("n_ts"),
            F.sum(F.col("comment").isNotNull().cast("long")).alias(
                "n_comments"
            ),
        )
    )


QUERIES["ace_datasource_roundtrip"] = q_ace_datasource_roundtrip
ORACLES["ace_datasource_roundtrip"] = ORACLE_ACE_DATASOURCE


def q_multimodal_tiff_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL TIFF container parsing under the exact gate: per-nation
    TIFF headers alternate LITTLE and BIG endian (``II``/``MM``) with
    formula-driven dimensions; the parser (multimodal/tiff_meta.py)
    resolves the byte-order mark, walks the IFD, and reads
    SHORT-in-4-byte-slot values — both classic traps.  The oracle
    recomputes every field from the generation formulas."""
    from collections.abc import Iterator as _It

    import pandas as _pd

    from .multimodal.tiff_meta import decode_tiff_meta, encode_tiff_header

    nat = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").cast("long").alias("media_id")
    )

    def run(batches: _It[_pd.DataFrame]) -> _It[_pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid in pdf["media_id"]:
                k = int(mid)
                payload = encode_tiff_header(
                    width=100 + 3 * k,
                    height=50 + 2 * k,
                    bits_per_sample=8,
                    samples_per_pixel=3,
                    compression=1 + 4 * (k % 2),
                    big_endian=(k % 2 == 1),
                )
                m = decode_tiff_meta(payload)
                rows.append(
                    (
                        k,
                        m["width"],
                        m["height"],
                        m["bits_per_sample"],
                        m["samples_per_pixel"],
                        m["compression"],
                        m["big_endian"],
                    )
                )
            yield _pd.DataFrame(
                rows,
                columns=[
                    "media_id", "width", "height", "bits", "spp",
                    "compression", "big_endian",
                ],
            )

    return nat.mapInPandas(
        run,
        "media_id LONG, width INT, height INT, bits INT, spp INT, "
        "compression INT, big_endian BOOLEAN",
    )


ORACLE_MULTIMODAL_TIFF = """
SELECT CAST(n_nationkey AS BIGINT) AS media_id,
       CAST(100 + 3 * n_nationkey AS INTEGER) AS width,
       CAST(50 + 2 * n_nationkey AS INTEGER) AS height,
       CAST(8 AS INTEGER) AS bits,
       CAST(3 AS INTEGER) AS spp,
       CAST(1 + 4 * (n_nationkey % 2) AS INTEGER) AS compression,
       n_nationkey % 2 = 1 AS big_endian
FROM nation
"""

QUERIES["multimodal_tiff_meta"] = q_multimodal_tiff_meta
ORACLES["multimodal_tiff_meta"] = ORACLE_MULTIMODAL_TIFF


def q_multimodal_mp3_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL MP3/ID3v2 triage under the exact gate: per-nation fixtures
    carry an ID3v2 tag whose SYNCSAFE 4×7-bit size must be decoded to
    find the first MPEG-1 Layer III frame header, whose bitrate and
    sample-rate indexes resolve through the public tables
    (multimodal/mp3_meta.py).  The oracle replays the syncsafe
    arithmetic and the table lookups in SQL."""
    from collections.abc import Iterator as _It

    import pandas as _pd

    from .multimodal.mp3_meta import decode_mp3_meta, encode_mp3_fixture

    nat = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").cast("long").alias("media_id")
    )

    def run(batches: _It[_pd.DataFrame]) -> _It[_pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid in pdf["media_id"]:
                k = int(mid)
                payload = encode_mp3_fixture(
                    id3_size=200 + (k * 37) % 20000,
                    bitrate_idx=1 + k % 14,
                    samplerate_idx=k % 3,
                    mono=(k % 2 == 0),
                )
                m = decode_mp3_meta(payload)
                rows.append(
                    (
                        k,
                        m["id3_size"],
                        m["bitrate_kbps"],
                        m["sample_rate"],
                        m["mono"],
                    )
                )
            yield _pd.DataFrame(
                rows,
                columns=[
                    "media_id", "id3_size", "bitrate_kbps", "sample_rate",
                    "mono",
                ],
            )

    return nat.mapInPandas(
        run,
        "media_id LONG, id3_size INT, bitrate_kbps INT, "
        "sample_rate INT, mono BOOLEAN",
    )


ORACLE_MULTIMODAL_MP3 = """
WITH br(idx, kbps) AS (VALUES
  (1,32),(2,40),(3,48),(4,56),(5,64),(6,80),(7,96),(8,112),(9,128),
  (10,160),(11,192),(12,224),(13,256),(14,320)
), sr(idx, hz) AS (VALUES (0,44100),(1,48000),(2,32000))
SELECT CAST(n_nationkey AS BIGINT) AS media_id,
       CAST(200 + (n_nationkey * 37) % 20000 AS INTEGER) AS id3_size,
       CAST(br.kbps AS INTEGER) AS bitrate_kbps,
       CAST(sr.hz AS INTEGER) AS sample_rate,
       n_nationkey % 2 = 0 AS mono
FROM nation
JOIN br ON br.idx = 1 + n_nationkey % 14
JOIN sr ON sr.idx = n_nationkey % 3
"""

QUERIES["multimodal_mp3_meta"] = q_multimodal_mp3_meta
ORACLES["multimodal_mp3_meta"] = ORACLE_MULTIMODAL_MP3


def q_datalog_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Datalog compiler reading the four-index STORE instead of an
    in-memory datom frame: each pattern clause binds a constant
    attribute, the compiler emits the equality filter, and because the
    AEVT layout hive-partitions by ``a``, Catalyst turns every clause
    into a one-directory pruned scan (PartitionFilters plan-guarded) —
    the join of Datomic's "index per access path" storage with the
    declarative query surface.  Orders-per-segment through the ref
    attribute, entity/value unification across the string boundary
    handled by the compiler."""
    from . import datalog

    root = _ensure_index_store(spark, sf_dir)
    datoms = spark.read.parquet(f"{root}/aevt").select("e", "a", "v")
    return datalog.query(
        datoms,
        find=["?seg", "(count ?o)"],
        where=[
            ["?o", "order/customer", "?c"],
            ["?c", "cust/segment", "?seg"],
        ],
    )


ORACLE_DATALOG_INDEXED = """
SELECT c_mktsegment AS seg, count(DISTINCT o_orderkey + 10000000) AS count_o
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
"""

QUERIES["datalog_indexed"] = q_datalog_indexed
ORACLES["datalog_indexed"] = ORACLE_DATALOG_INDEXED
