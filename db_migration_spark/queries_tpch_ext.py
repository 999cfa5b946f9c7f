"""Hard relational patterns (TPC-H-shaped) and engine-surface extensions.

Round-1 coverage had Q1/Q3/Q5/Q6/Q12; this module adds the remaining
patterns a relational engine must express — EXISTS / NOT EXISTS semi- and
anti-joins on the same fact table, correlated scalar subqueries
(decorrelated to aggregate joins), HAVING + join-back, argmax-vs-max
scalar subqueries, disjunctive multi-range predicates, two-role dimension
joins, distribution windows (ntile/percent_rank/cume_dist), GROUPING
SETS, schema-harmonizing unions — each adapted to the columns the test
tables actually have (no partsupp / commitdate / receiptdate / phone in
TESTDATA.md, so predicates are re-anchored on shipdate-vs-orderdate
lateness while keeping the plan shape) — plus engine-surface extensions
under the same exact-oracle discipline: order-statistic winsorization,
datom-level store diff, percent-of-total shares, event-sequence funnels,
co-purchase triangle counting, streaming-pillar batch twins, and
versioned-snapshot time travel.

Spark-first notes per query are in the docstrings; the shared
determinism rules (decimal-exact money sums, unique tiebreaks in top-k,
identical aliases in both engines) are described in queries.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .catalog import load_table
from .operators import relational

def _rev():
    """Decimal-exact extended revenue term (built lazily — Column
    construction needs an active SparkContext)."""
    return (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(18,4)"
    )


# ---------------------------------------------------------------------------
# Q4 shape — EXISTS → left-semi join, no fact duplication
# ---------------------------------------------------------------------------


def q_q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders-per-priority for one quarter where EXISTS a line shipped
    after the order date.  The EXISTS decorrelates to a left-semi join:
    the orders side is never duplicated by multi-line matches, so the
    count needs no pre-distinct.  Both filters sit below the join and
    reach the parquet scans."""
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1996-04-01"))
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = orders.join(
        li,
        (F.col("o_orderkey") == F.col("l_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("order_count")
    )


ORACLE_Q4 = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders o
WHERE o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1996-04-01'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_shipdate > o.o_orderdate)
GROUP BY o_orderpriority
"""


# ---------------------------------------------------------------------------
# Q7 shape — one dimension table in two roles (supplier vs customer nation)
# ---------------------------------------------------------------------------


def q_q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bilateral trade volume between two nations by ship year.  nation
    joins twice under different aliases (supplier side / customer side),
    both broadcast; the pair filter is a symmetric OR evaluated after
    both roles resolve — one shuffle total (the final groupBy)."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1998-01-01"))
    )
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    customer = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    supplier = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey"
    )
    n1 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_7") & (F.col("cust_nation") == "NATION_3")
    ) | ((F.col("supp_nation") == "NATION_3") & (F.col("cust_nation") == "NATION_7"))
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("sn_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("cn_key"))
        .filter(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(F.sum(_rev()).cast("double").alias("revenue"))
    )


ORACLE_Q7 = """
SELECT supp_nation, cust_nation, l_year,
       CAST(sum(CAST(volume AS DECIMAL(18,4))) AS DOUBLE) AS revenue
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         EXTRACT(year FROM l_shipdate) AS l_year,
         l_extendedprice * (1 - l_discount) AS volume
  FROM lineitem
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate < TIMESTAMP '1998-01-01'
    AND ((n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3')
      OR (n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7'))
) t
GROUP BY supp_nation, cust_nation, l_year
"""


# ---------------------------------------------------------------------------
# Q10 shape — returned-item revenue ranking (join + agg + top-k)
# ---------------------------------------------------------------------------


def q_q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 customers by revenue lost to returns in one quarter.  The
    orders date filter prunes the fact join; nation broadcasts; top-k is
    TakeOrderedAndProject with c_custkey as the unique tiebreak."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-07-01"))
        & (F.col("o_orderdate") < F.lit("1996-10-01"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    )
    nation = load_table(spark, sf_dir, "nation")
    agg = (
        customer.join(orders, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(
            F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey")
        )
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.sum(_rev()).cast("double").alias("revenue"))
    )
    return relational.top_k(agg, [F.desc("revenue"), F.col("c_custkey")], 20)


ORACLE_Q10 = """
SELECT c_custkey, c_name, c_acctbal, n_name,
       CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE o_orderdate >= TIMESTAMP '1996-07-01'
  AND o_orderdate < TIMESTAMP '1996-10-01'
  AND l_returnflag = 'R'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


# ---------------------------------------------------------------------------
# Q14 shape — conditional revenue share in one pass
# ---------------------------------------------------------------------------


def q_q14_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Promo revenue share for one month: both CASE branches fold into a
    single aggregate pass over the part⋈lineitem join (part broadcasts).
    Division happens once, on the exact decimal sums, at the very end."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-09-01"))
        & (F.col("l_shipdate") < F.lit("1996-10-01"))
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    joined = li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
    promo = F.when(F.col("p_type") == "PROMO", _rev()).otherwise(
        F.lit(0).cast("decimal(18,4)")
    )
    return joined.agg(
        (
            F.sum(promo).cast("double") * 100 / F.sum(_rev()).cast("double")
        ).alias("promo_revenue_pct")
    )


ORACLE_Q14 = """
SELECT CAST(sum(CASE WHEN p_type = 'PROMO'
                THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))
                ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE) * 100
       / CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE)
       AS promo_revenue_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-09-01'
  AND l_shipdate < TIMESTAMP '1996-10-01'
"""


# ---------------------------------------------------------------------------
# Q15 shape — argmax via scalar subquery (revenue = max(revenue))
# ---------------------------------------------------------------------------


def q_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier(s) whose quarterly revenue equals the maximum.  The max
    is a one-row aggregate broadcast back over the revenue relation —
    Spark's decorrelated form of the scalar subquery; no global sort, no
    second scan of lineitem (the revenue relation is reused for both
    sides of the comparison)."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1996-04-01"))
    )
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(_rev()).alias("rev_dec")
    )
    top = revenue.agg(F.max("rev_dec").alias("max_rev"))
    supplier = load_table(spark, sf_dir, "supplier")
    return (
        revenue.join(F.broadcast(top), F.col("rev_dec") == F.col("max_rev"))
        .join(
            F.broadcast(supplier), F.col("supplier_no") == F.col("s_suppkey")
        )
        .select(
            "s_suppkey",
            "s_name",
            F.col("rev_dec").cast("double").alias("total_revenue"),
        )
    )


ORACLE_Q15 = """
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS rev_dec
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate < TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, CAST(rev_dec AS DOUBLE) AS total_revenue
FROM revenue JOIN supplier ON supplier_no = s_suppkey
WHERE rev_dec = (SELECT max(rev_dec) FROM revenue)
"""


# ---------------------------------------------------------------------------
# Q17 shape — correlated scalar AVG, decorrelated to a per-key aggregate join
# ---------------------------------------------------------------------------


def q_q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue from small-quantity lines of one brand: the correlated
    ``l_quantity < 0.2 * avg(quantity per part)`` rewrites to a per-part
    aggregate joined back to the fact.  The comparison is kept exact and
    division-free — ``5 * cnt * qty < sum_qty`` on decimals — so the
    predicate can never flip on engine-specific float rounding.  Brand
    filter prunes both the aggregate input and the probe side."""
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_brand") == "Brand#23"
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    brand_lines = li.join(
        F.broadcast(part.select("p_partkey")),
        F.col("l_partkey") == F.col("p_partkey"),
    )
    per_part = brand_lines.groupBy(F.col("l_partkey").alias("agg_partkey")).agg(
        F.sum(F.col("l_quantity").cast("decimal(12,2)")).alias("sum_qty"),
        F.count(F.lit(1)).alias("cnt_qty"),
    )
    small = brand_lines.join(
        F.broadcast(per_part), F.col("l_partkey") == F.col("agg_partkey")
    ).filter(
        F.col("l_quantity").cast("decimal(12,2)") * 5 * F.col("cnt_qty")
        < F.col("sum_qty")
    )
    return small.agg(
        (
            F.sum(F.col("l_extendedprice").cast("decimal(18,4)")).cast("double")
            / 7
        ).alias("avg_yearly")
    )


ORACLE_Q17 = """
WITH brand_lines AS (
  SELECT l_partkey, l_quantity, l_extendedprice
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_brand = 'Brand#23'
), per_part AS (
  SELECT l_partkey AS agg_partkey,
         sum(CAST(l_quantity AS DECIMAL(12,2))) AS sum_qty,
         count(*) AS cnt_qty
  FROM brand_lines GROUP BY l_partkey
)
SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) / 7 AS avg_yearly
FROM brand_lines JOIN per_part ON l_partkey = agg_partkey
WHERE CAST(l_quantity AS DECIMAL(12,2)) * 5 * cnt_qty < sum_qty
"""


# ---------------------------------------------------------------------------
# Q18 shape — HAVING on a fact aggregate, joined back to dimensions
# ---------------------------------------------------------------------------


def q_q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders whose total quantity exceeds a threshold, with customer
    context.  The HAVING filter runs on the per-order aggregate BEFORE
    the join-back, so only qualifying orderkeys (a tiny set) flow into
    the dimension joins — Spark broadcasts them automatically under AQE."""
    li = load_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(12,2)")).alias("sum_qty_dec"))
        .filter(F.col("sum_qty_dec") > 250)
    )
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    return (
        big.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            "o_totalprice",
            F.col("sum_qty_dec").cast("double").alias("sum_qty"),
        )
    )


ORACLE_Q18 = """
SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
       CAST(sum_qty_dec AS DOUBLE) AS sum_qty
FROM (
  SELECT l_orderkey, sum(CAST(l_quantity AS DECIMAL(12,2))) AS sum_qty_dec
  FROM lineitem GROUP BY l_orderkey HAVING sum_qty_dec > 250
) big
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
"""


# ---------------------------------------------------------------------------
# Q19 shape — disjunction of conjunctive range predicates, single scan
# ---------------------------------------------------------------------------


def q_q19_disjunctive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue under an OR of three brand/size/quantity range bundles.
    All three disjuncts evaluate in one pass over the broadcast
    part⋈lineitem join — the common ``l_partkey = p_partkey`` conjunct
    stays an equi-join key (no fallback to nested-loop), and the OR
    collapses into the join's residual filter."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    part = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_brand", "p_size"
    )
    j = li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
    d1 = (
        (F.col("p_brand") == "Brand#12")
        & F.col("p_size").between(1, 5)
        & F.col("l_quantity").between(1, 11)
    )
    d2 = (
        (F.col("p_brand") == "Brand#23")
        & F.col("p_size").between(1, 10)
        & F.col("l_quantity").between(10, 20)
    )
    d3 = (
        (F.col("p_brand") == "Brand#34")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(20, 30)
    )
    return j.filter(d1 | d2 | d3).agg(
        F.sum(_rev()).cast("double").alias("revenue")
    )


ORACLE_Q19 = """
SELECT CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5  AND l_quantity BETWEEN 1  AND 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 20 AND 30)
"""


# ---------------------------------------------------------------------------
# Q21 shape — EXISTS + NOT EXISTS against the same fact table
# ---------------------------------------------------------------------------


def q_q21_sole_late_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers from one nation who were the ONLY late supplier on a
    multi-supplier order (late = shipped >60 days after the order date).
    The EXISTS (another supplier) / NOT EXISTS (another LATE supplier)
    pair decorrelates into one per-order aggregate — distinct supplier
    count and distinct late-supplier count — computed in a single
    shuffle, then joined back to the candidate lines; no self-join of
    lineitem against itself twice."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate"
    )
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_suppkey", "l_shipdate")
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .withColumn(
            "is_late",
            (
                # INTERVAL keeps any time-of-day component; date_add
                # would truncate to midnight and disagree with the
                # oracle's o_orderdate + INTERVAL 60 DAY
                F.col("l_shipdate")
                > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
            ).cast("int"),
        )
    )
    per_order = li.groupBy(F.col("l_orderkey").alias("agg_orderkey")).agg(
        F.countDistinct("l_suppkey").alias("n_supps"),
        F.countDistinct(F.when(F.col("is_late") == 1, F.col("l_suppkey"))).alias(
            "n_late_supps"
        ),
    )
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name") == "NATION_5"
    )
    candidates = (
        li.filter(F.col("is_late") == 1)
        .select("l_orderkey", "l_suppkey")
        .distinct()
        .join(
            per_order,
            (F.col("l_orderkey") == F.col("agg_orderkey"))
            & (F.col("n_supps") > 1)
            & (F.col("n_late_supps") == 1),
        )
    )
    return (
        candidates.join(
            F.broadcast(
                supplier.join(
                    F.broadcast(nation),
                    F.col("s_nationkey") == F.col("n_nationkey"),
                )
            ),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


ORACLE_Q21 = """
WITH li AS (
  SELECT l_orderkey, l_suppkey,
         CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY THEN 1 ELSE 0 END AS is_late
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
), per_order AS (
  SELECT l_orderkey AS agg_orderkey,
         count(DISTINCT l_suppkey) AS n_supps,
         count(DISTINCT CASE WHEN is_late = 1 THEN l_suppkey END) AS n_late_supps
  FROM li GROUP BY l_orderkey
), candidates AS (
  SELECT DISTINCT l_orderkey, l_suppkey FROM li WHERE is_late = 1
)
SELECT s_name, count(*) AS numwait
FROM candidates
JOIN per_order ON l_orderkey = agg_orderkey AND n_supps > 1 AND n_late_supps = 1
JOIN supplier  ON l_suppkey = s_suppkey
JOIN nation    ON s_nationkey = n_nationkey
WHERE n_name = 'NATION_5'
GROUP BY s_name
"""


# ---------------------------------------------------------------------------
# Q22 shape — scalar-subquery threshold + NOT EXISTS anti-join
# ---------------------------------------------------------------------------


def q_q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Well-funded customers with no orders, by market segment: acctbal
    above the all-positive-balance average (a one-row aggregate broadcast
    — the decorrelated scalar subquery) and NOT EXISTS orders (left-anti
    join).  The average comparison is division-free on decimals
    (``bal * n > total``), immune to float-rounding disagreement."""
    customer = load_table(spark, sf_dir, "customer")
    seg = F.col("c_mktsegment").isin("BUILDING", "MACHINERY", "HOUSEHOLD")
    pos = customer.filter(seg & (F.col("c_acctbal") > 0))
    thresh = pos.agg(
        F.sum(F.col("c_acctbal").cast("decimal(14,2)")).alias("bal_sum"),
        F.count(F.lit(1)).alias("bal_n"),
    )
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("2000-01-01"))
        .select("o_custkey")
    )
    return (
        customer.filter(seg)
        .join(F.broadcast(thresh))
        .filter(
            F.col("c_acctbal").cast("decimal(14,2)") * F.col("bal_n")
            > F.col("bal_sum")
        )
        .join(orders, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(F.col("c_acctbal").cast("decimal(14,2)"))
            .cast("double")
            .alias("totacctbal"),
        )
    )


ORACLE_Q22 = """
WITH thresh AS (
  SELECT sum(CAST(c_acctbal AS DECIMAL(14,2))) AS bal_sum, count(*) AS bal_n
  FROM customer
  WHERE c_mktsegment IN ('BUILDING', 'MACHINERY', 'HOUSEHOLD') AND c_acctbal > 0
)
SELECT c_mktsegment, count(*) AS numcust,
       CAST(sum(CAST(c_acctbal AS DECIMAL(14,2))) AS DOUBLE) AS totacctbal
FROM customer, thresh
WHERE c_mktsegment IN ('BUILDING', 'MACHINERY', 'HOUSEHOLD')
  AND CAST(c_acctbal AS DECIMAL(14,2)) * bal_n > bal_sum
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= TIMESTAMP '2000-01-01')
GROUP BY c_mktsegment
"""


# ---------------------------------------------------------------------------
# Q13 shape — left-outer join + count-of-counts histogram
# ---------------------------------------------------------------------------


def q_q13_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer order-count distribution: every customer left-outer joined
    to its non-urgent orders, counted per customer (0 for order-less
    customers — the reason an inner join is wrong here), then the
    count-of-counts histogram.  Two hash aggregations back-to-back; the
    second one's key space (distinct order counts) is tiny, so the plan
    is one real shuffle plus a cheap final exchange.  At 100 TB the
    left-outer join co-locates on ``custkey`` bucketing and the histogram
    never materializes per-customer rows driver-side."""
    customer = load_table(spark, sf_dir, "customer").select("c_custkey")
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") != "1-URGENT")
        .select("o_custkey", "o_orderkey")
    )
    per_cust = (
        customer.join(
            orders, F.col("c_custkey") == F.col("o_custkey"), "left_outer"
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
    )


ORACLE_Q13 = """
SELECT c_count, count(*) AS custdist
FROM (
  SELECT c.c_custkey, count(o.o_orderkey) AS c_count
  FROM customer c LEFT OUTER JOIN orders o
    ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
  GROUP BY c.c_custkey
) pc
GROUP BY c_count
"""


def register(queries: dict, oracles: dict) -> None:
    queries.update(
        {
            "q4_order_priority": q_q4_order_priority,
            "q7_nation_volume": q_q7_nation_volume,
            "q10_returned_items": q_q10_returned_items,
            "q14_promo_share": q_q14_promo_share,
            "q15_top_supplier": q_q15_top_supplier,
            "q17_small_qty_revenue": q_q17_small_qty_revenue,
            "q18_large_orders": q_q18_large_orders,
            "q19_disjunctive": q_q19_disjunctive,
            "q21_sole_late_supplier": q_q21_sole_late_supplier,
            "q22_idle_customers": q_q22_idle_customers,
            "q13_order_distribution": q_q13_order_distribution,
            "w5_distribution_ranks": q_w5_distribution_ranks,
            "a8_grouping_sets": q_a8_grouping_sets,
            "u4_union_by_name": q_u4_union_by_name,
            "user_profiles": q_user_profiles,
            "events_sliding_rollup": q_events_sliding_rollup,
            "winsorize_values": q_winsorize_values,
            "store_diff": q_store_diff,
            "w6_revenue_share": q_w6_revenue_share,
            "funnel_view_purchase": q_funnel_view_purchase,
            "copurchase_triangles": q_copurchase_triangles,
            "snapshot_time_travel": q_snapshot_time_travel,
            "q8_market_share": q_q8_market_share,
        }
    )
    oracles.update(
        {
            "q4_order_priority": ORACLE_Q4,
            "q7_nation_volume": ORACLE_Q7,
            "q10_returned_items": ORACLE_Q10,
            "q14_promo_share": ORACLE_Q14,
            "q15_top_supplier": ORACLE_Q15,
            "q17_small_qty_revenue": ORACLE_Q17,
            "q18_large_orders": ORACLE_Q18,
            "q19_disjunctive": ORACLE_Q19,
            "q21_sole_late_supplier": ORACLE_Q21,
            "q22_idle_customers": ORACLE_Q22,
            "q13_order_distribution": ORACLE_Q13,
            "w5_distribution_ranks": ORACLE_W5,
            "a8_grouping_sets": ORACLE_A8,
            "u4_union_by_name": ORACLE_U4,
            "user_profiles": ORACLE_USER_PROFILES,
            "events_sliding_rollup": ORACLE_SLIDING,
            "winsorize_values": ORACLE_WINSORIZE,
            "store_diff": ORACLE_STORE_DIFF,
            "w6_revenue_share": ORACLE_W6,
            "funnel_view_purchase": ORACLE_FUNNEL,
            "copurchase_triangles": ORACLE_TRIANGLES,
            "snapshot_time_travel": ORACLE_TIME_TRAVEL,
            "q8_market_share": ORACLE_Q8,
        }
    )


# ---------------------------------------------------------------------------
# Window distribution functions / grouping sets / union harmonization
# ---------------------------------------------------------------------------


def q_w5_distribution_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions over one shared exchange: decile
    (ntile), percent_rank and cume_dist of order value within each
    priority class.  The three functions ride a single Window spec
    (same partition + total order with o_orderkey tiebreak), so the plan
    has exactly one sort-exchange."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        "o_totalprice", "o_orderkey"
    )
    return orders.select(
        "o_orderkey",
        "o_orderpriority",
        F.ntile(10).over(w).alias("decile"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
    )


ORACLE_W5 = """
SELECT o_orderkey, o_orderpriority,
       ntile(10)      OVER w AS decile,
       percent_rank() OVER w AS pct_rank,
       cume_dist()    OVER w AS cume
FROM orders
WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)
"""


def q_a8_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arbitrary GROUPING SETS — (priority, status), (priority), (status),
    () — with grouping_id to disambiguate the null-filled superaggregate
    rows.  One Expand + one hash aggregate, the same physical shape as
    rollup/cube but with a user-chosen lattice subset."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupingSets(
            [
                ["o_orderpriority", "o_orderstatus"],
                ["o_orderpriority"],
                ["o_orderstatus"],
                [],
            ],
            "o_orderpriority",
            "o_orderstatus",
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_price"),
            F.grouping_id().cast("long").alias("gid"),
        )
    )


ORACLE_A8 = """
SELECT o_orderpriority, o_orderstatus,
       count(*) AS n_orders,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price,
       CAST(grouping(o_orderpriority) * 2 + grouping(o_orderstatus) AS BIGINT) AS gid
FROM orders
GROUP BY GROUPING SETS ((o_orderpriority, o_orderstatus), (o_orderpriority),
                        (o_orderstatus), ())
"""


def q_u4_union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-harmonizing union: customers and suppliers merge into one
    party dimension by COLUMN NAME with missing columns null-filled
    (unionByName allowMissingColumns) — positional union would silently
    misalign; this is the engine's heterogeneous-source append path."""
    customer = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("party_id"),
        F.col("c_name").alias("name"),
        F.col("c_nationkey").cast("long").alias("nationkey"),
        F.col("c_acctbal").alias("acctbal"),
        F.col("c_mktsegment").alias("mktsegment"),
        F.lit("customer").alias("party_kind"),
    )
    supplier = load_table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("party_id"),
        F.col("s_name").alias("name"),
        F.col("s_nationkey").cast("long").alias("nationkey"),
        F.col("s_acctbal").alias("acctbal"),
        F.lit("supplier").alias("party_kind"),
    )
    return customer.unionByName(supplier, allowMissingColumns=True)


ORACLE_U4 = """
SELECT c_custkey AS party_id, c_name AS name,
       CAST(c_nationkey AS BIGINT) AS nationkey, c_acctbal AS acctbal,
       c_mktsegment AS mktsegment, 'customer' AS party_kind
FROM customer
UNION ALL
SELECT s_suppkey, s_name, CAST(s_nationkey AS BIGINT), s_acctbal,
       NULL, 'supplier'
FROM supplier
"""


# ---------------------------------------------------------------------------
# Streaming-pillar batch twins: per-user profiles, sliding-window rollup
# ---------------------------------------------------------------------------


def q_user_profiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the custom stateful streaming operator
    (streaming/stateful.py user_profiles — applyInPandasWithState): the
    per-user profile the stream maintains incrementally, computed here as
    one hash aggregate so the oracle gate pins the target semantics the
    stateful operator's tests compare against."""
    events = load_table(spark, sf_dir, "events")
    return events.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,6)"))
        .cast("double")
        .alias("sum_value"),
        F.min("ts").alias("first_seen"),
        F.max("ts").alias("last_seen"),
        F.countDistinct("event_type").cast("long").alias("n_event_types"),
    )


ORACLE_USER_PROFILES = """
SELECT user_id,
       count(*) AS n_events,
       CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value,
       min(ts) AS first_seen,
       max(ts) AS last_seen,
       CAST(count(DISTINCT event_type) AS BIGINT) AS n_event_types
FROM events
GROUP BY user_id
"""


def q_events_sliding_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window rollup (1 h window, 30 min slide): each event lands
    in exactly two windows; Spark's ``window()`` expands them JVM-side
    (an Expand node — no explode of hand-built arrays, no UDF).  The
    oracle replays the same assignment by unioning the two half-hour
    aligned window starts per event."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(
            F.window("ts", "1 hour", "30 minutes").alias("win"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)"))
            .cast("double")
            .alias("sum_value"),
        )
        .select(
            F.col("win.start").alias("win_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


ORACLE_SLIDING = """
WITH assigned AS (
  SELECT time_bucket(INTERVAL 30 MINUTE, ts) AS win_start, event_type, value
  FROM events
  UNION ALL
  SELECT time_bucket(INTERVAL 30 MINUTE, ts) - INTERVAL 30 MINUTE, event_type, value
  FROM events
)
SELECT win_start, event_type,
       count(*) AS n_events,
       CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
FROM assigned
GROUP BY win_start, event_type
"""


# ---------------------------------------------------------------------------
# Winsorization — order-statistic outlier clipping (data-cleaning pass)
# ---------------------------------------------------------------------------


def q_winsorize_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clip event values to their per-type [p05, p95] ORDER STATISTICS
    (rank ceil(q·n), an existing element — no interpolation arithmetic,
    so both engines pick the identical double) and report clip counts and
    the clipped decimal sum.  One ranking window + a broadcast bounds
    join — the standard outlier-trim pass before metric aggregation.

    Scale note: ranking within event_type concentrates each type's rows
    in one task; with few huge groups the 100 TB path swaps the window
    for ``approx_percentile`` bounds (one pass, mergeable sketches) —
    the exact order statistic here is what makes the oracle gate exact."""
    ev = load_table(spark, sf_dir, "events").select("event_type", "value")
    w = Window.partitionBy("event_type").orderBy("value")
    ranked = ev.withColumn("rnk", F.row_number().over(w)).withColumn(
        "n", F.count(F.lit(1)).over(Window.partitionBy("event_type"))
    )
    lo_rank = F.greatest(F.ceil(F.col("n") * 0.05), F.lit(1).cast("long"))
    hi_rank = F.ceil(F.col("n") * 0.95)
    bounds = (
        ranked.filter((F.col("rnk") == lo_rank) | (F.col("rnk") == hi_rank))
        .groupBy("event_type")
        .agg(
            F.min(F.when(F.col("rnk") == lo_rank, F.col("value"))).alias("lo"),
            F.max(F.when(F.col("rnk") == hi_rank, F.col("value"))).alias("hi"),
        )
    )
    clipped = ev.join(F.broadcast(bounds), "event_type").select(
        "event_type",
        F.greatest(F.col("lo"), F.least(F.col("hi"), F.col("value"))).alias(
            "cv"
        ),
        (F.col("value") < F.col("lo")).cast("int").alias("is_lo"),
        (F.col("value") > F.col("hi")).cast("int").alias("is_hi"),
    )
    return clipped.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("is_lo").cast("long").alias("n_clipped_lo"),
        F.sum("is_hi").cast("long").alias("n_clipped_hi"),
        F.sum(F.col("cv").cast("decimal(18,6)")).cast("double").alias("sum_clipped"),
    )


ORACLE_WINSORIZE = """
WITH ranked AS (
  SELECT event_type, value,
         row_number() OVER (PARTITION BY event_type ORDER BY value) AS rnk,
         count(*)     OVER (PARTITION BY event_type) AS n
  FROM events
), bounds AS (
  SELECT event_type,
         min(CASE WHEN rnk = greatest(CAST(ceil(n * 0.05) AS BIGINT), 1) THEN value END) AS lo,
         max(CASE WHEN rnk = CAST(ceil(n * 0.95) AS BIGINT) THEN value END) AS hi
  FROM ranked GROUP BY event_type
)
SELECT e.event_type,
       count(*) AS n_events,
       CAST(sum(CASE WHEN e.value < b.lo THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped_lo,
       CAST(sum(CASE WHEN e.value > b.hi THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped_hi,
       CAST(sum(CAST(greatest(b.lo, least(b.hi, e.value)) AS DECIMAL(18,6))) AS DOUBLE) AS sum_clipped
FROM events e JOIN bounds b ON e.event_type = b.event_type
GROUP BY e.event_type
"""


def q_store_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Datom-level snapshot diff (operators/eav.py store_diff): events
    split into before/after stores by transaction parity (the x4 stand-in
    convention), full-outer joined on (e, a, v), per-attribute
    added/removed/retained counts — the audit a count-level QA report
    can't provide (two swapped values keep counts identical; this
    catches them)."""
    from .operators import eav

    ev = load_table(spark, sf_dir, "events").select(
        F.col("user_id").alias("e"),
        F.col("event_type").alias("a"),
        (F.col("event_id") % 500).cast("string").alias("v"),
        (F.col("event_id") % 3).alias("__par"),
    )
    before = ev.filter(F.col("__par") != 2).select("e", "a", "v").distinct()
    after = ev.filter(F.col("__par") != 0).select("e", "a", "v").distinct()
    return eav.store_diff(before, after)


ORACLE_STORE_DIFF = """
WITH datoms AS (
  SELECT user_id AS e, event_type AS a,
         CAST(event_id % 500 AS VARCHAR) AS v, event_id % 3 AS par
  FROM events
), before_s AS (SELECT DISTINCT e, a, v, 1 AS __b FROM datoms WHERE par != 2),
   after_s  AS (SELECT DISTINCT e, a, v, 1 AS __f FROM datoms WHERE par != 0)
SELECT coalesce(b.a, f.a) AS a,
       CASE WHEN b.__b IS NOT NULL AND f.__f IS NOT NULL THEN 'retained'
            WHEN f.__f IS NOT NULL THEN 'added'
            ELSE 'removed' END AS status,
       count(*) AS n_datoms
FROM before_s b FULL OUTER JOIN after_s f
  ON b.e IS NOT DISTINCT FROM f.e
 AND b.a IS NOT DISTINCT FROM f.a
 AND b.v IS NOT DISTINCT FROM f.v
GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# Percent-of-total window aggregate; event-sequence funnel
# ---------------------------------------------------------------------------


def q_w6_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ratio-to-report: each nation's share of its region's customer
    deposits — a window SUM over the partition dividing the row value.
    The denominator rides the same exchange as the grouping (no second
    scan, no collect); division happens once per output row on exact
    decimal sums cast to double."""
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    per_nation = (
        customer.join(
            F.broadcast(nation), customer.c_nationkey == nation.n_nationkey
        )
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(
            F.sum(F.col("c_acctbal").cast("decimal(14,2)")).alias("bal_dec")
        )
    )
    w = Window.partitionBy("r_name")
    return per_nation.select(
        "r_name",
        "n_name",
        F.col("bal_dec").cast("double").alias("nation_bal"),
        (
            F.col("bal_dec").cast("double")
            / F.sum("bal_dec").over(w).cast("double")
        ).alias("share"),
    )


ORACLE_W6 = """
WITH per_nation AS (
  SELECT r_name, n_name,
         sum(CAST(c_acctbal AS DECIMAL(14,2))) AS bal_dec
  FROM customer
  JOIN nation ON c_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  GROUP BY r_name, n_name
)
SELECT r_name, n_name,
       CAST(bal_dec AS DOUBLE) AS nation_bal,
       CAST(bal_dec AS DOUBLE)
         / CAST(sum(bal_dec) OVER (PARTITION BY r_name) AS DOUBLE) AS share
FROM per_nation
"""


def q_funnel_view_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-sequence funnel: per user, how many ``view`` events are
    followed by a ``purchase`` within 30 minutes (consecutive in the
    user's stream) — the lag/lead sequential-pattern shape: one sorted
    exchange per user, adjacent-pair predicate, conditional count.
    Ordering ties broken by event_id so both engines see one stream."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts", "event_id"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    nxt_type = F.lead("event_type").over(w)
    nxt_ts = F.lead("ts").over(w)
    hit = (
        (F.col("event_type") == "view")
        & (nxt_type == "purchase")
        & (nxt_ts <= F.col("ts") + F.expr("INTERVAL 30 MINUTES"))
    )
    return (
        ev.withColumn("hit", hit.cast("int"))
        .groupBy("user_id")
        .agg(
            F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0))
            .cast("long")
            .alias("n_views"),
            # an all-NULL hit group (user with one trailing event) must
            # report 0 like the oracle's CASE...ELSE 0, not NULL
            F.coalesce(F.sum("hit"), F.lit(0)).cast("long").alias(
                "n_converted"
            ),
        )
    )


ORACLE_FUNNEL = """
WITH seq AS (
  SELECT user_id, event_type, ts,
         lead(event_type) OVER w AS nxt_type,
         lead(ts)         OVER w AS nxt_ts
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT user_id,
       CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS n_views,
       CAST(sum(CASE WHEN event_type = 'view' AND nxt_type = 'purchase'
                      AND nxt_ts <= ts + INTERVAL 30 MINUTE THEN 1 ELSE 0 END) AS BIGINT) AS n_converted
FROM seq
GROUP BY user_id
"""


# ---------------------------------------------------------------------------
# Graph analytics: co-purchase graph, triangle count
# ---------------------------------------------------------------------------


def q_copurchase_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle count over the co-purchase graph (parts appearing in the
    same order).  Edge generation is a per-order self-join — bounded by
    (lines-per-order choose 2), so it scales linearly in orders, not
    quadratically in parts; triangles close with two joins over the
    canonical (lo < hi) edge list, each triangle counted exactly once via
    the a < b < c representation.  The classic beyond-relational graph
    metric that still compiles to three equi-joins — no vertex-centric
    runtime needed."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    ).distinct()
    a, b = li.alias("x"), li.alias("y")
    und = (
        a.join(
            # fact-scale on BOTH sides: pin a shuffled hash join so the
            # basket stream is never broadcast (×100 scale find)
            b.hint("shuffle_hash"),
            (F.col("x.l_orderkey") == F.col("y.l_orderkey"))
            & (F.col("x.l_partkey") < F.col("y.l_partkey")),
        )
        .select(
            F.col("x.l_partkey").alias("lo"), F.col("y.l_partkey").alias("hi")
        )
        .distinct()
    )
    # degree-ordered orientation: point every edge from the lower-degree
    # endpoint to the higher ((deg, id) total order), so each node's
    # out-degree is O(sqrt(m)) and the wedge join is O(m^1.5) — the
    # id-ordered naive form blows up on high-degree hub parts (measured
    # 55 s -> 9 s at x10).  The triangle COUNT is orientation-invariant,
    # so the oracle keeps the simple id-ordered SQL.
    deg = (
        und.select(F.explode(F.array("lo", "hi")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    e = (
        und.join(deg.select(F.col("node").alias("lo"), F.col("d").alias("d_lo")), "lo")
        .join(deg.select(F.col("node").alias("hi"), F.col("d").alias("d_hi")), "hi")
    )
    lo_first = F.struct(F.col("d_lo"), F.col("lo")) < F.struct(
        F.col("d_hi"), F.col("hi")
    )
    oriented = e.select(
        F.when(lo_first, F.col("lo")).otherwise(F.col("hi")).alias("src"),
        F.when(lo_first, F.col("hi")).otherwise(F.col("lo")).alias("dst"),
        F.when(lo_first, F.col("d_hi")).otherwise(F.col("d_lo")).alias("dst_d"),
    ).localCheckpoint(eager=False)  # referenced three times (both wedge
    # sides + the closing probe) — materialized ONCE at first action,
    # and lazily so query CONSTRUCTION stays job-free
    o1, o2, o3 = oriented.alias("o1"), oriented.alias("o2"), oriented.alias("o3")
    wedges = o1.join(
        o2,
        (F.col("o1.src") == F.col("o2.src"))
        & (
            F.struct(F.col("o1.dst_d"), F.col("o1.dst"))
            < F.struct(F.col("o2.dst_d"), F.col("o2.dst"))
        ),
    ).select(F.col("o1.dst").alias("wa"), F.col("o2.dst").alias("wb"))
    tri = wedges.join(
        o3,
        (F.col("wa") == F.col("o3.src")) & (F.col("wb") == F.col("o3.dst")),
        "left_semi",
    )
    # oriented is 1:1 with und's edges and already materialized —
    # counting und would re-run the basket self-join a second time
    return oriented.agg(F.count(F.lit(1)).alias("n_edges")).crossJoin(
        tri.agg(F.count(F.lit(1)).alias("n_triangles"))
    )


ORACLE_TRIANGLES = """
WITH li AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
), edges AS (
  SELECT DISTINCT x.l_partkey AS lo, y.l_partkey AS hi
  FROM li x JOIN li y
    ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey
)
SELECT (SELECT count(*) FROM edges) AS n_edges,
       (SELECT count(*)
        FROM edges e1
        JOIN edges e2 ON e1.hi = e2.lo
        JOIN edges e3 ON e1.lo = e3.lo AND e2.hi = e3.hi) AS n_triangles
"""


# ---------------------------------------------------------------------------
# S9 time travel: the versioned snapshot sink under the oracle gate
# ---------------------------------------------------------------------------


def q_snapshot_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VERSION AS OF over the plain-Parquet snapshot store
    (plans/snapshots.py — the reference's dated-backup analog,
    runcommand.py:221-255): write a base version, write a patched
    version ('en' docs grow one char), read BOTH versions back by label
    and compare per-lang — the time-travel read path, end to end, with a
    DuckDB oracle recomputing both versions from the live table."""
    import shutil

    from .plans import snapshots as SNAP
    from .queries_e2e import _fx

    root = _fx(sf_dir, "ttravel_store")
    shutil.rmtree(root, ignore_errors=True)
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "n_chars"
    )
    patched = docs.withColumn(
        "n_chars",
        F.when(F.col("lang") == "en", F.col("n_chars") + 1).otherwise(
            F.col("n_chars")
        ),
    )
    SNAP.write_snapshot(docs, root, label="base")
    SNAP.write_snapshot(patched, root, label="patched")
    v0 = SNAP.read_snapshot(spark, root, label="base")
    v1 = SNAP.read_snapshot(spark, root, label="patched")
    return (
        v0.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("chars_v0"),
        )
        .join(
            v1.groupBy("lang").agg(F.sum("n_chars").alias("chars_v1")),
            "lang",
        )
        .withColumn("chars_delta", F.col("chars_v1") - F.col("chars_v0"))
    )


ORACLE_TIME_TRAVEL = """
SELECT lang, count(*) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS chars_v0,
       CAST(sum(CASE WHEN lang = 'en' THEN n_chars + 1 ELSE n_chars END) AS BIGINT) AS chars_v1,
       -- mirrors the query's NULL semantics: a NULL-n_chars doc drops
       -- out of BOTH version sums, so it contributes no delta
       CAST(sum(CASE WHEN lang = 'en' AND n_chars IS NOT NULL
            THEN 1 ELSE 0 END) AS BIGINT) AS chars_delta
FROM documents
GROUP BY lang
"""


def q_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8 shape — market share: NATION_5 suppliers' slice of region
    AMERICA-analog customer volume per order year.  Both the numerator
    (conditional) and denominator aggregate in ONE pass as decimal sums;
    the division happens once per year on the exact sums.  nation joins
    in two roles (customer side filters the region, supplier side tags
    the share)."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    customer = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    supplier = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey"
    )
    n_c = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("cnk"), F.col("n_regionkey").alias("crk")
    )
    n_s = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("snk"), F.col("n_name").alias("supp_nation")
    )
    region = load_table(spark, sf_dir, "region").select(
        "r_regionkey", "r_name"
    )
    vol = _rev()
    tagged = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n_c), F.col("c_nationkey") == F.col("cnk"))
        .join(
            F.broadcast(region.filter(F.col("r_name") == "AMERICA")),
            F.col("crk") == F.col("r_regionkey"),
        )
        .join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n_s), F.col("s_nationkey") == F.col("snk"))
    )
    return (
        tagged.groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.sum(F.when(F.col("supp_nation") == "NATION_5", vol)).alias(
                "__num"
            ),
            F.sum(vol).alias("__den"),
        )
        .select(
            "o_year",
            (
                F.coalesce(F.col("__num"), F.lit(0).cast("decimal(18,4)")).cast(
                    "double"
                )
                / F.col("__den").cast("double")
            ).alias("mkt_share"),
        )
    )


ORACLE_Q8 = """
SELECT EXTRACT(year FROM o_orderdate) AS o_year,
       CAST(coalesce(sum(CASE WHEN n2.n_name = 'NATION_5'
                 THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)) END),
             CAST(0 AS DECIMAL(18,4))) AS DOUBLE)
       / CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE)
       AS mkt_share
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n1 ON c_nationkey = n1.n_nationkey
JOIN region   ON n1.n_regionkey = r_regionkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n2 ON s_nationkey = n2.n_nationkey
WHERE r_name = 'AMERICA'
GROUP BY o_year
"""
