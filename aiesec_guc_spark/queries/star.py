"""Star-schema joins and aggregations (SURVEY.md §2.3-§2.5 ABSENT
categories + EXT E3/E4/E9/E10) on the TPC-H-ish corpus.

Scale notes (100 TB): all dimension tables here (region, nation,
supplier, customer, part) are broadcast-joined against the fact tables
(lineitem, orders) — no fact-side shuffle for the joins; the only
shuffles are the final group-bys on low-cardinality keys, which
map-side combine first.  Numeric outputs follow the registry's
decimal-exact conventions so they hash-match DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from . import query


def _dec(col: str, prec: int = 9) -> F.Column:
    return F.col(col).cast(f"decimal({prec},2)")


# ---------------------------------------------------------------------------
# E3 — star join + grouped aggregation: revenue by region/nation.
# ---------------------------------------------------------------------------

_REVENUE_ORACLE = """
SELECT r.r_name AS region,
       n.n_name AS nation,
       count(*) AS n_lineitems,
       CAST(count(DISTINCT l.l_orderkey) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(9,2))
                * (1 - CAST(l.l_discount AS DECIMAL(9,2)))) AS DOUBLE) AS revenue
FROM lineitem l
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation  n ON s.s_nationkey = n.n_nationkey
JOIN region  r ON n.n_regionkey = r.r_regionkey
GROUP BY 1, 2
"""


@query("star_revenue_by_nation", oracle=_REVENUE_ORACLE)
def star_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E3: fact-to-dimension star join + group agg.

    supplier/nation/region are broadcast (small dims) — the lineitem
    scan never shuffles for the joins; the single shuffle is the final
    25-key group-by with map-side partial aggregation.
    """
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    joined = (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    )
    return joined.groupBy(
        F.col("r_name").alias("region"), F.col("n_name").alias("nation")
    ).agg(
        F.count(F.lit(1)).alias("n_lineitems"),
        F.countDistinct("l_orderkey").alias("n_orders"),
        F.sum(_dec("l_extendedprice") * (F.lit(1) - _dec("l_discount")))
        .cast("double")
        .alias("revenue"),
    )


# ---------------------------------------------------------------------------
# TPC-H Q1-shaped pricing summary — the canonical wide aggregation.
# ---------------------------------------------------------------------------

_PRICING_ORACLE = """
SELECT l_returnflag,
       l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(9,2))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(9,2))) AS DOUBLE) AS sum_base_price,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(9,2))
                * (1 - CAST(l_discount AS DECIMAL(9,2)))) AS DOUBLE) AS sum_disc_price,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(9,2))
                * (1 - CAST(l_discount AS DECIMAL(9,2)))
                * (1 + CAST(l_tax AS DECIMAL(9,2)))) AS DOUBLE) AS sum_charge,
       CAST(SUM(CAST(l_quantity AS DECIMAL(9,2))) AS DOUBLE) / count(*) AS avg_qty,
       CAST(SUM(CAST(l_discount AS DECIMAL(9,2))) AS DOUBLE) / count(*) AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2000-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


@query("pricing_summary", oracle=_PRICING_ORACLE)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped scan-heavy aggregation: 2 group keys, 8 aggs.

    The shipdate filter prunes at the scan; all sums run map-side
    first (partial aggregation), so the shuffle carries ≤ #groups ×
    #partitions rows.  Averages are derived as exact-sum / count —
    deterministic across engines.
    """
    li = load_table(spark, sf_dir, "lineitem")
    filtered = li.filter(F.col("l_shipdate") <= F.lit("2000-09-02").cast("timestamp"))
    disc_price = _dec("l_extendedprice") * (F.lit(1) - _dec("l_discount"))
    charge = disc_price * (F.lit(1) + _dec("l_tax"))
    cnt = F.count(F.lit(1))
    return filtered.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(_dec("l_quantity")).cast("double").alias("sum_qty"),
        F.sum(_dec("l_extendedprice")).cast("double").alias("sum_base_price"),
        F.sum(disc_price).cast("double").alias("sum_disc_price"),
        F.sum(charge).cast("double").alias("sum_charge"),
        (F.sum(_dec("l_quantity")).cast("double") / cnt).alias("avg_qty"),
        (F.sum(_dec("l_discount")).cast("double") / cnt).alias("avg_disc"),
        cnt.alias("count_order"),
    )


# ---------------------------------------------------------------------------
# E4 — grouped top-k: top 3 customers by order revenue per nation.
# ---------------------------------------------------------------------------

_TOPK_ORACLE = """
WITH cust_rev AS (
  SELECT c.c_nationkey AS nationkey,
         c.c_custkey AS custkey,
         CAST(SUM(CAST(o.o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS revenue
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  GROUP BY 1, 2
)
SELECT nationkey, custkey, revenue, CAST(rk AS INT) AS rk
FROM (
  SELECT *, row_number() OVER (
    PARTITION BY nationkey ORDER BY revenue DESC, custkey
  ) AS rk FROM cust_rev
) WHERE rk <= 3
"""


@query("topk_customers_per_nation", oracle=_TOPK_ORACLE)
def topk_customers_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E4: grouped top-k via ranking window, ties broken on the key.

    Aggregate first (shrinks to one row per customer), then a window
    over the small aggregate — the window shuffle moves #customers
    rows, not #orders.
    """
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    cust_rev = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy(
            F.col("c_nationkey").alias("nationkey"), F.col("c_custkey").alias("custkey")
        )
        .agg(F.sum(F.col("o_totalprice").cast("decimal(12,2)")).cast("double").alias("revenue"))
    )
    w = Window.partitionBy("nationkey").orderBy(F.desc("revenue"), F.asc("custkey"))
    return (
        cust_rev.withColumn("rk", F.row_number().over(w).cast("int"))
        .filter(F.col("rk") <= 3)
        .select("nationkey", "custkey", "revenue", "rk")
    )


# ---------------------------------------------------------------------------
# E9 — rollup totals.
# ---------------------------------------------------------------------------

_ROLLUP_ORACLE = """
SELECT COALESCE(r.r_name, 'ALL') AS region,
       COALESCE(n.n_name, 'ALL') AS nation,
       count(*) AS n_customers,
       CAST(SUM(CAST(c.c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS total_acctbal
FROM customer c
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY ROLLUP (r.r_name, n.n_name)
"""


@query("rollup_acctbal", oracle=_ROLLUP_ORACLE)
def rollup_acctbal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E9: hierarchical rollup (region → nation → grand total).

    Spark's rollup produces the same grouping sets as SQL ROLLUP;
    NULL group placeholders are surfaced as 'ALL' (the corpus has no
    real NULL names, so the coalesce is unambiguous).
    """
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    joined = c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey).join(
        F.broadcast(r), n.n_regionkey == r.r_regionkey
    )
    return (
        joined.rollup("r_name", "n_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum(F.col("c_acctbal").cast("decimal(12,2)")).cast("double").alias(
                "total_acctbal"
            ),
        )
        .select(
            F.coalesce(F.col("r_name"), F.lit("ALL")).alias("region"),
            F.coalesce(F.col("n_name"), F.lit("ALL")).alias("nation"),
            "n_customers",
            "total_acctbal",
        )
    )


# ---------------------------------------------------------------------------
# E10 — distinct counting, exact (oracle-checked) and approximate
# (rows-only: HLL estimates are engine-specific by construction).
# ---------------------------------------------------------------------------

_DISTINCT_ORACLE = """
SELECT o_orderpriority,
       CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_customers,
       count(*) AS n_orders
FROM orders
GROUP BY o_orderpriority
"""


@query("distinct_customers_by_priority", oracle=_DISTINCT_ORACLE)
def distinct_customers_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E10 (exact half): distinct customers per order priority —
    expands to a two-phase distinct-then-count aggregation."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.countDistinct("o_custkey").alias("n_customers"),
        F.count(F.lit(1)).alias("n_orders"),
    )


@query("approx_distinct_customers", oracle=None)
def approx_distinct_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E10 (approx half): HyperLogLog++ distinct estimate (rows-only —
    HLL sketches differ across engines by construction; the scale
    rationale is that the approx version needs no distinct shuffle,
    only mergeable sketches).
    """
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.approx_count_distinct("o_custkey", rsd=0.02).alias("approx_customers"),
        F.count(F.lit(1)).alias("n_orders"),
    )


# ---------------------------------------------------------------------------
# Pivot — wide conditional aggregation.
# ---------------------------------------------------------------------------

_PIVOT_ORACLE = """
SELECT o_orderpriority,
       CAST(count(*) FILTER (WHERE o_orderstatus = 'O') AS BIGINT) AS n_open,
       CAST(count(*) FILTER (WHERE o_orderstatus = 'F') AS BIGINT) AS n_filled,
       CAST(count(*) FILTER (WHERE o_orderstatus = 'P') AS BIGINT) AS n_partial
FROM orders
GROUP BY o_orderpriority
"""


@query("orders_status_pivot", oracle=_PIVOT_ORACLE)
def orders_status_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot with explicit value list (no second pass to discover
    values — required for a single-scan plan at scale)."""
    o = load_table(spark, sf_dir, "orders")
    piv = (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["O", "F", "P"])
        .agg(F.count(F.lit(1)))
    )
    return piv.select(
        "o_orderpriority",
        F.coalesce(F.col("O"), F.lit(0)).alias("n_open"),
        F.coalesce(F.col("F"), F.lit(0)).alias("n_filled"),
        F.coalesce(F.col("P"), F.lit(0)).alias("n_partial"),
    )


# ---------------------------------------------------------------------------
# Set operations — union / intersect / except (ABSENT in the reference,
# SURVEY.md §2.5; declared here over the customer/supplier nation sets).
# ---------------------------------------------------------------------------

_SETOPS_ORACLE = """
WITH cn AS (SELECT DISTINCT c_nationkey AS nationkey FROM customer),
     sn AS (SELECT DISTINCT s_nationkey AS nationkey FROM supplier)
SELECT nationkey, 'both' AS membership FROM (SELECT * FROM cn INTERSECT SELECT * FROM sn)
UNION ALL
SELECT nationkey, 'customer_only' AS membership FROM (SELECT * FROM cn EXCEPT SELECT * FROM sn)
UNION ALL
SELECT nationkey, 'supplier_only' AS membership FROM (SELECT * FROM sn EXCEPT SELECT * FROM cn)
"""


@query("nation_set_ops", oracle=_SETOPS_ORACLE)
def nation_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set ops: intersect / except / union all over two key sets."""
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    ).distinct()
    s = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    ).distinct()
    both = c.intersect(s).withColumn("membership", F.lit("both"))
    c_only = c.exceptAll(s).withColumn("membership", F.lit("customer_only"))
    s_only = s.exceptAll(c).withColumn("membership", F.lit("supplier_only"))
    return both.unionAll(c_only).unionAll(s_only)


# ---------------------------------------------------------------------------
# Cube — all grouping-set combinations (completes the rollup family).
# ---------------------------------------------------------------------------

_CUBE_ORACLE = """
SELECT COALESCE(o_orderpriority, 'ALL') AS priority,
       COALESCE(o_orderstatus, 'ALL') AS status,
       count(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total_price
FROM orders
GROUP BY CUBE (o_orderpriority, o_orderstatus)
"""


@query("cube_orders", oracle=_CUBE_ORACLE)
def cube_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cube over (priority, status): all four grouping sets in one
    pass (Spark expands the sets map-side; one shuffle)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.cube("o_orderpriority", "o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(12,2)")).cast("double").alias(
                "total_price"
            ),
        )
        .select(
            F.coalesce(F.col("o_orderpriority"), F.lit("ALL")).alias("priority"),
            F.coalesce(F.col("o_orderstatus"), F.lit("ALL")).alias("status"),
            "n_orders",
            "total_price",
        )
    )


# ---------------------------------------------------------------------------
# Window frame — running (cumulative) revenue per customer.
# ---------------------------------------------------------------------------

_RUNNING_ORACLE = """
SELECT o_orderkey,
       o_custkey,
       epoch_us(o_orderdate) AS orderdate_us,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) OVER (
              PARTITION BY o_custkey
              ORDER BY o_orderdate, o_orderkey
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
            ) AS DOUBLE) AS running_total
FROM orders
"""


@query("running_revenue_per_customer", oracle=_RUNNING_ORACLE)
def running_revenue_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic window frame: cumulative order revenue per customer
    (rowsBetween unboundedPreceding..current), deterministic order via
    the (orderdate, orderkey) tie-break; exact-decimal partial sums."""
    from pyspark.sql import Window as W

    o = load_table(spark, sf_dir, "orders")
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.unix_micros("o_orderdate").alias("orderdate_us"),
        F.sum(F.col("o_totalprice").cast("decimal(12,2)"))
        .over(w)
        .cast("double")
        .alias("running_total"),
    )
