"""Batch-relational operator surface (SURVEY.md §2.12).

Each query is written with the DataFrame API (declarative — Catalyst
gets predicate pushdown, column pruning, join selection for free) and
paired with a DuckDB oracle. Scale notes are per-query docstrings:
every plan here survives 100× data because filters reach the parquet
scan, small dimensions are broadcast, and aggregations are partial
(map-side combine) before the shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .catalog import query


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# Scan / aggregate
# ---------------------------------------------------------------------------

@query(
    "q01_pricing_summary",
    oracle="""
        SELECT l_returnflag, l_linestatus,
               round(sum(l_quantity), 2)                                        AS sum_qty,
               round(sum(l_extendedprice), 2)                                   AS sum_base_price,
               round(sum(l_extendedprice * (1 - l_discount)), 2)                AS sum_disc_price,
               round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)  AS sum_charge,
               round(avg(l_quantity), 2)                                        AS avg_qty,
               round(avg(l_extendedprice), 2)                                   AS avg_price,
               round(avg(l_discount), 2)                                        AS avg_disc,
               count(*)                                                         AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
    """,
    description="TPC-H Q1 pricing summary: scan + filter + 8-agg groupBy "
    "(reference A1-A4 generalized; partial aggregation map-side, 6-group output)",
    tags=("scan", "aggregate"),
)
def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Flagship: filter pushes to parquet, partial agg before the 6-key shuffle.
    li = _t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2000-12-01 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 2).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 2).alias("avg_price"),
            F.round(F.avg("l_discount"), 2).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@query(
    "q02_filter_project",
    oracle="""
        SELECT l_orderkey, l_linenumber,
               -- price*(1-disc) has <=4 exact decimals; round(.,4) is
               -- unambiguous in both engines (round(.,2) hits half-way
               -- cases where Spark HALF_UP and DuckDB disagree)
               round(l_extendedprice * (1 - l_discount), 4) AS revenue
        FROM lineitem
        WHERE l_shipdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1996-12-31'
          AND l_quantity < 5
          AND l_returnflag IN ('A', 'R')
          AND l_discount IS NOT NULL
        ORDER BY l_orderkey, l_linenumber
    """,
    description="Selective projection: BETWEEN + IN + null-check predicates, "
    "all pushed into the parquet scan (PushedFilters)",
    tags=("scan", "filter"),
)
def q02_filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            F.col("l_shipdate").between("1996-01-01", "1996-12-31")
            & (F.col("l_quantity") < 5)
            & F.col("l_returnflag").isin("A", "R")
            & F.col("l_discount").isNotNull()
        )
        .select(
            "l_orderkey",
            "l_linenumber",
            F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias("revenue"),
        )
        .orderBy("l_orderkey", "l_linenumber")
    )


# ---------------------------------------------------------------------------
# Joins
# ---------------------------------------------------------------------------

@query(
    "q03_shipping_priority",
    oracle="""
        SELECT l_orderkey,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
               strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
               o_orderpriority
        FROM customer
        JOIN orders   ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1998-03-15'
          AND l_shipdate  > TIMESTAMP '1998-03-15'
        GROUP BY l_orderkey, o_orderdate, o_orderpriority
        ORDER BY revenue DESC, l_orderkey
        LIMIT 10
    """,
    description="TPC-H Q3: 3-way join + group + global top-10 "
    "(TakeOrderedAndProject, no full sort of the agg output)",
    tags=("join", "aggregate", "topk"),
)
def q03_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderdate") < "1998-03-15")
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > "1998-03-15")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_orderpriority",
        )
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


@query(
    "q04_semi_join",
    oracle="""
        SELECT c_custkey, c_name
        FROM customer
        WHERE EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_totalprice > 400000)
        ORDER BY c_custkey
    """,
    description="EXISTS as left-semi join (no row multiplication, "
    "build side is the filtered orders set)",
    tags=("join",),
)
def q04_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    big = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    return (
        cust.join(big, cust.c_custkey == big.o_custkey, "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


@query(
    "q05_anti_join",
    oracle="""
        SELECT c_custkey, c_name
        FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        ORDER BY c_custkey
    """,
    description="NOT EXISTS as left-anti join (customers without orders)",
    tags=("join",),
)
def q05_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


@query(
    "q06_broadcast_dims",
    oracle="""
        SELECT r_name, n_name,
               count(*) AS n_orders,
               round(sum(o_totalprice), 2) AS total_price
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation   ON c_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        GROUP BY r_name, n_name
        ORDER BY r_name, n_name
    """,
    description="Star-schema rollup: fact joined to broadcast dimension "
    "tables (nation/region never shuffle the fact side)",
    tags=("join", "broadcast", "aggregate"),
)
def q06_broadcast_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    nation = F.broadcast(_t(spark, sf_dir, "nation"))
    region = F.broadcast(_t(spark, sf_dir, "region"))
    return (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(nation, cust.c_nationkey == nation.n_nationkey)
        .join(region, nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_price"),
        )
        .orderBy("r_name", "n_name")
    )


@query(
    "q07_outer_join_agg",
    oracle="""
        SELECT c_custkey,
               count(o_orderkey) AS n_orders,
               round(coalesce(sum(o_totalprice), 0), 2) AS total_spent
        FROM customer
        LEFT JOIN orders ON c_custkey = o_custkey
        GROUP BY c_custkey
        ORDER BY c_custkey
    """,
    description="Left outer join preserving zero-order customers, "
    "count(col) null semantics + coalesce",
    tags=("join", "aggregate"),
)
def q07_outer_join_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.round(F.coalesce(F.sum("o_totalprice"), F.lit(0.0)), 2).alias("total_spent"),
        )
        .orderBy("c_custkey")
    )


@query(
    "q08_range_join",
    oracle="""
        SELECT p_partkey, r_regionkey AS price_bucket
        FROM part
        JOIN region ON p_retailprice >= 900 + r_regionkey * 20
                   AND p_retailprice <  920 + r_regionkey * 20
        ORDER BY p_partkey
    """,
    description="Non-equi (range/theta) join: banded price-bucket join; "
    "tiny side broadcast => BroadcastNestedLoopJoin, no cartesian shuffle",
    tags=("join", "range"),
)
def q08_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = _t(spark, sf_dir, "part")
    region = F.broadcast(_t(spark, sf_dir, "region"))
    lo = 900 + region.r_regionkey * 20
    return (
        part.join(region, (part.p_retailprice >= lo) & (part.p_retailprice < lo + 20))
        .select("p_partkey", F.col("r_regionkey").alias("price_bucket"))
        .orderBy("p_partkey")
    )


@query(
    "q09_local_supply",
    oracle="""
        SELECT n_name,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM customer
        JOIN orders   ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        JOIN nation   ON c_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
          AND o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate <  TIMESTAMP '1998-01-01'
        GROUP BY n_name
        ORDER BY n_name
    """,
    description="TPC-H Q5: 6-way join with a compound (two-column) join "
    "condition; dimension filters prune before the fact shuffle",
    tags=("join", "aggregate"),
)
def q09_local_supply(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1998-01-01")
    )
    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier")
    nation = F.broadcast(_t(spark, sf_dir, "nation"))
    region = F.broadcast(_t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA"))
    return (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(li, li.l_orderkey == orders.o_orderkey)
        .join(supp, (li.l_suppkey == supp.s_suppkey) & (cust.c_nationkey == supp.s_nationkey))
        .join(nation, cust.c_nationkey == nation.n_nationkey)
        .join(region, nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .orderBy("n_name")
    )


# ---------------------------------------------------------------------------
# Window functions
# ---------------------------------------------------------------------------

@query(
    "q10_window_rank",
    oracle="""
        SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS totalprice, rn
        FROM (
            SELECT o_custkey, o_orderkey, o_totalprice,
                   row_number() OVER (PARTITION BY o_custkey
                                      ORDER BY o_totalprice DESC, o_orderkey) AS rn
            FROM orders
        )
        WHERE rn <= 3
        ORDER BY o_custkey, rn
    """,
    description="Top-3 orders per customer: row_number window; one shuffle "
    "on the partition key, sort within partitions only",
    tags=("window", "topk"),
)
def q10_window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", F.round("o_totalprice", 2).alias("totalprice"), "rn")
        .orderBy("o_custkey", "rn")
    )


@query(
    "q11_window_running",
    oracle="""
        SELECT l_suppkey, l_orderkey, l_linenumber,
               round(sum(l_quantity) OVER (
                   PARTITION BY l_suppkey
                   ORDER BY l_shipdate, l_orderkey, l_linenumber
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_qty,
               lag(l_linenumber) OVER (
                   PARTITION BY l_suppkey
                   ORDER BY l_shipdate, l_orderkey, l_linenumber)      AS prev_linenumber,
               lead(l_linenumber) OVER (
                   PARTITION BY l_suppkey
                   ORDER BY l_shipdate, l_orderkey, l_linenumber)      AS next_linenumber
        FROM lineitem
        WHERE l_suppkey <= 5
        ORDER BY l_suppkey, l_orderkey, l_linenumber
    """,
    description="Running sum + lag/lead over a deterministic total order "
    "within each supplier partition",
    tags=("window",),
)
def q11_window_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_suppkey") <= 5)
    w = W.partitionBy("l_suppkey").orderBy("l_shipdate", "l_orderkey", "l_linenumber")
    return (
        li.select(
            "l_suppkey",
            "l_orderkey",
            "l_linenumber",
            F.round(F.sum("l_quantity").over(w.rowsBetween(W.unboundedPreceding, W.currentRow)), 2).alias("running_qty"),
            F.lag("l_linenumber").over(w).alias("prev_linenumber"),
            F.lead("l_linenumber").over(w).alias("next_linenumber"),
        )
        .orderBy("l_suppkey", "l_orderkey", "l_linenumber")
    )


# ---------------------------------------------------------------------------
# Grouping sets / rollup / cube / having / distinct aggregates
# ---------------------------------------------------------------------------

@query(
    "q12_rollup",
    oracle="""
        SELECT l_returnflag, l_linestatus,
               round(sum(l_quantity), 2) AS sum_qty,
               count(*) AS n
        FROM lineitem
        GROUP BY ROLLUP (l_returnflag, l_linestatus)
        ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
    """,
    description="ROLLUP hierarchy totals (grand total + per-flag subtotals)",
    tags=("aggregate", "rollup"),
)
def q12_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(F.round(F.sum("l_quantity"), 2).alias("sum_qty"), F.count("*").alias("n"))
        .orderBy(F.asc_nulls_first("l_returnflag"), F.asc_nulls_first("l_linestatus"))
    )


@query(
    "q13_cube",
    oracle="""
        SELECT o_orderstatus, o_orderpriority,
               count(*) AS n,
               round(sum(o_totalprice), 2) AS total
        FROM orders
        GROUP BY CUBE (o_orderstatus, o_orderpriority)
        ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
    """,
    description="CUBE over status x priority (all grouping-set combinations)",
    tags=("aggregate", "cube"),
)
def q13_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(F.count("*").alias("n"), F.round(F.sum("o_totalprice"), 2).alias("total"))
        .orderBy(F.asc_nulls_first("o_orderstatus"), F.asc_nulls_first("o_orderpriority"))
    )


@query(
    "q14_having",
    oracle="""
        SELECT o_custkey, count(*) AS n_orders
        FROM orders
        GROUP BY o_custkey
        HAVING count(*) > 15
        ORDER BY o_custkey
    """,
    description="HAVING = post-aggregation filter (runs after partial+final agg)",
    tags=("aggregate",),
)
def q14_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_custkey")
        .agg(F.count("*").alias("n_orders"))
        .filter(F.col("n_orders") > 15)
        .orderBy("o_custkey")
    )


@query(
    "q15_distinct_agg",
    oracle="""
        SELECT l_returnflag,
               count(DISTINCT l_suppkey) AS n_supp,
               count(DISTINCT l_partkey) AS n_part,
               count(*) AS n
        FROM lineitem
        GROUP BY l_returnflag
        ORDER BY l_returnflag
    """,
    description="Multiple count(DISTINCT) in one aggregation (expand + "
    "two-phase distinct aggregation)",
    tags=("aggregate", "distinct"),
)
def q15_distinct_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_suppkey").alias("n_supp"),
            F.countDistinct("l_partkey").alias("n_part"),
            F.count("*").alias("n"),
        )
        .orderBy("l_returnflag")
    )


# ---------------------------------------------------------------------------
# Set operations / sort-limit
# ---------------------------------------------------------------------------

@query(
    "q16_set_ops",
    oracle="""
        WITH f AS (SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'F'),
             o AS (SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'O')
        SELECT 'both' AS tag, o_custkey FROM (SELECT * FROM f INTERSECT SELECT * FROM o)
        UNION ALL
        SELECT 'f_only' AS tag, o_custkey FROM (SELECT * FROM f EXCEPT SELECT * FROM o)
        ORDER BY tag, o_custkey
    """,
    description="INTERSECT / EXCEPT / UNION ALL composed in one result",
    tags=("setop",),
)
def q16_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    f = orders.filter(F.col("o_orderstatus") == "F").select("o_custkey").distinct()
    o = orders.filter(F.col("o_orderstatus") == "O").select("o_custkey").distinct()
    both = f.intersect(o).select(F.lit("both").alias("tag"), "o_custkey")
    f_only = f.exceptAll(o).select(F.lit("f_only").alias("tag"), "o_custkey")
    return both.unionAll(f_only).orderBy("tag", "o_custkey")


@query(
    "q17_topk_global",
    oracle="""
        SELECT o_orderkey, round(o_totalprice, 2) AS totalprice, o_orderpriority
        FROM orders
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 20
    """,
    description="Global top-K: orderBy+limit compiles to TakeOrderedAndProject "
    "(per-partition heap, no full global sort)",
    tags=("sort", "topk"),
)
def q17_topk_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(20)
        .select("o_orderkey", F.round("o_totalprice", 2).alias("totalprice"), "o_orderpriority")
    )


# ---------------------------------------------------------------------------
# Scalar function surface
# ---------------------------------------------------------------------------

@query(
    "q18_scalar_functions",
    oracle="""
        SELECT o_orderkey,
               upper(substr(o_orderpriority, 3, 6))                        AS prio_word,
               concat(o_orderstatus, '-', o_orderpriority)                 AS status_prio,
               length(trim(o_orderpriority))                               AS prio_len,
               CAST(year(o_orderdate) AS BIGINT)                           AS o_year,
               CAST(month(o_orderdate) AS BIGINT)                          AS o_month,
               strftime(date_trunc('month', o_orderdate), '%Y-%m-%d')      AS month_start,
               CAST(datediff('day', TIMESTAMP '1995-01-01', o_orderdate) AS BIGINT) AS days_since,
               round(abs(o_totalprice - 250000), 2)                        AS dist_mid,
               CAST(floor(o_totalprice / 1000) AS BIGINT)                  AS price_k_floor,
               CAST(ceil(o_totalprice / 1000) AS BIGINT)                   AS price_k_ceil,
               CASE WHEN o_totalprice > 300000 THEN 'high'
                    WHEN o_totalprice > 100000 THEN 'mid'
                    ELSE 'low' END                                         AS price_band,
               coalesce(nullif(o_orderstatus, 'P'), 'pending')             AS status_or_pending
        FROM orders
        WHERE o_orderkey <= 1000 AND o_orderpriority LIKE '%URGENT%'
        ORDER BY o_orderkey
    """,
    description="Scalar function surface: string/date/math/conditional "
    "built-ins, all whole-stage-codegen'd JVM expressions",
    tags=("scalar",),
)
def q18_scalar_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.filter((F.col("o_orderkey") <= 1000) & F.col("o_orderpriority").like("%URGENT%"))
        .select(
            "o_orderkey",
            F.upper(F.substring("o_orderpriority", 3, 6)).alias("prio_word"),
            F.concat(F.col("o_orderstatus"), F.lit("-"), F.col("o_orderpriority")).alias("status_prio"),
            F.length(F.trim(F.col("o_orderpriority"))).cast("long").alias("prio_len"),
            F.year("o_orderdate").cast("long").alias("o_year"),
            F.month("o_orderdate").cast("long").alias("o_month"),
            F.date_format(F.date_trunc("month", F.col("o_orderdate")), "yyyy-MM-dd").alias("month_start"),
            F.datediff(F.col("o_orderdate"), F.lit("1995-01-01").cast("timestamp")).cast("long").alias("days_since"),
            F.round(F.abs(F.col("o_totalprice") - 250000), 2).alias("dist_mid"),
            F.floor(F.col("o_totalprice") / 1000).cast("long").alias("price_k_floor"),
            F.ceil(F.col("o_totalprice") / 1000).cast("long").alias("price_k_ceil"),
            F.when(F.col("o_totalprice") > 300000, "high")
            .when(F.col("o_totalprice") > 100000, "mid")
            .otherwise("low")
            .alias("price_band"),
            F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("P")), F.lit("pending")).alias("status_or_pending"),
        )
        .orderBy("o_orderkey")
    )


@query(
    "q19_promo_share",
    oracle="""
        SELECT strftime(date_trunc('month', l_shipdate), '%Y-%m') AS ship_month,
               round(sum(CASE WHEN p_type = 'PROMO'
                              THEN l_extendedprice * (1 - l_discount) ELSE 0 END), 2) AS promo_rev,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_rev
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
        GROUP BY ship_month
        ORDER BY ship_month
    """,
    description="TPC-H Q14-style conditional aggregation over a join, "
    "grouped by a computed month key",
    tags=("join", "aggregate", "scalar"),
)
def q19_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    part = _t(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .groupBy(F.date_format(F.date_trunc("month", F.col("l_shipdate")), "yyyy-MM").alias("ship_month"))
        .agg(
            F.round(F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0)), 2).alias("promo_rev"),
            F.round(F.sum(rev), 2).alias("total_rev"),
        )
        .orderBy("ship_month")
    )
