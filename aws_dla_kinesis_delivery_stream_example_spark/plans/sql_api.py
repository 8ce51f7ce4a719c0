"""SQL-API queries: subquery forms (correlated scalar, IN, EXISTS-with-
aggregate) that exercise Spark's SQL parser + subquery decorrelation —
the rest of the catalog is DataFrame-API; Catalyst produces the same
plans either way, and these prove the SQL entry point end-to-end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..sources.tables import load_tables
from .catalog import query


def _sql(spark: SparkSession, sf_dir: str, stmt: str, tables: tuple[str, ...]) -> DataFrame:
    for t, df in load_tables(spark, sf_dir).items():
        if t in tables:
            df.createOrReplaceTempView(t)
    return spark.sql(stmt)


@query(
    "q52_correlated_scalar_subquery",
    oracle="""
        SELECT p_brand, p_partkey, round(p_retailprice, 2) AS price
        FROM part
        WHERE p_retailprice = (SELECT min(p2.p_retailprice)
                               FROM part p2
                               WHERE p2.p_brand = part.p_brand)
        ORDER BY p_brand, p_partkey
    """,
    description="Correlated scalar subquery (cheapest part per brand, "
    "TPC-H Q2 pattern) — decorrelated by Catalyst into a join on the "
    "per-brand aggregate",
    tags=("sql", "subquery"),
)
def q52_correlated_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _sql(
        spark,
        sf_dir,
        """
        SELECT p_brand, p_partkey, round(p_retailprice, 2) AS price
        FROM part
        WHERE p_retailprice = (SELECT min(p2.p_retailprice)
                               FROM part p2
                               WHERE p2.p_brand = part.p_brand)
        ORDER BY p_brand, p_partkey
        """,
        ("part",),
    )


@query(
    "q53_in_subquery",
    oracle="""
        SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS totalprice
        FROM orders
        WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'MACHINERY')
          AND o_orderkey NOT IN (SELECT l_orderkey FROM lineitem WHERE l_quantity > 49)
        ORDER BY o_orderkey
    """,
    description="IN / NOT IN subqueries (semi + null-aware anti join "
    "after decorrelation)",
    tags=("sql", "subquery"),
)
def q53_in_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _sql(
        spark,
        sf_dir,
        """
        SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS totalprice
        FROM orders
        WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'MACHINERY')
          AND o_orderkey NOT IN (SELECT l_orderkey FROM lineitem WHERE l_quantity > 49)
        ORDER BY o_orderkey
        """,
        ("orders", "customer", "lineitem"),
    )


@query(
    "q54_exists_aggregate_subquery",
    oracle="""
        SELECT c_custkey, c_name
        FROM customer
        WHERE EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                      GROUP BY o_custkey
                      HAVING count(*) >= 20)
        ORDER BY c_custkey
    """,
    description="EXISTS over a grouped/HAVING subquery (aggregate "
    "decorrelation)",
    tags=("sql", "subquery"),
)
def q54_exists_aggregate_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _sql(
        spark,
        sf_dir,
        """
        SELECT c_custkey, c_name
        FROM customer
        WHERE EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                      GROUP BY o_custkey
                      HAVING count(*) >= 20)
        ORDER BY c_custkey
        """,
        ("customer", "orders"),
    )
