"""Bucketed storage for co-located joins (SURVEY.md §2.12 'bucketing').

At 100 TB, repeated joins on the same key should not pay a shuffle per
query: write both sides bucketed by the join key
(``bucketBy(n, key).sortBy(key).saveAsTable``) and Spark's planner
joins bucket-to-bucket with NO Exchange on either side. This module
wraps that pattern; tests/test_bucketing.py asserts the exchange-free
plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame, table: str, key: str, n_buckets: int = 32, sort: bool = True
) -> None:
    writer = df.write.mode("overwrite").bucketBy(n_buckets, key)
    if sort:
        writer = writer.sortBy(key)
    writer.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, key: str, how: str = "inner"
) -> DataFrame:
    left = spark.table(left_table)
    right = spark.table(right_table)
    return left.join(right, on=key, how=how)


def plan_has_shuffle(df: DataFrame) -> bool:
    """True if the physical plan contains a shuffle Exchange (excludes
    broadcast exchanges, which are not data shuffles)."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return any(
        line.strip().startswith(("Exchange", "+- Exchange", ":- Exchange"))
        or "Exchange hashpartitioning" in line
        for line in plan.splitlines()
    )
