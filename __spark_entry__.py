"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  : flagship query (TPC-H Q1 pricing summary) on sf0.001.
queries()     : every declared operator from SURVEY.md §2 — one
                callable per QuerySpec in the engine's plan catalog.
oracle_sql()  : matching DuckDB SQL for every SQL-expressible query;
                hash-based ops (MinHash/SimHash/xxhash fingerprints)
                are rows-only by design and omitted here (they are
                verified against exact Jaccard/Hamming in tests/).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from aws_dla_kinesis_delivery_stream_example_spark.plans import all_specs


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    specs = all_specs()
    return specs["q01_pricing_summary"].spark(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: spec.spark for name, spec in sorted(all_specs().items())}


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL per query (omitted => rows-only check)."""
    return {
        name: spec.oracle
        for name, spec in sorted(all_specs().items())
        if spec.oracle is not None
    }
