"""SparkSession factory.

Defaults are tuned for the local[32] test host but every setting is the
one you'd want on a real cluster too: AQE on (runtime join re-planning,
skew-join splitting, partition coalescing), Arrow on (vectorized
Python<->JVM transfer for the pandas-UDF operators), UTC session
timezone (deterministic timestamp comparison against the DuckDB
oracle — DuckDB timestamps are UTC-naive).

At 100 TB the only knobs that change are ``shuffle.partitions`` (size
for ~128 MB per post-shuffle partition; AQE coalescing makes the
static value a ceiling, not a target) and executor topology, which is
cluster-manager config, not code.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "aws_dla_kinesis_delivery_stream_example_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    """Build (or fetch) the SparkSession used by the engine."""
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    # Python workers must be able to import this package (pandas-UDF
    # closures reference it). Export the repo root BEFORE the JVM forks
    # so workers inherit it. On a real cluster this is --py-files.
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    existing = os.environ.get("PYTHONPATH", "")
    if repo_root not in existing.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            f"{repo_root}{os.pathsep}{existing}" if existing else repo_root
        )
    builder = (
        SparkSession.builder.master(master or f"local[{cpus}]")
        .appName(app_name)
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS),
        )
        # AQE: runtime re-planning — coalesces tiny post-shuffle partitions,
        # converts sort-merge->broadcast when a side turns out small, and
        # splits skewed partitions. All three matter at 100 TB.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Arrow: vectorized transfer for pandas UDF / mapInPandas operators.
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Deterministic timestamps vs the DuckDB oracle.
        .config("spark.sql.session.timeZone", "UTC")
        # The driver-generated events table stores TIMESTAMP(NANOS),
        # which Spark's parquet reader rejects; read as long and convert
        # (sources.tables truncates ns -> us exactly like DuckDB does).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
        # Oversized heaps (90g) measurably HURT here: G1 defers mixed
        # collections until allocation stalls mid-query. 32g keeps GC
        # pauses short and query times stable; override via env if a
        # workload genuinely needs more.
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "32g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
