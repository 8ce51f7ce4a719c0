"""Parquet table readers for the driver-generated test tables.

Scans are plain ``spark.read.parquet`` so Catalyst keeps predicate
pushdown / column pruning / partition pruning. Never cache here — at
100 TB the tables don't fit; rely on pushdown + pruning instead.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def normalize_event_time(df: DataFrame, col: str = "ts") -> DataFrame:
    """Normalize an event-time column to TimestampType (LTZ, micros)
    regardless of how the parquet writer encoded it. The driver has
    regenerated events.parquet with different encodings across rounds:

    - parquet TIMESTAMP(NANOS): Spark reads it as *long* nanoseconds
      under ``spark.sql.legacy.parquet.nanosAsLong``; truncate ns->us
      (exactly DuckDB's behavior) and rebuild a timestamp.
    - naive ``timestamp[us]``: Spark 4.x infers TIMESTAMP_NTZ
      (``spark.sql.parquet.inferTimestampNTZ.enabled`` defaults true);
      the DuckDB oracle treats the same bytes as UTC wall-clock, so
      reinterpret the NTZ wall-clock as UTC. A plain ``cast`` (and
      ``to_utc_timestamp``, which implicitly casts first) resolves the
      NTZ wall-clock through the *session* timezone, so instead build
      the instant field-by-field with ``make_timestamp(..., 'UTC')`` —
      exact to the microsecond and independent of the session zone.
    - ``timestamp[us]`` with timezone: already TimestampType; pass.
    """
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    if col not in df.columns:
        return df
    dt = df.schema[col].dataType
    if isinstance(dt, T.LongType):
        df = df.withColumn(col, F.timestamp_micros(F.expr(f"{col} DIV 1000")))
    elif isinstance(dt, T.TimestampNTZType):
        df = df.withColumn(
            col,
            F.expr(
                f"make_timestamp(year({col}), month({col}), day({col}), "
                f"hour({col}), minute({col}), "
                f"CAST(date_part('SECOND', {col}) AS DECIMAL(16,6)), 'UTC')"
            ),
        )
    return df


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    if name == "events":
        # Self-sufficient under ANY session (the driver builds its own):
        # if events.ts is TIMESTAMP(NANOS) the reader rejects it unless
        # nanosAsLong is set; and timestamp *rendering* must be UTC for
        # oracle hash parity with DuckDB's naive-UTC timestamps. Both
        # are runtime-settable SQL confs.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        df = normalize_event_time(df, "ts")
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register every table as a temp view (for the SQL-expressed plans)."""
    dfs = load_tables(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs
