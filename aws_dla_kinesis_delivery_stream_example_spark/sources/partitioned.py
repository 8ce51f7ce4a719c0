"""Date-partitioned storage layout (SCALE.md 'Scans': partition
pruning). At 100 TB the events lake is laid out as
``.../event_date=YYYY-MM-DD/part-*.parquet`` so a date-bounded query
reads only the matching directories — the scan-level win that predicate
pushdown alone cannot give (pushdown skips row groups AFTER listing a
file; partition pruning never lists the file at all).

This module materializes that layout from the flat test table
(idempotently, keyed by source mtime so a regenerated testdata set
invalidates the copy) and exposes the pruned reader.
tests/test_partition_pruning.py asserts ``PartitionFilters`` actually
reaches the scan.
"""

from __future__ import annotations

import hashlib
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .tables import load_table


def partitioned_events_path(sf_dir: str) -> str:
    src = os.path.join(sf_dir, "events.parquet")
    key = hashlib.md5(
        f"{os.path.abspath(src)}:{os.path.getmtime(src)}".encode()
    ).hexdigest()[:12]
    return os.path.join(
        tempfile.gettempdir(), f"spark_graft_events_by_date_{key}"
    )


def materialize_partitioned_events(spark: SparkSession, sf_dir: str) -> str:
    """Write events once as parquet partitioned by ``event_date``;
    reuse the copy for later calls (the _SUCCESS marker gates reuse,
    and the mtime-keyed path invalidates on testdata regeneration)."""
    path = partitioned_events_path(sf_dir)
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        ev = load_table(spark, sf_dir, "events").withColumn(
            "event_date", F.to_date("ts")
        )
        ev.write.partitionBy("event_date").mode("overwrite").parquet(path)
    return path


def read_events_for_dates(
    spark: SparkSession, sf_dir: str, start_date: str, end_date: str
) -> DataFrame:
    """Date-bounded scan over the partitioned layout. The BETWEEN on
    the partition column compiles to PartitionFilters — directories
    outside the range are never listed, let alone read."""
    path = materialize_partitioned_events(spark, sf_dir)
    df = spark.read.parquet(path)
    return df.filter(F.col("event_date").between(start_date, end_date))
