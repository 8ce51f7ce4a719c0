"""Streaming queries as first-class catalog entries: each runs the REAL
Structured Streaming path (readStream -> windowed agg / dedup -> memory
sink, availableNow) over the closed events table, so the t2 gate
hash-checks actual streaming execution against the batch-SQL oracle —
not just the batch twin (FIXTURES.md: 'streaming queries are verified
on closed inputs against the equivalent batch query').
"""

from __future__ import annotations

import shutil
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table
from ..streaming import windows as SW
from .catalog import query


def _stream_events_closed(spark: SparkSession, sf_dir: str, op, output_mode: str) -> DataFrame:
    """Replay events (converted to µs timestamps) through a streaming
    query; return the fully-materialized memory-sink table."""
    tmp = tempfile.mkdtemp(prefix="stream_q_")
    name = f"sq_{uuid.uuid4().hex[:10]}"
    try:
        src = f"{tmp}/events"
        load_table(spark, sf_dir, "events").write.parquet(src)
        schema = spark.read.parquet(src).schema
        stream = spark.readStream.schema(schema).parquet(src)
        q = (
            op(stream)
            .writeStream.outputMode(output_mode)
            .format("memory")
            .queryName(name)
            .option("checkpointLocation", f"{tmp}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return spark.table(name)


@query(
    "q50_streaming_tumbling",
    oracle="""
        SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
               event_type,
               count(*) AS n,
               round(sum(value), 2) AS sum_value
        FROM events
        GROUP BY window_start, event_type
        ORDER BY window_start, event_type
    """,
    description="ACTUAL Structured Streaming execution (readStream -> "
    "watermark -> tumbling window -> memory sink, availableNow) on the "
    "closed events table, hash-checked against the batch oracle",
    tags=("streaming", "window"),
)
def q50_streaming_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = _stream_events_closed(spark, sf_dir, SW.tumbling_counts, "complete")
    return out.orderBy("window_start", "event_type")


@query(
    "q51_streaming_dedup",
    oracle="""
        SELECT user_id, event_type, count(*) AS n
        FROM (SELECT DISTINCT user_id, event_type FROM events)
        GROUP BY user_id, event_type
        ORDER BY user_id, event_type
    """,
    description="Streaming dropDuplicatesWithinWatermark on the closed "
    "events table == batch DISTINCT (per-key exactly-one check)",
    tags=("streaming", "dedup"),
)
def q51_streaming_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = _stream_events_closed(
        spark,
        sf_dir,
        lambda df: SW.streaming_dedup(df, ["user_id", "event_type"]).select(
            "user_id", "event_type"
        ),
        "append",
    )
    return (
        out.groupBy("user_id", "event_type")
        .agg(F.count("*").alias("n"))
        .orderBy("user_id", "event_type")
    )
