"""Event-time streaming analytics (SURVEY.md §2.9 / §2.12 streaming row).

The reference has only processing-time buffers; event-time windows,
watermarks, session windows and streaming dedup are the engine's
generalization. Every function here takes a (possibly streaming)
DataFrame with a ``ts`` timestamp column and returns the transformed
(streaming) DataFrame — the SAME logical plan serves batch and stream,
which is what the closed-input stream==batch tests assert.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _event_time(df: DataFrame, col: str = "ts") -> DataFrame:
    """Defense-in-depth at every watermark site: watermarks require
    TimestampType (LTZ); normalize long-nanos / TIMESTAMP_NTZ encodings
    the same way sources.tables.load_table does, so these operators are
    safe even on a DataFrame that bypassed load_table."""
    from ..sources.tables import normalize_event_time

    return normalize_event_time(df, col)


def tumbling_counts(df: DataFrame, size: str = "1 hour", watermark: str = "2 hours") -> DataFrame:
    df = _event_time(df)
    src = df.withWatermark("ts", watermark) if df.isStreaming else df
    return (
        src.groupBy(F.window("ts", size).alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )


def sliding_counts(
    df: DataFrame, size: str = "1 hour", slide: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    df = _event_time(df)
    src = df.withWatermark("ts", watermark) if df.isStreaming else df
    return (
        src.groupBy(F.window("ts", size, slide).alias("w"))
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"), "n", "sum_value")
    )


def session_counts(df: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours") -> DataFrame:
    df = _event_time(df)
    src = df.withWatermark("ts", watermark) if df.isStreaming else df
    return (
        src.groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count("*").alias("session_len"))
        .select("user_id", "session_len")
    )


def interval_join_counts(
    df: DataFrame,
    left_type: str = "click",
    right_type: str = "purchase",
    horizon: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Stream-stream interval join: pair every ``left_type`` event with
    the same user's ``right_type`` events in ``[ts, ts + horizon]``,
    counted per user.

    Streaming shape: two filtered views of ONE source joined on the
    equi-key plus a bounded event-time range; the watermark + range
    bound let Spark expire join state (without them, state grows
    unboundedly). Inner stream-stream joins emit matches as they are
    found, so an availableNow drain over a closed input produces the
    complete pair set. The same plan runs in batch (the oracle path).
    """
    df = _event_time(df)
    left = df.filter(F.col("event_type") == left_type).select(
        F.col("user_id").alias("l_user"), F.col("ts").alias("l_ts")
    )
    right = df.filter(F.col("event_type") == right_type).select(
        F.col("user_id").alias("r_user"), F.col("ts").alias("r_ts")
    )
    if df.isStreaming:
        left = left.withWatermark("l_ts", watermark)
        right = right.withWatermark("r_ts", watermark)
    pairs = left.join(
        right,
        (F.col("l_user") == F.col("r_user"))
        & (F.col("r_ts") >= F.col("l_ts"))
        & (F.col("r_ts") <= F.col("l_ts") + F.expr(f"INTERVAL {horizon}")),
    )
    return pairs.select(F.col("l_user").alias("user_id"), "l_ts", "r_ts")


def streaming_dedup(df: DataFrame, keys: list[str], watermark: str = "2 hours") -> DataFrame:
    df = _event_time(df)
    if df.isStreaming:
        return df.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(keys)
    return df.dropDuplicates(keys)


def run_on_closed_input(
    spark: SparkSession,
    parquet_path: str,
    op,
    output_mode: str = "append",
    query_name: str = "closed_input_out",
) -> DataFrame:
    """Replay a *closed* parquet input through Structured Streaming and
    return the final result as a batch DataFrame (memory sink +
    availableNow). This is the FIXTURES.md rule: streaming answers are
    verified against the batch answer on the same closed input."""
    schema = spark.read.parquet(parquet_path).schema
    stream = spark.readStream.schema(schema).parquet(parquet_path)
    out = op(stream)
    with tempfile.TemporaryDirectory() as ckpt:
        q = (
            out.writeStream.outputMode(output_mode)
            .format("memory")
            .queryName(query_name)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.sql(f"SELECT * FROM {query_name}")
