"""Event-table queries: the batch-expressible faces of the streaming
surface (SURVEY.md §2.9 / §2.12 'Streaming (events table)' row).

Each query here is the *batch* form; ``streaming/windows.py`` runs the
identical logical plan through Structured Streaming on a closed input
and the test suite asserts stream == batch (FIXTURES.md determinism
rule). Window starts are epoch-aligned so DuckDB `time_bucket`/
`date_trunc` reproduce Spark's `window()` bucketing exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .catalog import query

_FMT_SPARK = "yyyy-MM-dd HH:mm:ss"


@query(
    "q20_tumbling_window",
    oracle="""
        SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
               event_type,
               count(*) AS n,
               round(sum(value), 2) AS sum_value
        FROM events
        GROUP BY window_start, event_type
        ORDER BY window_start, event_type
    """,
    description="Tumbling 1-hour event-time window counts (B1-B4 buffer "
    "semantics generalized to event time)",
    tags=("events", "window"),
)
def q20_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(
            F.date_format("w.start", _FMT_SPARK).alias("window_start"),
            "event_type",
            "n",
            "sum_value",
        )
        .orderBy("window_start", "event_type")
    )


@query(
    "q21_sliding_window",
    oracle="""
        WITH b AS (SELECT time_bucket(INTERVAL '30 minutes', ts) AS b30, value FROM events),
             w AS (SELECT b30 AS wstart, value FROM b
                   UNION ALL
                   SELECT b30 - INTERVAL '30 minutes' AS wstart, value FROM b)
        SELECT strftime(wstart, '%Y-%m-%d %H:%M:%S') AS window_start,
               count(*) AS n,
               round(sum(value), 2) AS sum_value
        FROM w
        GROUP BY wstart
        ORDER BY window_start
    """,
    description="Sliding window (1 h size, 30 min slide): every event lands "
    "in exactly two windows",
    tags=("events", "window"),
)
def q21_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(F.date_format("w.start", _FMT_SPARK).alias("window_start"), "n", "sum_value")
        .orderBy("window_start")
    )


@query(
    "q22_sessionization",
    oracle="""
        WITH flagged AS (
            SELECT user_id, ts,
                   CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                             > INTERVAL '30 minutes'
                        OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                        THEN 1 ELSE 0 END AS new_session
            FROM events
        ),
        sessions AS (
            SELECT user_id,
                   sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
            FROM flagged
        ),
        per_session AS (
            SELECT user_id, session_id, count(*) AS session_len
            FROM sessions GROUP BY user_id, session_id
        )
        SELECT user_id,
               count(*) AS n_sessions,
               CAST(max(session_len) AS BIGINT) AS longest_session,
               CAST(sum(session_len) AS BIGINT) AS total_events
        FROM per_session
        GROUP BY user_id
        ORDER BY user_id
    """,
    description="Sessionization (30-min inactivity gap) via gaps-and-islands; "
    "batch twin of streaming session_window(ts, '30 minutes')",
    tags=("events", "window", "session"),
)
def q22_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = ev.withColumn(
        "new_session",
        F.when(
            F.lag("ts").over(w).isNull()
            | (F.col("ts").cast("long") - F.lag("ts").over(w).cast("long") > 1800),
            1,
        ).otherwise(0),
    )
    sessions = flagged.withColumn(
        "session_id",
        F.sum("new_session").over(
            W.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(W.unboundedPreceding, W.currentRow)
        ),
    )
    per_session = sessions.groupBy("user_id", "session_id").agg(F.count("*").alias("session_len"))
    return (
        per_session.groupBy("user_id")
        .agg(
            F.count("*").alias("n_sessions"),
            F.max("session_len").alias("longest_session"),
            F.sum("session_len").alias("total_events"),
        )
        .orderBy("user_id")
    )


@query(
    "q23_event_dedup",
    oracle="""
        SELECT user_id, event_type, event_id, epoch_us(ts) AS ts_us
        FROM (
            SELECT user_id, event_type, event_id, ts,
                   row_number() OVER (PARTITION BY user_id, event_type
                                      ORDER BY ts, event_id) AS rn
            FROM events
        )
        WHERE rn = 1
        ORDER BY user_id, event_type
    """,
    description="Keep-first dedup per (user_id, event_type) — deterministic "
    "batch twin of streaming dropDuplicatesWithinWatermark",
    tags=("events", "dedup"),
)
def q23_event_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_type", "event_id", F.unix_micros("ts").alias("ts_us"))
        .orderBy("user_id", "event_type")
    )


@query(
    "q24_json_extract",
    oracle="""
        SELECT event_type,
               count(*) AS n,
               CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
               round(avg(CAST(json_extract_string(props, '$.k') AS BIGINT)), 2) AS avg_k
        FROM events
        GROUP BY event_type
        ORDER BY event_type
    """,
    description="Semi-structured access: get_json_object over the props JSON "
    "column (reference §1.1 schemaless-JSON model)",
    tags=("events", "json"),
)
def q24_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        ev.groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(k).alias("sum_k"),
            F.round(F.avg(k), 2).alias("avg_k"),
        )
        .orderBy("event_type")
    )
