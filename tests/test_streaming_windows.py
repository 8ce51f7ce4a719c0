"""Streaming semantics tests (SURVEY.md §5.2 item 4): the same logical
plan run through Structured Streaming on a *closed* input must equal
the batch answer."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aws_dla_kinesis_delivery_stream_example_spark.sources.tables import load_table
from aws_dla_kinesis_delivery_stream_example_spark.streaming import windows as SW

from .conftest import SF_SMOKE


@pytest.fixture(scope="module")
def events_parquet(spark, tmp_path_factory):
    """Re-materialize events with us timestamps (the raw file is ns,
    which the streaming parquet reader rejects the same way batch does)."""
    out = str(tmp_path_factory.mktemp("events") / "events_us")
    load_table(spark, SF_SMOKE, "events").write.parquet(out)
    return out


def _batch(spark, path):
    return spark.read.parquet(path)


def _as_sets(df):
    return {tuple(r) for r in df.collect()}


def test_tumbling_stream_equals_batch(spark, events_parquet):
    # complete mode: append would (correctly) hold back the final
    # windows still inside the watermark horizon on a closed input.
    streamed = SW.run_on_closed_input(
        spark, events_parquet, SW.tumbling_counts, output_mode="complete", query_name="t_tumbling"
    )
    batch = SW.tumbling_counts(_batch(spark, events_parquet))
    assert _as_sets(streamed) == _as_sets(batch)


def test_tumbling_append_holds_back_open_windows(spark, events_parquet):
    """Append mode emits only watermark-closed windows: streamed results
    are a strict prefix of the batch answer, missing only the tail."""
    streamed = _as_sets(
        SW.run_on_closed_input(
            spark, events_parquet, SW.tumbling_counts, query_name="t_tumbling_append"
        )
    )
    batch = _as_sets(SW.tumbling_counts(_batch(spark, events_parquet)))
    assert streamed <= batch
    missing = batch - streamed
    max_closed = max(w for w, *_ in streamed)
    assert all(w > max_closed for w, *_ in missing)  # only the open tail


def test_sliding_stream_equals_batch(spark, events_parquet):
    streamed = SW.run_on_closed_input(
        spark, events_parquet, SW.sliding_counts, output_mode="complete", query_name="t_sliding"
    )
    batch = SW.sliding_counts(_batch(spark, events_parquet))
    assert _as_sets(streamed) == _as_sets(batch)


def test_session_window_stream_runs(spark, events_parquet):
    """session_window is streaming-only in this form; assert it produces
    sessions and that per-user totals reconcile with the event count."""
    streamed = SW.run_on_closed_input(
        spark, events_parquet, SW.session_counts, output_mode="complete", query_name="t_session"
    )
    total = streamed.agg(F.sum("session_len")).collect()[0][0]
    n_events = _batch(spark, events_parquet).count()
    assert total == n_events  # every event belongs to exactly one session


def test_streaming_dedup_equals_batch(spark, events_parquet):
    streamed = SW.run_on_closed_input(
        spark,
        events_parquet,
        lambda df: SW.streaming_dedup(df, ["user_id", "event_type"]).select(
            "user_id", "event_type"
        ),
        query_name="t_dedup",
    )
    batch = _batch(spark, events_parquet).select("user_id", "event_type").distinct()
    assert _as_sets(streamed) == _as_sets(batch)


def test_watermark_drops_late_rows(spark, tmp_path):
    """Late-data semantics: with watermark W, a row older than
    max(event time) - W arriving in a LATER micro-batch is dropped."""
    import os

    src = str(tmp_path / "late_src")
    os.makedirs(src)
    # batch 1: events at 10:00 and 12:00 (watermark advances to 10:00)
    spark.createDataFrame(
        [(1, "2024-01-01 10:00:00", "a", 1.0), (2, "2024-01-01 12:00:00", "a", 1.0)],
        "event_id long, ts_s string, event_type string, value double",
    ).selectExpr("event_id", "CAST(ts_s AS TIMESTAMP) ts", "event_type", "value").coalesce(
        1
    ).write.parquet(src + "/b1")

    schema = "event_id long, ts timestamp, event_type string, value double"
    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src + "/b*")
    )
    agg = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count("*").alias("n"))
    )
    ckpt = str(tmp_path / "ckpt")
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName("late_out")
        .option("checkpointLocation", ckpt)
        .start()
    )
    q.processAllAvailable()
    # batch 2: a LATE event at 09:00 — older than watermark (12:00 - 1h)
    spark.createDataFrame(
        [(3, "2024-01-01 09:00:00", "a", 1.0), (4, "2024-01-01 13:00:00", "a", 1.0)],
        "event_id long, ts_s string, event_type string, value double",
    ).selectExpr("event_id", "CAST(ts_s AS TIMESTAMP) ts", "event_type", "value").coalesce(
        1
    ).write.parquet(src + "/b2")
    q.processAllAvailable()
    # batch 3: a flush event far ahead so the watermark passes every
    # earlier window and append mode emits them.
    spark.createDataFrame(
        [(5, "2024-01-01 20:00:00", "a", 1.0)],
        "event_id long, ts_s string, event_type string, value double",
    ).selectExpr("event_id", "CAST(ts_s AS TIMESTAMP) ts", "event_type", "value").coalesce(
        1
    ).write.parquet(src + "/b3")
    q.processAllAvailable()
    q.stop()
    rows = {
        (r["w"]["start"].strftime("%H:%M"), r["n"])
        for r in spark.sql("SELECT * FROM late_out").collect()
    }
    # the 10:00 window closed with n=1: the late 09:00 event never surfaced
    assert ("10:00", 1) in rows
    assert not any(h == "09:00" for h, _ in rows)

def test_interval_join_stream_equals_batch(spark, events_parquet):
    """q73's operator: inner stream-stream interval joins emit matches
    as found, so an availableNow drain over a closed input equals the
    batch range join (the oracle path)."""
    streamed = SW.run_on_closed_input(
        spark, events_parquet, SW.interval_join_counts, query_name="t_ijoin"
    )
    batch = SW.interval_join_counts(_batch(spark, events_parquet))
    assert _as_sets(streamed) == _as_sets(batch)


def test_interval_join_boundaries(spark, tmp_path):
    """Both range endpoints are INCLUSIVE ([l_ts, l_ts + horizon]), the
    join key is per-user, and a purchase strictly before the click never
    pairs — checked to the microsecond, in batch AND streaming."""
    rows = [
        (1, "2024-01-01 10:00:00", 1, "click"),
        (2, "2024-01-01 10:00:00", 1, "purchase"),  # == l_ts -> in
        (3, "2024-01-01 10:30:00", 1, "purchase"),  # == l_ts + 30 min -> in
        (4, "2024-01-01 10:30:00.000001", 1, "purchase"),  # 1 us over -> out
        (5, "2024-01-01 10:10:00", 2, "purchase"),  # other user -> out
        (6, "2024-01-01 09:59:59.999999", 1, "purchase"),  # before click -> out
    ]
    src = str(tmp_path / "ijoin_src")
    df = spark.createDataFrame(
        rows, "event_id long, ts_s string, user_id long, event_type string"
    ).selectExpr("event_id", "CAST(ts_s AS TIMESTAMP) ts", "user_id", "event_type")
    df.coalesce(1).write.parquet(src)

    expected = {
        (1, "2024-01-01 10:00:00", "2024-01-01 10:00:00"),
        (1, "2024-01-01 10:00:00", "2024-01-01 10:30:00"),
    }

    def fmt(out):
        return {
            (r["user_id"], r["l_ts"].strftime("%Y-%m-%d %H:%M:%S"), r["r_ts"].strftime("%Y-%m-%d %H:%M:%S"))
            for r in out.collect()
        }

    batch = SW.interval_join_counts(spark.read.parquet(src))
    assert fmt(batch) == expected
    streamed = SW.run_on_closed_input(
        spark, src, SW.interval_join_counts, query_name="t_ijoin_bounds"
    )
    assert fmt(streamed) == expected


def test_drain_uses_rocksdb_state_store(spark):
    """The catalog drains default to the RocksDB state-store provider
    (the 100 TB backend) and surface state metrics for K8: provider
    custom metrics prove RocksDB was actually active, not just
    configured."""
    from aws_dla_kinesis_delivery_stream_example_spark.plans import all_specs, streaming_q

    from .conftest import SF_SMOKE

    # q91 keeps NoTimeout per-user state, so numRowsTotal stays non-zero
    # on a closed input (dedup/window state is watermark-evicted by end
    # of stream and would legitimately report 0)
    df = all_specs()["q91_streaming_stateful_totals"].spark(spark, SF_SMOKE)
    assert df.count() > 0
    prog = streaming_q.LAST_DRAIN_PROGRESS
    assert prog["provider"].endswith("RocksDBStateStoreProvider")
    ops = prog["stateOperators"]
    assert ops, "stateful drain must report state operators"
    assert ops[0]["numRowsTotal"] > 0
    assert any("rocksdb" in k.lower() for k in ops[0].get("customMetrics", {}))
    # conf restored: the drain must not leak the provider into the session
    assert (
        spark.conf.get("spark.sql.streaming.stateStore.providerClass", None) is None
    )


def test_drain_state_store_flag_reverts_to_hdfs(spark, monkeypatch):
    from aws_dla_kinesis_delivery_stream_example_spark.plans import all_specs, streaming_q

    from .conftest import SF_SMOKE

    monkeypatch.setenv("SPARK_GRAFT_STATE_STORE", "hdfs")
    df = all_specs()["q51_streaming_dedup"].spark(spark, SF_SMOKE)
    assert df.count() > 0
    assert streaming_q.LAST_DRAIN_PROGRESS["provider"] == "hdfs-default"
