"""Golden round-trip tests of the Firehose envelope protocol — the
engine twin of the reference's own unit test (tests/test_lbd_to_s3.py:
one record, fixed recordId + arrival timestamp, identity transform,
assert decoded output == input)."""

from __future__ import annotations

import base64
import json

import pytest
from pyspark.sql import functions as F

from aws_dla_kinesis_delivery_stream_example_spark.streaming.envelope import (
    envelope_df,
    handle_event,
    transform_envelope,
)
from aws_dla_kinesis_delivery_stream_example_spark.streaming.transform import DropIt


def _b64(record: dict) -> str:
    return base64.b64encode((json.dumps(record) + "\n").encode("utf-8")).decode("utf-8")


def _event(*records: dict) -> dict:
    return {
        "invocationId": "invocationIdExample",
        "deliveryStreamArn": "arn:aws:kinesis:EXAMPLE",
        "region": "us-east-1",
        "records": [
            {
                "recordId": f"rec-{i:04d}",
                "approximateArrivalTimestamp": 1495072949453 + i,
                "data": _b64(r),
            }
            for i, r in enumerate(records)
        ],
    }


REC = {
    "id": "id-1",
    "firstname": "Jane",
    "lastname": "Doe",
    "description": "ten word description sentence here for the golden test",
    "balance": 0,
}


def test_identity_roundtrip(spark):
    """Identity transform: result Ok, decoded data == original record,
    recordId echoed (T1/T3/T6)."""
    out = handle_event(spark, _event(REC))
    assert len(out["records"]) == 1
    r = out["records"][0]
    assert r["recordId"] == "rec-0000"
    assert r["result"] == "Ok"
    decoded = json.loads(base64.b64decode(r["data"]).decode("utf-8"))
    assert decoded == REC


def test_status_routing_and_original_payload(spark):
    """DropIt -> Dropped; exception -> ProcessingFailed with ORIGINAL
    base64 payload (T2/F1/F2)."""

    def fn(rec: dict) -> dict:
        if rec["firstname"] == "dropme":
            raise DropIt()
        if rec["firstname"] == "failme":
            raise ValueError("boom")
        return rec

    ok = dict(REC)
    drop = dict(REC, id="id-2", firstname="dropme")
    fail = dict(REC, id="id-3", firstname="failme")
    event = _event(ok, drop, fail)
    out = handle_event(spark, event, fn=fn)
    by_id = {r["recordId"]: r for r in out["records"]}
    assert len(by_id) == 3  # every recordId echoed exactly once
    assert by_id["rec-0000"]["result"] == "Ok"
    assert by_id["rec-0001"]["result"] == "Dropped"
    assert by_id["rec-0002"]["result"] == "ProcessingFailed"
    # failed + dropped records carry the UNTOUCHED input payload
    assert by_id["rec-0002"]["data"] == event["records"][2]["data"]
    assert by_id["rec-0001"]["data"] == event["records"][1]["data"]


def test_declarative_envelope_transform(spark):
    """Declarative (JVM-only) envelope path with status predicates."""
    recs = [dict(REC, id=f"id-{i}", balance=i * 10) for i in range(10)]
    df = envelope_df(spark, _event(*recs))
    out = transform_envelope(
        df,
        drop_when=F.col("rec.balance") >= 80,
        fail_when=F.col("rec.balance") == 0,
    ).collect()
    results = {r.recordId: r.result for r in out}
    assert results["rec-0000"] == "ProcessingFailed"
    assert results["rec-0008"] == "Dropped" and results["rec-0009"] == "Dropped"
    assert sum(1 for v in results.values() if v == "Ok") == 7


def test_malformed_payload_fails_with_original(spark):
    """Undecodable payload => ProcessingFailed carrying the untouched
    base64 input (reference: json.loads raises => F2 routing)."""
    bad = base64.b64encode(b"not json at all\n").decode("utf-8")
    event = {"records": [{"recordId": "r-bad", "approximateArrivalTimestamp": 1, "data": bad}]}
    out = handle_event(spark, event)
    r = out["records"][0]
    assert r["result"] == "ProcessingFailed" and r["data"] == bad


def test_unicode_envelope_roundtrip(spark):
    rec = dict(REC, description="日本語テキスト with ünïcode")
    out = handle_event(spark, _event(rec))
    decoded = json.loads(base64.b64decode(out["records"][0]["data"]).decode("utf-8"))
    assert decoded["description"] == "日本語テキスト with ünïcode"

def test_decode_failure_outranks_drop_predicate(spark):
    """A record that is BOTH undecodable and drop-matched must route
    to ProcessingFailed with the original payload — in the reference,
    json.loads raises before any DropIt can be evaluated, so a drop
    predicate over the (all-null) decoded fields must never reclassify
    a decode failure as Dropped."""
    bad = base64.b64encode(b"}{ not json\n").decode("utf-8")
    event = {
        "records": [
            {"recordId": "r-bad", "approximateArrivalTimestamp": 1, "data": bad}
        ]
    }
    df = envelope_df(spark, event)
    # isNull() is TRUE on the undecodable record's null balance — the
    # exact predicate shape that used to win over decode failure
    out = transform_envelope(df, drop_when=F.col("rec.balance").isNull()).collect()
    assert out[0]["result"] == "ProcessingFailed"
    assert out[0]["data"] == bad


def test_fn_with_declarative_predicates_raises(spark):
    """The black-box fn owns all routing; combining it with
    drop_when/fail_when must raise instead of silently ignoring the
    predicates (records they matched would otherwise deliver as Ok)."""
    df = envelope_df(
        spark,
        {
            "records": [
                {
                    "recordId": "r-1",
                    "approximateArrivalTimestamp": 1,
                    "data": base64.b64encode(b'{"id": "x"}\n').decode("utf-8"),
                }
            ]
        },
    )
    with pytest.raises(ValueError, match="drop_when"):
        transform_envelope(df, fn=lambda d: d, drop_when=F.lit(True))


def test_stateful_batch_fallback_exact_on_cancellation_set(spark):
    """The batch fallback must sum in the same integer centi-units as
    the streaming state: a raw double sum loses 0.07 to catastrophic
    cancellation on [1e15, 0.07, -1e15] (ulp(1e15) = 0.125)."""
    from aws_dla_kinesis_delivery_stream_example_spark.streaming.stateful import (
        running_user_totals,
    )

    df = spark.createDataFrame(
        [(1, 1e15), (1, 0.07), (1, -1e15)], "user_id long, value double"
    )
    rows = running_user_totals(df).collect()
    assert rows[0]["n_events"] == 3
    assert abs(rows[0]["total_value"] - 0.07) < 1e-9
