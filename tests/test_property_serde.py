"""Property-based golden round-trip: arbitrary records (unicode strings,
signed ints, nulls) must survive encode -> envelope transform -> decode
byte-for-byte with status Ok (the reference's identity contract holds
for ANY JSON payload, §1.3 schema-on-read)."""

from __future__ import annotations

import base64
import json

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from aws_dla_kinesis_delivery_stream_example_spark.streaming.envelope import handle_event

# printable unicode text without JSON-hostile control chars
_text = st.text(
    alphabet=st.characters(blacklist_categories=("Cs", "Cc")), min_size=0, max_size=40
)

_record = st.fixed_dictionaries(
    {
        "id": st.uuids().map(str),
        "firstname": _text,
        "lastname": _text,
        "description": _text,
        "balance": st.one_of(st.none(), st.integers(min_value=-(2**31), max_value=2**31)),
    }
)


def _b64(record: dict) -> str:
    return base64.b64encode(
        (json.dumps(record, ensure_ascii=False) + "\n").encode("utf-8")
    ).decode("utf-8")


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(records=st.lists(_record, min_size=1, max_size=8))
def test_identity_roundtrip_any_payload(spark, records):
    event = {
        "records": [
            {"recordId": f"r{i}", "approximateArrivalTimestamp": i, "data": _b64(r)}
            for i, r in enumerate(records)
        ]
    }
    out = handle_event(spark, event)
    assert [r["recordId"] for r in out["records"]] == [f"r{i}" for i in range(len(records))]
    for rec_in, rec_out in zip(records, out["records"]):
        assert rec_out["result"] == "Ok"
        decoded = json.loads(base64.b64decode(rec_out["data"]).decode("utf-8"))
        assert decoded == rec_in