"""Kinesis source binding integration test (SURVEY.md §2.1 S3) against
the fake-kinesis Python Data Source: the same ``kinesis_reader`` entry
point a real cluster uses, fed by a Kinesis-shaped in-process source,
decoded through the D1 envelope path."""

from __future__ import annotations

import json

import pytest

from aws_dla_kinesis_delivery_stream_example_spark.functions.serde import (
    BANK_ACCOUNT_SCHEMA,
)
from aws_dla_kinesis_delivery_stream_example_spark.sources import kinesis_testing
from aws_dla_kinesis_delivery_stream_example_spark.sources.jsonlines import (
    generate_bank_accounts,
    kinesis_reader,
    produce_jsonlines,
)


def _drain(stream_df, tmp_path, name):
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .option("checkpointLocation", str(tmp_path / f"_ck_{name}"))
        .start()
    )
    q.processAllAvailable()
    q.stop()


def test_kinesis_reader_decodes_envelope(spark, tmp_path):
    """Records flow stream-shaped (data/partitionKey/sequenceNumber/
    arrival ts) through kinesis_reader and decode to the payload schema
    with metadata preserved."""
    src = str(tmp_path / "stream")
    produce_jsonlines(generate_bank_accounts(spark, 120, partitions=4), src)
    kinesis_testing.register(spark)

    df = kinesis_reader(
        spark, stream_name=src, fmt="fake-kinesis", schema=BANK_ACCOUNT_SCHEMA
    )
    assert df.isStreaming
    _drain(df, tmp_path, "kin_decoded")
    out = spark.sql("select * from kin_decoded")
    assert out.count() == 120
    cols = set(out.columns)
    assert {"id", "firstname", "balance", "partitionKey", "sequenceNumber"} <= cols
    rows = out.collect()
    # partitionKey carries the record's id field (the reference's
    # put_records partition key, multi_process_producer.py:41-47)
    assert all(r.partitionKey == r.id for r in rows)
    assert len({r.sequenceNumber for r in rows}) == 120  # unique seq numbers


def test_kinesis_reader_raw_envelope_roundtrip(spark, tmp_path):
    """Without a schema the raw connector envelope comes back; data is
    the exact utf-8 payload bytes."""
    src = str(tmp_path / "stream")
    produce_jsonlines(generate_bank_accounts(spark, 30, partitions=2), src)
    kinesis_testing.register(spark)

    raw = kinesis_reader(spark, stream_name=src, fmt="fake-kinesis")
    _drain(raw, tmp_path, "kin_raw")
    rows = spark.sql("select * from kin_raw").collect()
    assert len(rows) == 30
    for r in rows:
        rec = json.loads(bytes(r.data).decode("utf-8"))
        assert rec["id"] == r.partitionKey


def test_kinesis_reader_incremental_offsets(spark, tmp_path):
    """New shard files after a drain are picked up as NEW records only
    (offset = consumed-file set): the connector's resume contract."""
    src = str(tmp_path / "stream")
    produce_jsonlines(generate_bank_accounts(spark, 50, partitions=2), src)
    kinesis_testing.register(spark)

    df = kinesis_reader(
        spark, stream_name=src, fmt="fake-kinesis", schema=BANK_ACCOUNT_SCHEMA
    )
    q = (
        df.writeStream.format("memory")
        .queryName("kin_inc")
        .option("checkpointLocation", str(tmp_path / "_ck_inc"))
        .start()
    )
    q.processAllAvailable()
    assert spark.sql("select count(*) c from kin_inc").first().c == 50
    produce_jsonlines(generate_bank_accounts(spark, 25, partitions=1), src)
    q.processAllAvailable()
    q.stop()
    assert spark.sql("select count(*) c from kin_inc").first().c == 75


def test_missing_connector_raises_with_instructions(spark):
    """The real connector jar is absent here: the raise tells the user
    what to add instead of failing obscurely."""
    with pytest.raises(NotImplementedError, match="connector"):
        kinesis_reader(spark, stream_name="some-stream")
