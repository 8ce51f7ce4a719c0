"""A Kinesis-shaped Python Data Source for local integration testing
(SURVEY.md §2.1 S3: stream-as-source binding).

The real deployment binds ``kinesis_reader`` to a spark-sql-kinesis
connector jar. That jar cannot run here, so this module provides a
PySpark 4 *Python Data Source* registered as ``fake-kinesis`` that
emits the SAME record envelope the connector produces::

    data binary, partitionKey string, sequenceNumber string,
    approximateArrivalTimestamp timestamp

backed by a directory of JSON-line files standing in for the stream
("shard files" = put_records batches, reference
data_producer/multi_process_producer.py:41-51). Offsets are the set of
consumed files, so the source is incremental and replayable exactly
like the connector: a restarted query re-reads from its checkpointed
offset, new files are new records.

Usage::

    from aws_dla_kinesis_delivery_stream_example_spark.sources import kinesis_testing
    kinesis_testing.register(spark)
    df = kinesis_reader(spark, stream_name=some_dir, fmt="fake-kinesis",
                        schema=BANK_ACCOUNT_SCHEMA)
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, SimpleDataSourceStreamReader

ENVELOPE_SCHEMA = (
    "data binary, partitionKey string, sequenceNumber string, "
    "approximateArrivalTimestamp timestamp"
)


class _FakeKinesisStreamReader(SimpleDataSourceStreamReader):
    """Offsets = sorted list of fully-consumed files. ``read`` returns
    rows from files not yet in the offset; ``readBetweenOffsets``
    replays the delta deterministically (exactly the connector's
    sequence-number replay contract)."""

    def __init__(self, options: dict) -> None:
        # options arrive lower-cased from the DSv2 bridge
        self.stream_dir = options.get("kinesis.streamname")
        if not self.stream_dir:
            raise ValueError("fake-kinesis requires kinesis.streamName = <dir>")

    def initialOffset(self) -> dict:
        return {"files": []}

    def _list_files(self) -> list[str]:
        import os

        try:
            return sorted(
                f
                for f in os.listdir(self.stream_dir)
                if not f.startswith(("_", ".")) and f.endswith((".json", ".jsonl", ".txt"))
            )
        except FileNotFoundError:
            return []

    def _rows_for(self, files: list[str]):
        import datetime
        import json
        import os

        now = datetime.datetime.now()
        for fn in files:
            with open(os.path.join(self.stream_dir, fn)) as f:
                for i, line in enumerate(f):
                    line = line.strip()
                    if not line:
                        continue
                    try:
                        key = str(json.loads(line).get("id", ""))
                    except ValueError:
                        key = ""
                    # sequenceNumber: (shard-file, line) — monotone per file
                    yield (line.encode("utf-8"), key, f"{fn}:{i}", now)

    def read(self, start: dict):
        all_files = self._list_files()
        new = [f for f in all_files if f not in set(start.get("files", []))]
        return iter(list(self._rows_for(new))), {"files": all_files}

    def readBetweenOffsets(self, start: dict, end: dict):
        delta = [f for f in end.get("files", []) if f not in set(start.get("files", []))]
        return iter(list(self._rows_for(delta)))


class FakeKinesisDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "fake-kinesis"

    def schema(self) -> str:
        return ENVELOPE_SCHEMA

    def simpleStreamReader(self, schema) -> _FakeKinesisStreamReader:
        return _FakeKinesisStreamReader(self.options)


def register(spark) -> None:
    """Register the fake-kinesis source on this session (idempotent)."""
    spark.dataSource.register(FakeKinesisDataSource)
