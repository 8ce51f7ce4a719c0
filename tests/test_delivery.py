"""Delivery-pipeline tests (SURVEY.md §5.2 items 1-2): golden
round-trip, status routing, zero-loss reconciliation, exactly-once,
fan-out — the reference's own test strategy generalized."""

from __future__ import annotations

import json
import os

import pytest

from aws_dla_kinesis_delivery_stream_example_spark.sources.jsonlines import (
    generate_bank_accounts,
    produce_jsonlines,
)
from aws_dla_kinesis_delivery_stream_example_spark.streaming.delivery import (
    PREFIX_BACKUP,
    PREFIX_BACKUP_FAILED,
    PREFIX_FAILED,
    PREFIX_SUCCESS,
    DeliveryPipeline,
)
from aws_dla_kinesis_delivery_stream_example_spark.streaming.doc_sink import DocumentSink
from aws_dla_kinesis_delivery_stream_example_spark.streaming.transform import DropIt

N = 2000


def _transform(rec: dict) -> dict:
    if rec["firstname"].endswith("7"):
        raise DropIt()
    if rec["lastname"].endswith("3"):
        raise ValueError("boom")
    rec["balance"] = rec["balance"] + 1
    return rec


@pytest.fixture(scope="module")
def source_dir(spark, tmp_path_factory):
    src = str(tmp_path_factory.mktemp("delivery") / "src")
    produce_jsonlines(generate_bank_accounts(spark, N, partitions=10), src)
    return src


@pytest.fixture(scope="module")
def pipeline(spark, source_dir, tmp_path_factory):
    dest = str(tmp_path_factory.mktemp("delivery") / "d1")
    p = DeliveryPipeline(spark, source_dir, dest, transform_fn=_transform, document_sink=True)
    p.run()
    return p


def _read_lines(spark, path):
    return [json.loads(r.value) for r in spark.read.text(path).collect()]


def test_reconciliation(pipeline):
    """Zero-loss: input == OK + Dropped + ProcessingFailed (README.rst:113-124)."""
    r = pipeline.result
    assert r.n_input == N
    assert r.reconciled()
    assert r.n_dropped > 0 and r.n_failed > 0 and r.n_ok > 0


def test_sink_counts_match_statuses(spark, pipeline):
    r = pipeline.result
    assert pipeline.count_sink_records(PREFIX_SUCCESS) == r.n_ok
    assert pipeline.count_sink_records(PREFIX_FAILED) == r.n_failed
    assert pipeline.count_sink_records(PREFIX_BACKUP) == r.n_input  # K3 raw backup
    assert pipeline.count_documents() == r.n_ok  # K4 document sink
    assert pipeline.count_sink_objects(PREFIX_SUCCESS) > 0  # A2


def test_failed_sink_preserves_original_payload(spark, source_dir, pipeline):
    """ProcessingFailed routes the ORIGINAL record (kds_helper.py:49-51)."""
    src = {r["id"]: r for r in _read_lines(spark, source_dir)}
    failed = _read_lines(spark, pipeline.path(PREFIX_FAILED))
    assert failed and all(src[r["id"]] == r for r in failed)


def test_transform_applied_to_ok(spark, pipeline):
    ok = _read_lines(spark, pipeline.path(PREFIX_SUCCESS))
    assert ok and all(r["balance"] == 1 for r in ok)


def test_exactly_once_rerun(spark, pipeline):
    """Re-running on the same checkpoint adds nothing (stronger than the
    reference's at-least-once, SURVEY.md §2.9)."""
    before = pipeline.count_sink_records(PREFIX_SUCCESS)
    pipeline.run()
    assert pipeline.count_sink_records(PREFIX_SUCCESS) == before


def test_identity_fanout_golden_roundtrip(spark, source_dir, tmp_path):
    """Second delivery stream off the same source (K5) with the identity
    transform: output == input byte-for-byte (tests/test_lbd_to_s3.py
    golden-roundtrip parity)."""
    p2 = DeliveryPipeline(spark, source_dir, str(tmp_path / "d2"))
    p2.run()
    src = {r["id"]: r for r in _read_lines(spark, source_dir)}
    out = _read_lines(spark, p2.path(PREFIX_SUCCESS))
    assert len(out) == N
    assert all(src[r["id"]] == r for r in out)


def test_doc_sink_retry(spark, source_dir, tmp_path):
    """K7: one bounded retry, then success."""
    p = DeliveryPipeline(
        spark,
        source_dir,
        str(tmp_path / "d3"),
        document_sink=True,
        doc_sink_failure_injector=lambda attempt: attempt == 0,
    )
    p.run()
    assert p.result.doc_sink_retries == 1
    assert p.count_documents() == N


def test_incremental_batch_pickup(spark, pipeline, source_dir):
    """New files landing in the source dir are consumed incrementally."""
    produce_jsonlines(generate_bank_accounts(pipeline.spark, 100, partitions=2), source_dir)
    pipeline.run()
    assert pipeline.result.n_input == N + 100
    assert pipeline.result.reconciled()
    assert pipeline.count_sink_records(PREFIX_BACKUP) == N + 100


def test_unicode_roundtrip(spark, tmp_path):
    """ensure_ascii=False parity: non-ASCII survives the serde raw,
    not as \\uXXXX escapes (D2, kds_helper.py:15)."""
    src = str(tmp_path / "src")
    df = spark.createDataFrame(
        [("ü-1", "Ünïcode", "Tëst", "日本語テキスト", 0)],
        "id string, firstname string, lastname string, description string, balance long",
    )
    produce_jsonlines(df, src)
    p = DeliveryPipeline(spark, src, str(tmp_path / "out"))
    p.run()
    raw = spark.read.text(p.path(PREFIX_SUCCESS)).collect()[0].value
    assert "日本語テキスト" in raw and "\\u" not in raw
    assert json.loads(raw)["firstname"] == "Ünïcode"

def test_index_rotation(spark, source_dir, tmp_path):
    """K6: OneDay rotation partitions the document sink by a
    date-derived index name; NoRotation stays flat."""
    import re

    p = DeliveryPipeline(
        spark,
        source_dir,
        str(tmp_path / "rot"),
        document_sink=True,
        index_rotation="OneDay",
    )
    p.run()
    docs = spark.read.parquet(p.path("documents"))
    names = {r.index_name for r in docs.select("index_name").distinct().collect()}
    assert len(names) >= 1
    assert all(re.fullmatch(r"documents-\d{4}-\d{2}-\d{2}", n) for n in names)
    assert docs.count() == p.result.n_ok
    # determinism under replay: the per-batch rotation epoch is recorded
    # durably at first attempt, so a crash-replay crossing a rotation
    # boundary re-derives the SAME index name (no stranded duplicates).
    e0 = p._rotation_epoch(0)
    assert p._rotation_epoch(0) == e0
    epoch_dir = os.path.join(str(tmp_path / "rot"), "_index_epoch")
    assert os.path.isdir(epoch_dir) and os.listdir(epoch_dir)


def test_backup_failure_branch(spark, source_dir, tmp_path):
    """K3 failure branch: when the raw-backup write fails past its one
    bounded retry, original rows land under 02-backup-failed/
    (reference prefix config kds_example/iac/s2_app.py:806-808)."""
    p = DeliveryPipeline(
        spark,
        source_dir,
        str(tmp_path / "bf"),
        backup_failure_injector=lambda attempt: True,  # both attempts fail
    )
    p.run()
    r = p.result
    assert r.reconciled() and r.n_input > 0
    assert r.n_backup_failed == r.n_input
    assert r.backup_retries == 2 * r.n_batches  # initial + 1 retry per batch
    assert p.count_sink_records(PREFIX_BACKUP) == 0
    assert p.count_sink_records(PREFIX_BACKUP_FAILED) == r.n_input
    # the failure branch preserves the ORIGINAL pre-transform records
    src = {rec["id"]: rec for rec in _read_lines(spark, source_dir)}
    backed = _read_lines(spark, p.path(PREFIX_BACKUP_FAILED))
    assert backed and all(src[rec["id"]] == rec for rec in backed)


class _RecordingSink(DocumentSink):
    """Fake bulk-index client for the K4 seam test."""

    def __init__(self) -> None:
        self.batches: list[tuple[int, int]] = []

    def bulk_index(self, docs, batch_id: int) -> None:
        self.batches.append((batch_id, docs.count()))


class _DownSink(DocumentSink):
    def bulk_index(self, docs, batch_id: int) -> None:
        raise IOError("cluster unreachable")


def test_document_client_seam(spark, source_dir, tmp_path):
    """K4 seam: the pipeline talks only to the DocumentSink interface, so
    a client-backed implementation (opensearch-py bulk,
    kds_example/oss_utils.py:54-63) drops in without pipeline changes."""
    client = _RecordingSink()
    p = DeliveryPipeline(spark, source_dir, str(tmp_path / "seam"), document_client=client)
    p.run()
    assert p.document_sink is True  # passing a client enables the sink
    assert client.batches and sum(n for _, n in client.batches) == p.result.n_ok


def test_document_client_failure_routes_to_error(spark, source_dir, tmp_path):
    """K7 through the seam: a client that stays down exhausts the one
    bounded retry and the batch's payloads route to the error prefix."""
    p = DeliveryPipeline(spark, source_dir, str(tmp_path / "seamf"), document_client=_DownSink())
    p.run()
    r = p.result
    assert r.doc_sink_retries == 2 * r.n_batches
    assert p.count_sink_records(PREFIX_FAILED) == r.n_ok + r.n_failed


def test_replay_batch_is_idempotent(spark, tmp_path):
    """Exactly-once under mid-batch crash: replaying the SAME micro-batch
    (what the checkpoint does after a crash between a sink write and the
    offset commit) rewrites its batch_id partitions instead of appending
    duplicates."""
    src = str(tmp_path / "src")
    produce_jsonlines(generate_bank_accounts(spark, 200, partitions=2), src)
    p = DeliveryPipeline(spark, src, str(tmp_path / "out"), document_sink=True)
    batch = spark.read.schema(p.payload_schema).json(src)
    p._process_batch(batch, 0)
    assert p.count_sink_records(PREFIX_SUCCESS) == 200
    p._process_batch(batch, 0)  # simulated post-crash replay
    assert p.count_sink_records(PREFIX_SUCCESS) == 200
    assert p.count_sink_records(PREFIX_BACKUP) == 200
    assert p.count_documents() == 200


def test_kinesis_stub_raises_cleanly(spark):
    from aws_dla_kinesis_delivery_stream_example_spark.sources.jsonlines import kinesis_reader

    with pytest.raises(NotImplementedError, match="connector"):
        kinesis_reader(spark, "my-stream")


def test_dual_delivery_topology(spark, source_dir, tmp_path):
    """§3.4 full-topology parity: one source, two branches, E2E
    reconciliation across both (the reference's acceptance check)."""
    from aws_dla_kinesis_delivery_stream_example_spark.streaming.pipeline import build_dual_delivery

    dual = build_dual_delivery(spark, source_dir, str(tmp_path / "dual")).run()
    assert dual.reconciled()
    c = dual.counts()
    assert c["s3_ok"] == c["n_input"] == c["docs_ok"] == c["docs_indexed"]


def test_byte_size_flush(spark, source_dir, tmp_path):
    """B1 size-based flush: ``max_buffer_bytes`` maps to the file
    source's maxBytesPerTrigger, so each micro-batch admits at most the
    byte cap (whole-file rounding) — the Firehose BufferingHints
    SizeInMBs condition (iac/s2_app.py:323-326), previously only
    approximated by trigger interval + file count."""
    import glob

    files = [f for f in glob.glob(os.path.join(source_dir, "part-*")) if not f.endswith(".crc")]
    sizes = [os.path.getsize(f) for f in files]
    cap = max(sizes) + 1  # ~one file per flush after whole-file rounding
    p = DeliveryPipeline(spark, source_dir, str(tmp_path / "bytes"), max_buffer_bytes=cap)
    p.run()
    n_source = spark.read.text(source_dir).count()
    assert p.result.n_input == n_source  # no rows lost to the batching change
    progress = [
        pr for pr in p._progress_dicts(p.last_query) if pr.get("numInputRows", 0) > 0
    ]
    # 10+ source files at ~one file per flush: strictly more than one
    # micro-batch, and no batch admits more than cap + one file of rows.
    assert len(progress) > 1
    max_rows_per_file = max(spark.read.text(f).count() for f in files)
    assert all(pr["numInputRows"] <= 2 * max_rows_per_file for pr in progress)
