"""The delivery pipeline (SURVEY.md §2.4 B1-B5, §2.5 K1-K8).

One Structured Streaming query per delivery stream; its foreachBatch
body performs, on each micro-batch (= the Firehose buffer flush):

1. raw backup write (K3: S3BackupMode Enabled — *pre-transform* rows)
2. transform (T1/T2 protocol from .transform)
3. status routing: OK -> success sink (K1), ProcessingFailed -> error
   sink (K2), Dropped -> discarded (F1)
4. optional document sink (K4: the OpenSearch role — local impl is a
   keyed parquet dir; real cluster impl would bulk-index via
   opensearch-py in the same foreachBatch)

Two-destination fan-out (K5) = two DeliveryPipeline instances off the
same source directory, each with its own checkpoint — exactly the
reference's two Firehose streams consuming one Kinesis stream
(kds_example/iac/s2_app.py:314-316, :837-839).

Buffering parity (B1/B2/B4): Firehose's 60 s / 5 MB either-or flush maps
to ``trigger(processingTime="60 seconds")`` for the time condition plus
``max_buffer_bytes=5*1024*1024`` (the file source's maxBytesPerTrigger)
for the size condition — the reference's BufferingHints
(kds_example/iac/s2_app.py:323-326). Spark admits whole files, so a
flush can overshoot the cap by at most one file — the same "at least
one record" rounding Firehose itself documents. ``max_files_per_trigger``
selects the file-count cap instead (the two source limits are mutually
exclusive in Spark); with neither set, availableNow drain mode admits up
to 1000 files per flush.

Exactly-once: checkpointed source offsets + *idempotent per-batch_id
sink writes*. Every sink write lands under a ``batch_id=N`` partition
with dynamic partition overwrite, so a micro-batch replayed after a
mid-batch crash rewrites its own partition instead of appending
duplicates — effectively exactly-once end-to-end, strictly stronger
than the reference's at-least-once + recordId reconciliation (§2.9).
(Driver-side ``DeliveryResult`` counters are in-memory per-run
conveniences and are NOT crash-durable; the durable numbers are the
sink partitions themselves, see ``count_sink_records``.)
Retry (K7): one bounded retry around the document-sink write, then
rows route to the error prefix — reference NumberOfRetries=1
(kds_example/iac/s2_app.py:353-356). The raw-backup write gets the
same bounded retry, after which original rows land under
``02-backup-failed/`` (K3 failure branch,
kds_example/iac/s2_app.py:806-808).

Per-batch counters come from ``df.observe`` (Observation metrics
piggy-backing on the sink writes) — zero extra passes over the batch,
vs. the naive count()-per-sink which costs two full extra scans per
micro-batch at scale.
"""

from __future__ import annotations

import os
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions import serde
from .doc_sink import DocumentSink, ParquetDocumentSink
from .transform import STATUS_DROPPED, STATUS_FAILED, STATUS_OK, apply_transform

# Sink layout mirrors the reference's S3 prefixes
# (kds_example/iac/s2_app.py:804-808).
PREFIX_BACKUP = "01-backup"
PREFIX_BACKUP_FAILED = "02-backup-failed"
PREFIX_SUCCESS = "03-success"
PREFIX_FAILED = "04-failed"


@dataclass
class DeliveryResult:
    """Per-run counters (the reference's reconciliation numbers,
    README.rst:113-124)."""

    n_input: int = 0
    n_ok: int = 0
    n_dropped: int = 0
    n_failed: int = 0
    n_batches: int = 0
    doc_sink_retries: int = 0
    backup_retries: int = 0
    n_backup_failed: int = 0  # K3 failure branch: rows under 02-backup-failed

    def reconciled(self) -> bool:
        return self.n_input == self.n_ok + self.n_dropped + self.n_failed


@dataclass
class DeliveryPipeline:
    """source dir of JSON-line files -> transform -> routed sinks."""

    spark: SparkSession
    source_dir: str
    dest_dir: str
    payload_schema: T.StructType = field(default_factory=lambda: serde.BANK_ACCOUNT_SCHEMA)
    transform_fn: Callable[[dict], dict] | None = None
    document_sink: bool = False
    trigger_seconds: int | None = None  # None => availableNow (drain & stop)
    max_files_per_trigger: int | None = None
    # B1 size-based flush: cap on source bytes admitted per micro-batch
    # (set 5*1024*1024 with trigger_seconds=60 for the reference's
    # BufferingHints 60 s / 5 MB either-or flush). Left None by default:
    # in availableNow drain mode a byte cap only throttles the drain.
    # Mutually exclusive with max_files_per_trigger (Spark rejects
    # both); the file-count cap wins when explicitly set.
    max_buffer_bytes: int | None = None
    doc_sink_failure_injector: Callable[[int], bool] | None = None  # test hook
    backup_failure_injector: Callable[[int], bool] | None = None  # test hook (K3)
    # K4 client seam: pass a DocumentSink implementation (e.g. a real
    # bulk-index client) — defaults to the local parquet stand-in.
    document_client: DocumentSink | None = None
    # K6: Firehose IndexRotationPeriod — the document "index" rotates on
    # delivery time. "NoRotation" = single fixed index (the reference's
    # setting, iac/s2_app.py:845); other values partition the document
    # sink by a time-derived index name.
    index_rotation: str = "NoRotation"  # NoRotation|OneHour|OneDay|OneMonth
    # K8: recentProgress retains only the last N entries (Spark default
    # 100); a drain with more micro-batches would silently undercount
    # throughput() and drop the head of the progress log, so run()
    # raises the session retention to this for the query's lifetime and
    # RESTORES the prior value afterwards (an explicit knob rather than
    # a permanent global side effect on the shared SparkSession).
    progress_retention: int = 10_000

    def __post_init__(self) -> None:
        valid = ("NoRotation", *self._ROTATION_FMT)
        if self.index_rotation not in valid:
            raise ValueError(
                f"index_rotation must be one of {valid}, got {self.index_rotation!r}"
            )
        if self.document_client is not None:
            self.document_sink = True
        elif self.document_sink:
            self.document_client = ParquetDocumentSink(self.path("documents"))
        self.result = DeliveryResult()

    # -- paths ------------------------------------------------------------
    def path(self, prefix: str) -> str:
        return os.path.join(self.dest_dir, prefix)

    @property
    def checkpoint_dir(self) -> str:
        return os.path.join(self.dest_dir, "_checkpoint")

    # -- the micro-batch body (the Lambda-invoke equivalent) --------------
    def _write_partitioned(
        self, df: DataFrame, path: str, flush_key: str, fmt: str
    ) -> None:
        """Idempotent sink write: every flush lands under its own
        ``batch_id=<flush_key>`` partition with dynamic partition
        overwrite, so a replayed micro-batch rewrites its partition
        instead of appending duplicates (the exactly-once upgrade over
        the reference's at-least-once, SURVEY.md §2.9)."""
        (
            df.withColumn("batch_id", F.lit(flush_key))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .format(fmt)
            .save(path)
        )

    def _write_backup(self, with_json: DataFrame, batch_id: int) -> bool:
        """K3: raw pre-transform backup with one bounded retry; on a
        second failure the original rows land under ``02-backup-failed/``
        (reference kds_example/iac/s2_app.py:806-808). Returns True when
        the failure branch was taken. Writes the pre-serialized
        ``json_line`` column as text — same JSON-lines layout as the
        json writer, but reuses the one cached serialization pass."""
        lines = with_json.select("json_line")
        attempts = 0
        while True:
            try:
                if self.backup_failure_injector and self.backup_failure_injector(attempts):
                    raise IOError("injected backup-sink failure")
                self._write_partitioned(
                    lines, self.path(PREFIX_BACKUP), str(batch_id), "text"
                )
                return False
            except Exception:
                attempts += 1
                self.result.backup_retries += 1
                if attempts > 1:  # NumberOfRetries=1 parity
                    self._write_partitioned(
                        lines, self.path(PREFIX_BACKUP_FAILED), str(batch_id), "text"
                    )
                    return True

    def _process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        # Serialize the original rows to JSON ONCE and cache THAT frame:
        # the raw backup (K3) and the transform input share json_line, so
        # caching post-serialization saves a whole Jackson pass per batch
        # (the round-2 plan serialized once for the json-format backup
        # writer and again for the transform input). Persisting BEFORE
        # the emptiness probe also keeps isEmpty() from adding an extra
        # partial source scan to the FileStreamSource numInputRows metric
        # (observed 1004 rows reported for 1000 records): on the cached
        # frame every source partition is read exactly once.
        with_json = batch_df.withColumn(
            "json_line", F.to_json(F.struct(*batch_df.columns))
        ).persist()
        if with_json.isEmpty():
            with_json.unpersist()
            return
        transformed = None  # assigned mid-try; finally must not NameError
        try:
            backup_failed = self._write_backup(with_json, batch_id)

            if self.transform_fn is not None:
                transformed = apply_transform(with_json, fn=self.transform_fn)
            else:  # identity fast path: stays fully JVM-side (T3/T4)
                transformed = apply_transform(
                    with_json, declarative={"payload": F.col("json_line")}
                )
            # Counters piggy-back on the sink writes via df.observe —
            # zero extra passes (vs. a count() per sink = two extra full
            # scans per micro-batch at scale). apply_transform is
            # row-preserving, so count(transformed) == batch input rows.
            obs = Observation()
            transformed = transformed.observe(
                obs,
                F.count(F.lit(1)).alias("n_input"),
                F.sum((F.col("status") == STATUS_OK).cast("long")).alias("n_ok"),
                F.sum((F.col("status") == STATUS_FAILED).cast("long")).alias("n_failed"),
            ).persist()

            ok = transformed.filter(F.col("status") == STATUS_OK)

            # K1: success sink — one JSON-lines "object" per partition per
            # flush, exactly the Firehose buffer-flush layout. This is the
            # first action over `transformed`, so `obs` is populated after
            # it — letting the empty error-sink / doc-sink jobs be skipped
            # instead of launching full passes that write zero rows.
            self._write_partitioned(
                ok.select("payload"), self.path(PREFIX_SUCCESS), str(batch_id), "text"
            )
            m = obs.get  # blocks until the first action over `transformed`

            if (m["n_failed"] or 0) > 0:
                # K2: error sink keeps the ORIGINAL payload.
                failed = transformed.filter(F.col("status") == STATUS_FAILED)
                self._write_partitioned(
                    failed.select("payload"), self.path(PREFIX_FAILED), str(batch_id), "text"
                )

            if self.document_sink and (m["n_ok"] or 0) > 0:
                # Identity path: payload IS the serialized input row, so
                # the document id can come straight from the original
                # column instead of a per-row JSON re-parse in the sink.
                id_from_col = self.transform_fn is None and "id" in batch_df.columns
                self._write_documents(ok, batch_id, id_from_col=id_from_col)

            self.result.n_input += m["n_input"]
            self.result.n_ok += m["n_ok"] or 0
            self.result.n_failed += m["n_failed"] or 0
            self.result.n_dropped = (
                self.result.n_input - self.result.n_ok - self.result.n_failed
            )
            if backup_failed:
                self.result.n_backup_failed += m["n_input"]
            self.result.n_batches += 1
        finally:
            # BOTH persisted frames release in the finally: a sink-write
            # exception otherwise leaks `transformed`, and a crash-replay
            # persists a fresh copy per retry — executor storage memory
            # would grow monotonically across retries
            if transformed is not None:
                transformed.unpersist()
            with_json.unpersist()

    # strftime formats (driver-side): rotation must be computed ONCE per
    # batch from a durable timestamp, not at executor write time.
    _ROTATION_FMT = {"OneHour": "%Y-%m-%d-%H", "OneDay": "%Y-%m-%d", "OneMonth": "%Y-%m"}

    def _rotation_epoch(self, batch_id: int) -> float:
        """Deterministic per-batch delivery time: recorded under
        ``_index_epoch/<batch_id>`` on the FIRST attempt and re-read on
        crash-replay, so a replay that crosses a rotation boundary still
        writes the SAME index as the original attempt (otherwise dynamic
        overwrite of (batch_id, new-index) would leave (batch_id,
        old-index) rows behind — duplicate documents)."""
        import time

        d = os.path.join(self.dest_dir, "_index_epoch")
        os.makedirs(d, exist_ok=True)
        f = os.path.join(d, str(batch_id))
        if os.path.exists(f):
            with open(f) as fh:
                return float(fh.read().strip())
        now = time.time()
        with open(f, "w") as fh:
            fh.write(repr(now))
        return now

    def _write_documents(
        self, ok: DataFrame, batch_id: int, id_from_col: bool = False
    ) -> None:
        """K4: document sink via the pluggable ``DocumentSink`` client
        seam (reference bulk-index: kds_example/oss_utils.py:54-63), with
        one bounded retry (K7); index name rotates by delivery time per
        ``index_rotation`` (K6) — deterministically per batch (idempotent
        under replay)."""
        id_col = (
            F.col("id").cast("string")
            if id_from_col
            else F.get_json_object("payload", "$.id")
        )
        docs = ok.select(id_col.alias("id"), F.col("payload"))
        if self.index_rotation != "NoRotation":
            from datetime import datetime, timezone

            fmt = self._ROTATION_FMT[self.index_rotation]
            # UTC, explicitly: Firehose rotates indexes on UTC
            # boundaries, and a driver-local rendering would defeat the
            # _rotation_epoch replay guard — a restart under a
            # different host TZ would re-render the SAME pinned epoch
            # into a DIFFERENT index name and duplicate the documents
            stamp = datetime.fromtimestamp(
                self._rotation_epoch(batch_id), tz=timezone.utc
            ).strftime(fmt)
            docs = docs.withColumn("index_name", F.lit(f"documents-{stamp}"))
        attempts = 0
        while True:
            try:
                if self.doc_sink_failure_injector and self.doc_sink_failure_injector(attempts):
                    raise IOError("injected document-sink failure")
                self.document_client.bulk_index(docs, batch_id)
                return
            except Exception:
                attempts += 1
                self.result.doc_sink_retries += 1
                if attempts > 1:  # NumberOfRetries=1 parity
                    # fall to error output, original payloads preserved;
                    # distinct flush key so it cannot clobber the K2 write
                    # for the same micro-batch.
                    self._write_partitioned(
                        ok.select("payload"),
                        self.path(PREFIX_FAILED),
                        f"{batch_id}-docs",
                        "text",
                    )
                    return

    # -- run ---------------------------------------------------------------
    def run(self, await_termination: bool = True):
        """Start the streaming query. With trigger_seconds=None uses
        availableNow (drain the source and stop — the test/bench mode)."""
        # Raise the progress retention (see progress_retention field) —
        # Spark reads this conf on EVERY progress update, so it must
        # stay raised for the query's lifetime. The drain path restores
        # the prior value after termination; a continuous-mode caller
        # should call restore_progress_retention() after stopping.
        _RET_KEY = "spark.sql.streaming.numRecentProgressUpdates"
        self._prior_progress_retention = self.spark.conf.get(_RET_KEY, None)
        self.spark.conf.set(_RET_KEY, str(self.progress_retention))
        reader = self.spark.readStream.schema(self.payload_schema)
        if self.max_files_per_trigger is not None:
            reader = reader.option("maxFilesPerTrigger", self.max_files_per_trigger)
        elif self.max_buffer_bytes is not None:
            reader = reader.option("maxBytesPerTrigger", self.max_buffer_bytes)
        else:
            reader = reader.option("maxFilesPerTrigger", 1000)
        reader = reader.json(self.source_dir)
        writer = reader.writeStream.foreachBatch(self._process_batch).option(
            "checkpointLocation", self.checkpoint_dir
        )
        if self.trigger_seconds is None:
            writer = writer.trigger(availableNow=True)
        else:
            writer = writer.trigger(processingTime=f"{self.trigger_seconds} seconds")
        query = writer.start()
        self.last_query = query
        if await_termination and self.trigger_seconds is None:
            try:
                query.awaitTermination()
                self._log_progress(query)
            finally:
                self.restore_progress_retention()
        return query

    def restore_progress_retention(self) -> None:
        """Undo run()'s session-wide progress-retention raise (no-op if
        run() hasn't set it or it was already restored)."""
        _RET_KEY = "spark.sql.streaming.numRecentProgressUpdates"
        prior = getattr(self, "_prior_progress_retention", "unset")
        if prior == "unset":
            return
        if prior is None:
            self.spark.conf.unset(_RET_KEY)
        else:
            self.spark.conf.set(_RET_KEY, prior)
        self._prior_progress_retention = "unset"

    # -- K8 observability: per-delivery-stream progress log --------------
    @staticmethod
    def _progress_dicts(query) -> list[dict]:
        import json

        out = []
        for p in query.recentProgress:
            out.append(p if isinstance(p, dict) else json.loads(p.json))
        return out

    def _log_progress(self, query) -> None:
        """CloudWatch-log-group parity: one JSON line per micro-batch
        (StreamingQueryProgress) under the destination's _progress dir."""
        import json

        prog_dir = os.path.join(self.dest_dir, "_progress")
        os.makedirs(prog_dir, exist_ok=True)
        with open(os.path.join(prog_dir, f"{query.id}.jsonl"), "a") as f:
            for p in self._progress_dicts(query):
                f.write(json.dumps(p, default=str) + "\n")

    def throughput(self) -> dict:
        """A4 parity: rec/s from StreamingQueryProgress
        (numInputRows / batchDuration), the reference's TPS computation
        (data_producer/multi_process_producer.py:55-59)."""
        q = getattr(self, "last_query", None)
        if q is None:
            return {"rows": 0, "duration_ms": 0, "rec_per_s": 0.0}
        # One entry per batchId (last wins): recentProgress can contain
        # replayed/duplicate entries for the same micro-batch, which must
        # not double-count in the reconciliation metric.
        by_batch: dict = {}
        for p in self._progress_dicts(q):
            by_batch[p.get("batchId")] = p
        rows, dur = 0, 0
        for p in by_batch.values():
            rows += p.get("numInputRows", 0) or 0
            dur += (p.get("durationMs") or {}).get("triggerExecution", 0) or 0
        return {
            "rows": rows,
            "duration_ms": dur,
            "rec_per_s": round(rows / (dur / 1000.0), 1) if dur else 0.0,
        }

    # -- inspection surface (SURVEY.md §2.7 A1-A2, §2.8 Q1-Q2) -------------
    def count_sink_records(self, prefix: str) -> int:
        """A1 parity: records = JSON lines under the prefix."""
        try:
            return self.spark.read.text(self.path(prefix)).count()
        except Exception:
            return 0

    def count_sink_objects(self, prefix: str) -> int:
        """A2 parity: number of sink files (one per partition per flush)."""
        p = self.path(prefix)
        if not os.path.isdir(p):
            return 0
        return sum(
            1
            for root, _dirs, files in os.walk(p)
            for f in files
            if not f.startswith(("_", "."))
        )

    def read_success(self) -> DataFrame:
        """Q1 parity: match-all read of the success sink."""
        return self.spark.read.schema(self.payload_schema).json(self.path(PREFIX_SUCCESS))

    def count_documents(self) -> int:
        """A3/Q2 parity: document-sink count."""
        try:
            return self.spark.read.parquet(self.path("documents")).count()
        except Exception:
            return 0
