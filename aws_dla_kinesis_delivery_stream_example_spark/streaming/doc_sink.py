"""Document-sink client seam (SURVEY.md §2.5 K4).

The reference bulk-indexes transformed records into OpenSearch via an
opensearch-py client (kds_example/oss_utils.py:54-63,
kds_example/iac/s2_app.py:841-899). This module is the pluggable
equivalent: ``DeliveryPipeline`` talks only to the ``DocumentSink``
interface, so a real cluster deployment would swap in a client-backed
implementation without touching the pipeline. The local implementation
is a keyed parquet directory (sanctioned by SURVEY.md §1.5).

Idempotence contract: ``bulk_index`` MUST be a per-``batch_id``
overwrite (replaying a micro-batch after a crash rewrites that batch's
documents instead of appending duplicates) — that is what upgrades the
checkpointed source from at-least-once to effectively-exactly-once.
OpenSearch gets this for free from ``_id``-keyed upserts; the parquet
implementation gets it from dynamic partition overwrite on ``batch_id``.
"""

from __future__ import annotations

import abc

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class DocumentSink(abc.ABC):
    """bulk_index(df) contract — the opensearch-py ``bulk`` seam."""

    @abc.abstractmethod
    def bulk_index(self, docs: DataFrame, batch_id: int) -> None:
        """Index one micro-batch of documents. ``docs`` carries at least
        (id, payload); an ``index_name`` column is present when index
        rotation (K6) is active. Must be idempotent in ``batch_id``."""


class ParquetDocumentSink(DocumentSink):
    """The local OpenSearch stand-in: a keyed parquet directory,
    partitioned by batch_id (idempotent replay); when rotation (K6) is
    active, ``index_name`` rides as a plain data column. Partitioning by
    batch_id ALONE is deliberate: replay overwrite must clobber the whole
    batch even if the (deterministic) index name ever differed, so it can
    never strand rows under a stale index partition."""

    def __init__(self, path: str) -> None:
        self.path = path

    def bulk_index(self, docs: DataFrame, batch_id: int) -> None:
        (
            docs.withColumn("batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(self.path)
        )
