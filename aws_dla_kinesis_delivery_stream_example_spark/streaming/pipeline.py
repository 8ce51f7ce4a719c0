"""Pipeline builder (SURVEY.md §3.4): construct the reference's full
topology — one source, two delivery streams (S3-style JSON-lines sink
and OpenSearch-style document sink), each with its own transform,
backup, error routing and checkpoint — and run them.

The reference assembles this with CloudFormation resource groups
(rg5/rg6 both consuming one Kinesis stream, iac/s2_app.py:314-316,
:836-839); here it's two DeliveryPipeline instances over one source
directory.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import SparkSession

from .delivery import DeliveryPipeline


@dataclass
class DualDelivery:
    to_s3: DeliveryPipeline
    to_docs: DeliveryPipeline

    def run(self) -> "DualDelivery":
        self.to_s3.run()
        self.to_docs.run()
        return self

    def reconciled(self) -> bool:
        """The reference's E2E acceptance (README.rst:113-124): both
        branches account for every input record."""
        return (
            self.to_s3.result.reconciled()
            and self.to_docs.result.reconciled()
            and self.to_s3.result.n_input == self.to_docs.result.n_input
        )

    def counts(self) -> dict:
        return {
            "n_input": self.to_s3.result.n_input,
            "s3_ok": self.to_s3.result.n_ok,
            "s3_failed": self.to_s3.result.n_failed,
            "docs_ok": self.to_docs.result.n_ok,
            "docs_indexed": self.to_docs.count_documents(),
        }


def build_dual_delivery(
    spark: SparkSession,
    source_dir: str,
    dest_root: str,
    transform_s3: Callable[[dict], dict] | None = None,
    transform_docs: Callable[[dict], dict] | None = None,
    trigger_seconds: int | None = None,
    index_rotation: str = "NoRotation",
) -> DualDelivery:
    """The two-destination fan-out: independent transforms, buffers,
    backups and checkpoints per branch, one shared source."""
    return DualDelivery(
        to_s3=DeliveryPipeline(
            spark,
            source_dir,
            f"{dest_root}/to-s3",
            transform_fn=transform_s3,
            trigger_seconds=trigger_seconds,
        ),
        to_docs=DeliveryPipeline(
            spark,
            source_dir,
            f"{dest_root}/to-oss",
            transform_fn=transform_docs,
            document_sink=True,
            trigger_seconds=trigger_seconds,
            index_rotation=index_rotation,
        ),
    )
