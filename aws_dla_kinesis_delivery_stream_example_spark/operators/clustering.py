"""Embedding clustering for corpus curation (SURVEY.md §2.11
extension): the Lloyd assignment step used by SemDeDup-style semantic
dedup and cluster-balanced sampling.

100 TB design notes
-------------------
- Centroids are k x dim doubles — broadcast-sized by construction
  (k <= a few thousand). They ship in the task closure; the corpus-
  sized embedding table streams through ONE ``mapInPandas`` GEMM pass
  (numpy float64, Arrow-batched) — no shuffle at all for assignment,
  and the per-cluster stats are a map-side-combinable aggregation on
  a small int key.
- Seeding is deterministic (the k smallest ids): reproducible across
  engines and runs, which is what makes the step oracle-checkable.
  Production would swap k-means|| seeding; the assignment pass — the
  scale-critical part — is identical.
- Distances are rounded to 6 dp BEFORE the argmin and ties break on
  the cluster index, so the assignment boundary is float-noise-proof
  against an oracle that sums (x-c)^2 in a different order.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..shipping import ensure_shipped

_ASSIGN_SCHEMA = "id long, cluster int, d2 double"


def kmeans_seeds(emb: DataFrame, id_col: str, vec_col: str, k: int) -> np.ndarray:
    """Deterministic seed centroids: the embeddings of the ``k``
    smallest ids (TakeOrderedAndProject — no full sort), as a k x dim
    float64 matrix in id order."""
    rows = emb.select(id_col, vec_col).orderBy(id_col).limit(k).collect()
    if len(rows) < k:
        raise ValueError(f"kmeans_assign: need >= {k} rows, got {len(rows)}")
    return np.array([[float(x) for x in r[1]] for r in rows], dtype=np.float64)


def kmeans_assign(
    emb: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding", k: int = 8
) -> DataFrame:
    """One Lloyd assignment pass: each vector joins its nearest seed
    centroid by squared euclidean distance.

    Returns (id, cluster, d2) with d2 rounded to 6 dp — the rounding
    grid on which the nearest-centroid decision is made.
    """
    cents = kmeans_seeds(emb, id_col, vec_col, k)  # k x dim, closure-shipped
    c_sq = (cents * cents).sum(axis=1)  # |c|^2, precomputed once

    def assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            x = np.vstack(pdf[vec_col].to_numpy()).astype("float64")
            # d2 = |x|^2 - 2 x.C^T + |c|^2 : one GEMM per Arrow batch
            d2 = (x * x).sum(axis=1, keepdims=True) - 2.0 * (x @ cents.T) + c_sq
            d2 = np.round(np.maximum(d2, 0.0), 6)
            best = d2.argmin(axis=1)  # first min => tie-break on cluster idx
            yield pd.DataFrame(
                {
                    "id": pdf[id_col].to_numpy(),
                    "cluster": best.astype("int32"),
                    "d2": d2[np.arange(len(pdf)), best],
                }
            )

    ensure_shipped(emb.sparkSession)
    return emb.select(id_col, vec_col).mapInPandas(assign, schema=_ASSIGN_SCHEMA)


def cluster_profile(assigned: DataFrame) -> DataFrame:
    """Per-cluster size and dispersion stats over an assignment —
    the inertia/balance report a curation pipeline logs per pass."""
    return (
        assigned.groupBy("cluster")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.round(F.avg("d2"), 3).alias("avg_d2"),
            F.round(F.max("d2"), 3).alias("max_d2"),
        )
        .orderBy("cluster")
    )
