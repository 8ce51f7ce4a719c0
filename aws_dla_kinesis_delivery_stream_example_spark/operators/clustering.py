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


def _batch_assign(x: np.ndarray, cents: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Rounded-grid nearest-centroid: d2 = |x|^2 - 2 x.C^T + |c|^2 (one
    GEMM), rounded to 6 dp BEFORE argmin (first-min tie-break == the
    oracle's ORDER BY d2, cluster)."""
    c_sq = (cents * cents).sum(axis=1)
    d2 = (x * x).sum(axis=1, keepdims=True) - 2.0 * (x @ cents.T) + c_sq
    d2 = np.round(np.maximum(d2, 0.0), 6)
    best = d2.argmin(axis=1)
    return best, d2[np.arange(len(x)), best]


def assign_with_centroids(
    emb: DataFrame,
    cents: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    include_vector: bool = False,
) -> DataFrame:
    """Assignment pass against an explicit centroid matrix (closure-
    shipped). With ``include_vector`` the embedding rides along, so a
    per-cluster consumer (e.g. SemDeDup pair mining) needs NO corpus
    self-join to get vectors next to cluster ids."""
    schema = _ASSIGN_SCHEMA + (f", {vec_col} array<double>" if include_vector else "")

    def assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            x = np.vstack(pdf[vec_col].to_numpy()).astype("float64")
            best, d2 = _batch_assign(x, cents)
            out = {
                "id": pdf[id_col].to_numpy(),
                "cluster": best.astype("int32"),
                "d2": d2,
            }
            if include_vector:
                out[vec_col] = list(x)
            yield pd.DataFrame(out)

    ensure_shipped(emb.sparkSession)
    return emb.select(id_col, vec_col).mapInPandas(assign, schema=schema)


def kmeans_assign(
    emb: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding", k: int = 8
) -> DataFrame:
    """One Lloyd assignment pass: each vector joins its nearest seed
    centroid by squared euclidean distance.

    Returns (id, cluster, d2) with d2 rounded to 6 dp — the rounding
    grid on which the nearest-centroid decision is made.
    """
    cents = kmeans_seeds(emb, id_col, vec_col, k)  # k x dim, closure-shipped
    return assign_with_centroids(emb, cents, id_col, vec_col)


def updated_centroids(
    emb: DataFrame,
    cents: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> np.ndarray:
    """One Lloyd UPDATE step at scale: per-Arrow-batch partial sums
    (cluster, sum-vector, count) — k x dim doubles per batch, the
    map-side combine — then a tiny global agg; the corpus is scanned
    exactly once and never shuffled. Empty clusters keep their previous
    centroid. New centroids are rounded to 6 dp JVM-side (HALF_UP on
    both engines), the grid the next assignment pass runs on."""

    def partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            x = np.vstack(pdf[vec_col].to_numpy()).astype("float64")
            best, _ = _batch_assign(x, cents)
            rows = []
            for c in np.unique(best):
                m = best == c
                rows.append((int(c), x[m].sum(axis=0).tolist(), int(m.sum())))
            yield pd.DataFrame(rows, columns=["cluster", "s", "cnt"])

    ensure_shipped(emb.sparkSession)
    part = emb.select(id_col, vec_col).mapInPandas(
        partials, schema="cluster int, s array<double>, cnt long"
    )
    # partials are tiny (clusters x partitions); cache them so the two
    # aggregations below cost ONE corpus scan, not two.
    part = part.persist()
    try:
        cnts = part.groupBy("cluster").agg(F.sum("cnt").alias("n"))
        sums = (
            part.select("cluster", F.posexplode("s").alias("pos", "v"))
            .groupBy("cluster", "pos")
            .agg(F.sum("v").alias("sv"))
        )
        rows = (
            sums.join(cnts, "cluster")
            .select(
                "cluster", "pos", F.round(F.col("sv") / F.col("n"), 6).alias("cv")
            )
            .collect()
        )
    finally:
        part.unpersist()
    new = cents.copy()
    for r in rows:
        new[r["cluster"], r["pos"]] = r["cv"]
    return new


def semantic_near_duplicates(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
    threshold: float = 0.4,
    sub_blocks: int | None = None,
    max_cluster_rows: int | None = 50_000,
) -> DataFrame:
    """SemDeDup: cosine near-dup pairs WITHIN k-means clusters.

    The cluster assignment is the candidate-blocking step — pairs
    across clusters are never formed, so the quadratic pair space
    shrinks from O(n^2) to O(n^2/k) and each cluster's upper-triangle
    GEMM runs bucket-locally in one ``applyInPandas`` group. Vectors
    ride along with the assignment (``include_vector``), so no corpus
    self-join is needed to put embeddings next to cluster ids.
    Cosines are rounded to 6 dp before the threshold compare (the
    oracle-stable boundary). Returns (cluster, vec_a, vec_b, cos_sim).

    ``sub_blocks`` is the hot-cluster valve (the q55 ``max_df``
    analogue): when set, each cluster is salted into that many
    sub-blocks keyed by a digest of the 1-dp-ROUNDED vector, and pairs
    form only within a sub-block — pair space drops another
    ``sub_blocks``-fold. Exact duplicates and near-identical vectors
    (equal after rounding) share a digest, so true-dup recall survives
    the split; pairs that are merely similar may land in different
    sub-blocks — the documented recall trade of the valve.

    ``max_cluster_rows`` is the per-group GEMM memory budget: the
    within-group cosine matrix is O(n^2) doubles, so a single hot
    cluster (or hot sub-block) bigger than the budget would OOM one
    executor while the rest of the stage idles. Rather than die
    opaquely mid-GEMM, the group task fails fast with sizing guidance
    (raise the budget, raise ``k``, or set/raise ``sub_blocks``).
    50k rows ~= 20 GB of pairwise doubles — the sensible ceiling for
    a 64 GB executor; pass ``None`` to disable.
    """
    cents = kmeans_seeds(emb, id_col, vec_col, k)
    assigned = assign_with_centroids(emb, cents, id_col, vec_col, include_vector=True)
    group_keys = ["cluster"]
    if sub_blocks is not None:
        import hashlib

        nb = int(sub_blocks)

        def salt(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                g = [
                    int.from_bytes(
                        # + 0.0 normalizes -0.0 -> +0.0: np.round maps
                        # tiny negative components to -0.0, whose BYTE
                        # pattern differs from +0.0 even though the
                        # values compare equal — without it, two
                        # vectors equal after rounding could digest
                        # into different sub-blocks and a true
                        # near-dup pair would be silently missed
                        hashlib.md5(
                            (np.round(np.asarray(v), 1) + 0.0).tobytes()
                        ).digest()[:4],
                        "big",
                    )
                    % nb
                    for v in pdf[vec_col]
                ]
                pdf = pdf.assign(salt=np.array(g, dtype="int32"))
                yield pdf

        from pyspark.sql import types as T

        salted_schema = T.StructType(
            assigned.schema.fields + [T.StructField("salt", T.IntegerType())]
        )
        assigned = assigned.mapInPandas(salt, schema=salted_schema)
        group_keys.append("salt")

    def pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {"cluster": [], "vec_a": [], "vec_b": [], "cos_sim": []}
        ).astype(
            {"cluster": "int32", "vec_a": "int64", "vec_b": "int64", "cos_sim": "float64"}
        )
        if len(pdf) < 2:
            return empty
        if max_cluster_rows is not None and len(pdf) > max_cluster_rows:
            c = int(pdf["cluster"].iloc[0])
            raise ValueError(
                f"semantic_near_duplicates: cluster {c} has {len(pdf)} rows, "
                f"over the max_cluster_rows={max_cluster_rows} GEMM budget "
                f"(~{len(pdf) ** 2 * 8 / 1e9:.1f} GB of pairwise doubles). "
                f"Raise k to split the cluster, set/raise sub_blocks to salt "
                f"it, or raise max_cluster_rows if the executors have the "
                f"memory."
            )
        pdf = pdf.sort_values("id")
        ids = pdf["id"].to_numpy()
        x = np.vstack(pdf[vec_col].to_numpy())
        norms = np.linalg.norm(x, axis=1, keepdims=True)
        norms[norms == 0.0] = 1.0
        s = np.round((x / norms) @ (x / norms).T, 6)
        ia, ib = np.triu_indices(len(ids), k=1)
        keep = s[ia, ib] >= threshold
        if not keep.any():
            return empty
        return pd.DataFrame(
            {
                "cluster": np.full(int(keep.sum()), pdf["cluster"].iloc[0], dtype="int32"),
                "vec_a": ids[ia[keep]],
                "vec_b": ids[ib[keep]],
                "cos_sim": s[ia[keep], ib[keep]],
            }
        )

    ensure_shipped(emb.sparkSession)
    return assigned.groupBy(*group_keys).applyInPandas(
        pairs, schema="cluster int, vec_a long, vec_b long, cos_sim double"
    )


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
