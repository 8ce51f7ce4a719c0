"""Similarity search over embedding columns (SURVEY.md §2.11).

Execution strategy: JVM expressions are kept for bucketing/ranking,
but the dot products run as Arrow-batched numpy GEMM — embeddings
cross the JVM<->Python boundary ONCE per vector (not once per pair),
and BLAS does the pairwise math. This is deliberately NOT a
per-pair higher-order-function fold: interpreted HOFs allocate per
pair and fall off the codegen fast path.

Strategies, same output contract (q_id, vec_id, cos_sim, rn):

- brute_force_topk: score matrix C@Q.T per candidate partition
  (mapInPandas), then per-query top-k via window row_number. Linear
  in candidates — the exact baseline. Queries are small by contract
  (they ride into the closure like a broadcast variable).
- ivf_topk: both sides keyed by a deterministic sign-pattern bucket
  (functions.vectors.sign_bucket); only the query's bucket is scanned
  (partition pruning on the bucket key at scale).
- embedding_near_duplicates: per-bucket upper-triangle GEMM via
  applyInPandas — pairs never materialize outside the bucket-local
  matrix product.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from ..functions.vectors import sign_bucket
from ..shipping import ensure_shipped

_SCORE_SCHEMA = "q_id long, vec_id long, cos_sim double"
_PAIR_SCHEMA = "vec_a long, vec_b long, cos_sim double"

# "queries are small" is a CONTRACT, not a hope: the query matrix ships
# inside every task closure, so an unbounded query set OOMs the driver
# and every executor. The cap is generous for the ANN-query use case;
# a larger workload is a join problem, not a closure problem.
MAX_QUERY_VECTORS = 10_000


def _collect_queries(queries: DataFrame, op_name: str) -> pd.DataFrame:
    """Enforce the small-queries contract BEFORE collecting: probe one
    row past the cap (limit pushdown — never a full count of an
    arbitrarily large frame) and fail with guidance instead of OOMing."""
    probe = queries.limit(MAX_QUERY_VECTORS + 1).toPandas()
    if len(probe) > MAX_QUERY_VECTORS:
        raise ValueError(
            f"{op_name}: query set exceeds MAX_QUERY_VECTORS="
            f"{MAX_QUERY_VECTORS}; queries ship in the task closure and "
            "must stay small. For bulk query sets, run "
            "embedding_near_duplicates-style bucketed joins instead."
        )
    return probe


def _unit_rows(series: pd.Series) -> np.ndarray:
    m = np.vstack(series.to_numpy()).astype("float64")
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0.0] = 1.0
    return m / norms


def as_queries(df: DataFrame, id_col: str = "vec_id", emb_col: str = "embedding") -> DataFrame:
    return df.select(F.col(id_col).alias("q_id"), F.col(emb_col).alias("q_emb"))


def _topk(scored: DataFrame, k: int) -> DataFrame:
    # Rank on a rounded score (6 dp) with vec_id tiebreak => the rank
    # boundary is float-noise-proof and oracle-reproducible.
    w = W.partitionBy("q_id").orderBy(F.desc(F.round("cos_sim", 6)), F.asc("vec_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("q_id", "vec_id", F.round("cos_sim", 4).alias("cos_sim"), "rn")
    )


def _score_against(candidates: DataFrame, q_ids: np.ndarray, q_mat: np.ndarray) -> DataFrame:
    """Emit (q_id, vec_id, cos) for every candidate x query: one GEMM
    per Arrow batch, candidates stream through exactly once."""

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            c_unit = _unit_rows(pdf["embedding"])
            s = c_unit @ q_mat.T  # (n_cand, n_q)
            n = len(pdf)
            yield pd.DataFrame(
                {
                    "q_id": np.repeat(q_ids, n),
                    "vec_id": np.tile(pdf["vec_id"].to_numpy(), len(q_ids)),
                    "cos_sim": s.T.reshape(-1),
                }
            )

    ensure_shipped(candidates.sparkSession)
    return candidates.mapInPandas(score, schema=_SCORE_SCHEMA).filter(
        F.col("vec_id") != F.col("q_id")
    )


def _empty_topk(spark) -> DataFrame:
    return spark.createDataFrame([], schema=_SCORE_SCHEMA + ", rn int")


def brute_force_topk(candidates: DataFrame, queries: DataFrame, k: int = 10) -> DataFrame:
    """Exact top-k cosine per query. queries must be small (they are
    collected and shipped in the task closure, broadcast-style);
    enforced by ``MAX_QUERY_VECTORS``."""
    qp = _collect_queries(queries, "brute_force_topk")
    if len(qp) == 0:
        return _empty_topk(candidates.sparkSession)
    q_mat = _unit_rows(qp["q_emb"])
    q_ids = qp["q_id"].to_numpy()
    return _topk(_score_against(candidates, q_ids, q_mat), k)


def ivf_topk(
    candidates: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_bits: int = 3,
    hamming_probes: int = 0,
) -> DataFrame:
    """Approximate top-k over sign-pattern buckets.

    ``hamming_probes=0`` probes ONLY the query's own bucket (fastest,
    lowest recall); ``hamming_probes=1`` additionally probes every
    bucket at Hamming distance 1 — the standard multi-probe recall
    lever: a vector whose first ``n_bits`` dims sit near a sign
    boundary lands in a neighboring bucket, and the 1-bit-flip probes
    recover it for ~``n_bits``x more scanned candidates (still a
    2**n_bits-fold reduction vs brute force at 100 TB, and each probe
    stays a partition-prunable bucket filter). Larger radii probe
    every bucket within that Hamming distance (sum of C(n_bits, r)
    flips); radius > n_bits raises — it cannot mean anything.

    Recall contract (geometry-dependent — sign buckets key on the
    signs of the first ``n_bits`` dims): on the planted-blob property
    geometry, ``hamming_probes=0`` measured 0.87-1.0 recall@5 vs brute
    force across seeds and ``hamming_probes=1`` recovered 1.0 on all
    of them; the >= 0.9 floor at 1 probe is pinned by
    tests/test_clustering.py::test_ivf_signbucket_multiprobe_recall."""
    qp = _collect_queries(queries, "ivf_topk")
    if len(qp) == 0:
        return _empty_topk(candidates.sparkSession)
    q_mat = _unit_rows(qp["q_emb"])
    q_ids = qp["q_id"].to_numpy()
    raw = np.vstack(qp["q_emb"].to_numpy())
    weights = np.array([2 ** (n_bits - 1 - i) for i in range(n_bits)])
    q_buckets = ((raw[:, :n_bits] > 0) * weights).sum(axis=1)

    # bucket -> indices of the queries probing it (own bucket plus
    # every bucket within Hamming distance <= hamming_probes when
    # multi-probing — all C(n_bits, r) r-bit flips per radius, not
    # just radius 1, so the parameter means what it says instead of
    # silently capping at 1). Buckets stay disjoint, so each
    # (query, candidate) pair is scored at most once — no dedup needed.
    from itertools import combinations

    if not 0 <= hamming_probes <= n_bits:
        raise ValueError(
            f"ivf_topk: hamming_probes={hamming_probes} outside [0, "
            f"n_bits={n_bits}] — a radius past n_bits cannot flip more "
            "bits than the bucket key has"
        )
    probe_map: dict[int, list[int]] = {}
    for qi, b in enumerate(q_buckets.tolist()):
        probes = {int(b)}
        for r in range(1, hamming_probes + 1):
            for bits in combinations(range(n_bits), r):
                flip = 0
                for j in bits:
                    flip |= 1 << j
                probes.add(int(b) ^ flip)
        for pb in probes:
            probe_map.setdefault(pb, []).append(qi)

    cand_b = candidates.withColumn("bucket", sign_bucket("embedding", n_bits))
    parts = []
    for pb in sorted(probe_map):
        idx = np.array(probe_map[pb])
        parts.append(
            _score_against(
                cand_b.filter(F.col("bucket") == int(pb)).drop("bucket"),
                q_ids[idx],
                q_mat[idx],
            )
        )
    scored = parts[0]
    for p in parts[1:]:
        scored = scored.unionAll(p)
    return _topk(scored, k)


def learned_centroids(
    candidates: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_list: int = 8,
    train_iters: int = 1,
) -> np.ndarray:
    """Train the IVF coarse quantizer: deterministic seeds (k smallest
    ids) refined by ``train_iters`` Lloyd iterations. Every step is on
    the 6-dp rounding grid (clustering._batch_assign /
    updated_centroids), so the trained centroids — and therefore the
    probe decisions — are bit-reproducible across engines and runs."""
    from .clustering import kmeans_seeds, updated_centroids

    cents = kmeans_seeds(candidates, id_col, vec_col, n_list)
    for _ in range(train_iters):
        cents = updated_centroids(candidates, cents, id_col, vec_col)
    return cents


def ivf_learned_topk(
    candidates: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_list: int = 8,
    n_probe: int = 2,
    train_iters: int = 1,
) -> DataFrame:
    """IVF ANN with a LEARNED coarse quantizer (the production shape,
    vs the data-independent sign buckets of ``ivf_topk``): k-means
    centroids partition the corpus into ``n_list`` cells that follow
    the data distribution, and each query scans only its ``n_probe``
    nearest cells — an ``n_list/n_probe``-fold candidate reduction
    that, unlike sign bucketing, does not degrade when the embedding
    mass concentrates away from the coordinate hyperplanes.

    100 TB sizing: n_list ~ sqrt(N) cells keeps both the per-cell scan
    (N/n_list vectors) and the query->centroid argmin (n_list
    broadcast-sized doubles) sub-linear; train on a sample, persist
    the assignment partitioned BY CELL so each probe is a pruned
    partition scan (see SCALE.md 'ANN'). Here the assignment rides in
    the same job; the per-cell filters below are the local-mode analog
    of partition pruning.

    Probe selection happens driver-side on the (tiny, closure-shipped)
    query set: nearest ``n_probe`` centroids by 6-dp-rounded distance
    with index tie-break — the same grid the oracle's SQL reproduces.
    Cells are disjoint, so each (query, candidate) pair is scored at
    most once."""
    from .clustering import assign_with_centroids

    qp = _collect_queries(queries, "ivf_learned_topk")
    if len(qp) == 0:
        return _empty_topk(candidates.sparkSession)
    cents = learned_centroids(candidates, train_iters=train_iters, n_list=n_list)
    q_mat = _unit_rows(qp["q_emb"])
    q_ids = qp["q_id"].to_numpy()
    raw = np.vstack(qp["q_emb"].to_numpy()).astype("float64")
    c_sq = (cents * cents).sum(axis=1)
    d2 = (raw * raw).sum(axis=1, keepdims=True) - 2.0 * (raw @ cents.T) + c_sq
    d2 = np.round(np.maximum(d2, 0.0), 6)

    probe_map: dict[int, list[int]] = {}
    for qi in range(len(q_ids)):
        order = np.argsort(d2[qi], kind="stable")  # ties -> lower cell index
        for cell in order[:n_probe].tolist():
            probe_map.setdefault(int(cell), []).append(qi)

    # The assignment is a full-corpus Python GEMM pass and feeds one
    # filter PER probed cell: stage it so the pass runs once, not once
    # per cell (at 100 TB this is the persisted cell-partitioned
    # assignment table; caller releases via staging.release_staging()).
    from .staging import stage

    assigned = stage(
        assign_with_centroids(
            candidates, cents, include_vector=True
        ).withColumnRenamed("id", "vec_id")
    )
    parts = []
    for cell in sorted(probe_map):
        idx = np.array(probe_map[cell])
        parts.append(
            _score_against(
                assigned.filter(F.col("cluster") == int(cell)).select(
                    "vec_id", "embedding"
                ),
                q_ids[idx],
                q_mat[idx],
            )
        )
    scored = parts[0]
    for p in parts[1:]:
        scored = scored.unionAll(p)
    return _topk(scored, k)


def embedding_near_duplicates(
    df: DataFrame, threshold: float = 0.95, n_bits: int = 3
) -> DataFrame:
    """Embedding-cosine near-dup pairs via per-bucket upper-triangle
    GEMM (near-identical vectors share the sign bucket). Returns
    (vec_a, vec_b, cos_sim >= threshold), vec_a < vec_b. Pairs below
    threshold die inside the bucket-local matrix product — they never
    hit the shuffle."""

    def pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) < 2:
            return pd.DataFrame({"vec_a": [], "vec_b": [], "cos_sim": []}).astype(
                {"vec_a": "int64", "vec_b": "int64", "cos_sim": "float64"}
            )
        pdf = pdf.sort_values("vec_id")
        ids = pdf["vec_id"].to_numpy()
        u = _unit_rows(pdf["embedding"])
        s = u @ u.T
        ia, ib = np.triu_indices(len(ids), k=1)
        keep = s[ia, ib] >= threshold
        return pd.DataFrame(
            {"vec_a": ids[ia[keep]], "vec_b": ids[ib[keep]], "cos_sim": s[ia[keep], ib[keep]]}
        )

    ensure_shipped(df.sparkSession)
    return (
        df.withColumn("bucket", sign_bucket("embedding", n_bits))
        .groupBy("bucket")
        .applyInPandas(pairs, schema=_PAIR_SCHEMA)
    )


def embedding_cross_duplicates(
    new: DataFrame, corpus: DataFrame, threshold: float = 0.95, n_bits: int = 3
) -> DataFrame:
    """Embedding near-dups of a NEW ingest batch against an EXISTING
    corpus — the dense-vector analog of ``curation.incremental_dedup``
    (dedup new data against what is already in the training set, the
    steady-state mode of a production pipeline; ``embedding_near_
    duplicates`` is the one-shot self-join variant).

    Both sides are tagged and unioned so each sign bucket holds its
    new AND corpus members in ONE ``applyInPandas`` group, then a
    cross-block GEMM (new x corpus only — never new x new or corpus x
    corpus) emits (vec_new, vec_corpus, cos_sim >= threshold). Pairs
    below threshold die inside the bucket-local matrix product.

    100 TB shape: one shuffle each side on the bucket key; per-bucket
    work is |new_b| x |corpus_b| x dim — bounded by the same sign-
    bucket blocking as the self-join case, and the new batch is
    typically a small fraction of the corpus, so the cross-block is
    far cheaper than the corpus self-join. No driver-side collect.
    """

    def pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"vec_new": [], "vec_corpus": [], "cos_sim": []}).astype(
            {"vec_new": "int64", "vec_corpus": "int64", "cos_sim": "float64"}
        )
        nw = pdf[pdf["_side"] == 1]
        cp = pdf[pdf["_side"] == 0]
        if nw.empty or cp.empty:
            return empty
        nw = nw.sort_values("vec_id")
        cp = cp.sort_values("vec_id")
        n_ids = nw["vec_id"].to_numpy()
        c_ids = cp["vec_id"].to_numpy()
        s = _unit_rows(nw["embedding"]) @ _unit_rows(cp["embedding"]).T
        ia, ib = np.where(s >= threshold)
        return pd.DataFrame(
            {"vec_new": n_ids[ia], "vec_corpus": c_ids[ib], "cos_sim": s[ia, ib]}
        )

    ensure_shipped(new.sparkSession)
    tagged = new.select("vec_id", "embedding").withColumn(
        "_side", F.lit(1)
    ).unionByName(
        corpus.select("vec_id", "embedding").withColumn("_side", F.lit(0))
    )
    return (
        tagged.withColumn("bucket", sign_bucket("embedding", n_bits))
        .groupBy("bucket")
        .applyInPandas(pairs, schema="vec_new long, vec_corpus long, cos_sim double")
    )


def quantized_topk(
    emb: DataFrame,
    probe_pred,
    corpus_pred,
    k: int = 3,
    n_bits: int = 3,
) -> DataFrame:
    """Int8-quantized top-k neighbors (q110): probes scored against the
    corpus through shared sign buckets, EXACT BIGINT dot products.
    Returns (probe_id, rnk, neighbor_id, qdot), rnk 1..k ordered by
    (qdot desc, neighbor_id asc).

    Division of labor for cross-engine exactness at speed:
    - QUANTIZATION stays a JVM expression (functions.vectors.
      int8_quantize) — Spark's HALF_UP round matches DuckDB's round,
      a parity the oracle depends on; numpy's np.round is half-EVEN
      and would silently diverge on exact .5 scale grid points.
    - SCORING runs as a bucket-wise int64 numpy GEMM inside
      applyInPandas: the within-bucket probe x corpus product is
      inherently |P_b| x |C_b|, and an interpreted per-pair zip_with
      fold was measured 98x slower at the 10x rehearsal tier (77 s,
      12.5M pairs) than pushing the same arithmetic through BLAS-shape
      batch ops. int64 matmul is exact, so the hash oracle is
      unaffected. Only k rows per probe leave the bucket — sub-top-k
      pairs never cross a shuffle.
    - Tie-break np.lexsort((neighbor_ids, -scores)) reproduces the
      SQL ORDER BY qdot DESC, neighbor_id ASC exactly.

    Zero-norm vectors quantize to NULL and are dropped before
    grouping (FIXTURES.md zero-denominator rule, both engines).
    """
    from ..functions.vectors import int8_quantize

    tagged = (
        emb.select(
            "vec_id",
            F.when(probe_pred, F.lit(1)).when(corpus_pred, F.lit(0)).alias("_side"),
            sign_bucket("embedding", n_bits).alias("bucket"),
            int8_quantize("embedding").alias("qv"),
        )
        .filter(F.col("_side").isNotNull() & F.col("qv").isNotNull())
    )

    out_schema = "probe_id long, rnk long, neighbor_id long, qdot long"

    def topk(pdf: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {"probe_id": [], "rnk": [], "neighbor_id": [], "qdot": []}
        ).astype({"probe_id": "int64", "rnk": "int64", "neighbor_id": "int64", "qdot": "int64"})
        pr = pdf[pdf["_side"] == 1]
        cp = pdf[pdf["_side"] == 0]
        if pr.empty or cp.empty:
            return empty
        p_ids = pr["vec_id"].to_numpy()
        c_ids = cp["vec_id"].to_numpy()
        a = np.vstack(pr["qv"].to_numpy()).astype(np.int64)
        b = np.vstack(cp["qv"].to_numpy()).astype(np.int64)
        s = a @ b.T  # exact int64
        kk = min(k, len(c_ids))
        out = {"probe_id": [], "rnk": [], "neighbor_id": [], "qdot": []}
        for i in range(len(p_ids)):
            order = np.lexsort((c_ids, -s[i]))[:kk]
            out["probe_id"].extend([int(p_ids[i])] * kk)
            out["rnk"].extend(range(1, kk + 1))
            out["neighbor_id"].extend(c_ids[order].tolist())
            out["qdot"].extend(s[i][order].tolist())
        return pd.DataFrame(out).astype(
            {"probe_id": "int64", "rnk": "int64", "neighbor_id": "int64", "qdot": "int64"}
        )

    ensure_shipped(emb.sparkSession)
    return tagged.groupBy("bucket").applyInPandas(topk, schema=out_schema)
