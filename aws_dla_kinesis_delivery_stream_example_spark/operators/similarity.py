"""Similarity search over embedding columns (SURVEY.md §2.11).

Two strategies with the same output contract (query_id, vec_id, score):

- brute_force_topk: broadcast the (small) query set against the
  candidate scan; per-query top-k via window row_number. Linear in
  candidates — the exact baseline.
- ivf_topk: both sides keyed by a deterministic sign-pattern bucket
  (functions.vectors.sign_bucket); the probe becomes an equi-join on
  the bucket id, shrinking the scanned candidates ~2**n_bits. This is
  the 100 TB path: bucket is a partitionable join key, so candidates
  co-locate and no cross join exists in the plan.

Embedding cosine dedup falls out of brute_force_topk(df, df, thr).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from ..functions.vectors import cosine, sign_bucket


def _scored(candidates: DataFrame, queries: DataFrame, join_on=None) -> DataFrame:
    """candidates(vec_id, embedding) x queries(q_id, q_emb) with cosine."""
    joined = (
        candidates.join(F.broadcast(queries), join_on)
        if join_on is not None
        else candidates.crossJoin(F.broadcast(queries))
    )
    return joined.filter(F.col("vec_id") != F.col("q_id")).select(
        "q_id",
        "vec_id",
        cosine("embedding", "q_emb").alias("cos_sim"),
    )


def _topk(scored: DataFrame, k: int) -> DataFrame:
    # Rank on a rounded score (6 dp) with vec_id tiebreak => the rank
    # boundary is float-noise-proof and oracle-reproducible.
    w = W.partitionBy("q_id").orderBy(F.desc(F.round("cos_sim", 6)), F.asc("vec_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("q_id", "vec_id", F.round("cos_sim", 4).alias("cos_sim"), "rn")
    )


def as_queries(df: DataFrame, id_col: str = "vec_id", emb_col: str = "embedding") -> DataFrame:
    return df.select(F.col(id_col).alias("q_id"), F.col(emb_col).alias("q_emb"))


def brute_force_topk(candidates: DataFrame, queries: DataFrame, k: int = 10) -> DataFrame:
    """Exact top-k cosine per query. queries must be small (broadcast)."""
    return _topk(_scored(candidates, queries), k)


def ivf_topk(candidates: DataFrame, queries: DataFrame, k: int = 5, n_bits: int = 3) -> DataFrame:
    """Approximate top-k: probe only the query's sign-pattern bucket."""
    cand_b = candidates.withColumn("bucket", sign_bucket("embedding", n_bits))
    q_b = queries.withColumn("bucket", sign_bucket("q_emb", n_bits))
    return _topk(_scored(cand_b, q_b, join_on="bucket"), k)


def embedding_near_duplicates(df: DataFrame, threshold: float = 0.95, n_bits: int = 3) -> DataFrame:
    """Embedding-cosine near-dup pairs via the same bucketed equi-join
    (near-identical vectors share the sign bucket). Returns
    (vec_a, vec_b, cos_sim >= threshold), vec_a < vec_b."""
    b = df.withColumn("bucket", sign_bucket("embedding", n_bits))
    a, c = b.alias("a"), b.alias("b")
    return (
        a.join(
            c,
            (F.col("a.bucket") == F.col("b.bucket")) & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            cosine(F.col("a.embedding"), F.col("b.embedding")).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )
