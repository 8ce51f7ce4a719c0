"""Fixed-size sketch operators (count-min heavy hitters).

The reference engine has no sketch surface; this extends SURVEY.md
§2.11 with the streaming-adjacent shape every 100 TB token-frequency
job needs: a COUNT-MIN sketch whose memory is a d x w counter grid —
constant regardless of corpus size — versus the exact token-count agg
whose state is |vocabulary|.

Everything here is DETERMINISTIC (the d hash rows derive from the
portable 60-bit md5 prefix, functions.text.hash60), so a SQL oracle
reproduces the sketch bit-for-bit: estimates are exactly checkable,
not just "within epsilon" — and the classic CMS guarantee
(estimate >= true count, overshoot bounded by the row collisions)
becomes an assertable column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import text as TX

CMS_DEPTH = 4
CMS_WIDTH = 1024


def _bucket(tok_col, r: int, width: int):
    """Row-r bucket of a token: hash60('r:'||token) % width. The salt
    prefix makes the d rows independent hash functions while staying
    one md5 away from the house 60-bit convention (engine-portable)."""
    return TX.hash60(F.concat(F.lit(f"{r}:"), tok_col)) % width


def countmin_counters(
    docs: DataFrame,
    text_col: str = "text",
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """Build the d x w counter grid over the corpus token stream.
    Returns (r, bucket, cnt) — at most depth*width rows TOTAL.

    Scale shape: tokens explode once, each token row fans out to its
    ``depth`` (r, bucket) keys, and ONE hash agg folds them — partial
    aggregation collapses each task's contribution to <= d*w counters
    before the shuffle, so the exchange carries a few thousand rows per
    task no matter how many tokens the corpus holds. This is the
    mergeable-summary property that lets daily corpus shards sketch
    independently and union-fold their grids (sum per (r, bucket))."""
    tok = docs.select(F.explode(TX.words(text_col)).alias("tok"))
    keyed = tok.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("r"), _bucket(F.col("tok"), r, width).alias("bucket")
                    )
                    for r in range(depth)
                ]
            )
        ).alias("kb")
    ).select("kb.r", "kb.bucket")
    return keyed.groupBy("r", "bucket").agg(F.count("*").cast("long").alias("cnt"))


def exact_top_tokens(
    docs: DataFrame, text_col: str = "text", k: int = 20
) -> DataFrame:
    """Exact top-k tokens by count — (token, exact_n), total order
    (count desc, token asc). A TakeOrdered(k), never a full sort."""
    tok = docs.select(F.explode(TX.words(text_col)).alias("token"))
    return (
        tok.groupBy("token")
        .agg(F.count("*").cast("long").alias("exact_n"))
        .orderBy(F.desc("exact_n"), F.asc("token"))
        .limit(k)
    )


def countmin_probe(
    counters: DataFrame,
    candidates: DataFrame,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """Score candidate tokens against a counter grid: each candidate
    explodes to its ``depth`` (r, bucket) probes, joins the BROADCAST
    grid, and takes the min — (token, exact_n, cms_est,
    overestimate_ok). Shared by the batch (q112) and streaming (q113)
    faces, so 'stream state == batch sketch' is checked through the
    identical probe path."""
    probes = candidates.select(
        "token",
        "exact_n",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("r"),
                        _bucket(F.col("token"), r, width).alias("bucket"),
                    )
                    for r in range(depth)
                ]
            )
        ).alias("kb"),
    ).select("token", "exact_n", "kb.r", "kb.bucket")
    est = (
        probes.join(F.broadcast(counters), ["r", "bucket"])
        .groupBy("token", "exact_n")
        .agg(F.min("cnt").cast("long").alias("cms_est"))
    )
    return est.select(
        "token",
        "exact_n",
        "cms_est",
        (F.col("cms_est") >= F.col("exact_n")).alias("overestimate_ok"),
    ).orderBy(F.desc("exact_n"), F.asc("token"))


def countmin_heavy_hitters(
    docs: DataFrame,
    text_col: str = "text",
    k: int = 20,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """Top-k tokens by exact count, each carrying its count-min
    ESTIMATE (min over the d rows of the token's counters) and the
    CMS soundness verdict. Returns (token, exact_n, cms_est,
    overestimate_ok) ordered by (exact_n desc, token).

    exact_n is computed alongside to *audit* the sketch at test scale;
    at 100 TB one keeps only the sketch (constant memory) plus a
    candidate stream, and this operator's estimate join is how
    candidates are scored: the k candidate tokens explode to d
    (r, bucket) probes which join the BROADCAST counter grid (d*w
    rows) — no corpus-sized side is ever re-touched.

    ``overestimate_ok`` asserts the one-sided CMS error bound
    (est >= exact, always true by construction — a FALSE row means the
    hash plumbing diverged between build and probe).
    """
    counters = countmin_counters(docs, text_col, depth, width)
    top = exact_top_tokens(docs, text_col, k)
    return countmin_probe(counters, top, depth, width)
