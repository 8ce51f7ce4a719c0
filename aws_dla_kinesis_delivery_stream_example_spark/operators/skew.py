"""Skew-mitigation operators (SURVEY.md §4.2 / project brief: 'skewed
keys -> salting or AQE skew-join').

AQE's skew-join splitting handles join skew automatically; aggregation
skew on a hot key still concentrates one reducer. ``salted_agg``
implements the classic two-phase fix: shard each key into
``n_salts`` sub-keys (phase 1 partial agg over (key, salt)), then
combine partials per key (phase 2). Both phases are hash aggregates
with map-side combine; the hot key's work spreads over n_salts tasks.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# (partial_agg, final_agg) pairs per supported measure.
_MERGERS = {
    "count": (lambda c: F.count(c), F.sum),
    "sum": (lambda c: F.sum(c), F.sum),
    "min": (lambda c: F.min(c), F.min),
    "max": (lambda c: F.max(c), F.max),
}


def salted_agg(
    df: DataFrame,
    keys: list[str],
    measures: dict[str, tuple[str, str]],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase salted aggregation.

    measures: output_name -> (agg_fn in {count,sum,min,max}, input_col).
    avg decomposes as sum/count by the caller. Result == plain
    ``df.groupBy(keys).agg(...)`` but immune to hot-key reducer skew.
    """
    salt = (F.rand(seed=42) * n_salts).cast("int").alias("_salt")
    phase1_aggs = []
    for out, (fn, col) in measures.items():
        partial, _final = _MERGERS[fn]
        phase1_aggs.append(partial(F.col(col)).alias(f"_p_{out}"))
    phase1 = df.withColumn("_salt", salt).groupBy(*keys, "_salt").agg(*phase1_aggs)
    phase2_aggs = []
    for out, (fn, _col) in measures.items():
        _partial, final = _MERGERS[fn]
        phase2_aggs.append(final(F.col(f"_p_{out}")).alias(out))
    return phase1.groupBy(*keys).agg(*phase2_aggs)


def salt_keys(df: DataFrame, key: str, n_salts: int) -> tuple[DataFrame, Column]:
    """Attach a salt column for a salted join: the skewed (large) side
    gets a random salt; the small side is exploded n_salts ways so
    every (key, salt) shard finds its match."""
    return (
        df.withColumn("_salt", (F.rand(seed=42) * n_salts).cast("int")),
        F.col("_salt"),
    )


def explode_salts(df: DataFrame, n_salts: int) -> DataFrame:
    """Replicate the small join side across all salt values."""
    return df.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )


def key_skew_audit(df: DataFrame, key_col: str, n_buckets: int = 32) -> DataFrame:
    """Pre-flight shuffle-skew audit for a join/agg key: simulate the
    hash partitioning a shuffle on ``key_col`` would produce and
    report, per bucket, the row volume, key cardinality, and hottest
    key. Run this BEFORE committing a 100 TB job to a shuffle on the
    key — a bucket holding 30% of the rows means that exchange stalls
    one reducer for hours; the report's max_key_rows tells you whether
    the fix is salting (one giant key) or more partitions (many keys
    that merely hash together).

    Buckets use the engine-portable 60-bit hash (functions.text.hash60)
    rather than Spark's Murmur3 so the ORACLE sees identical bucket
    membership; the skew *pattern* is what's audited, and any uniform
    hash exposes the same per-key concentration.

    Columns: bucket, n_rows, n_keys, max_key_rows, hot_key,
    hot_key_rows — hot key ties broken by the larger key value via a
    lexicographic struct max (skew-immune house shape, no window).

    Scale shape: two hash aggregates. Phase 1 groups by the key itself
    (map-side combine collapses hot keys to one partial per task —
    the audit is immune to the very skew it measures); phase 2 groups
    the |keys|-sized count frame by bucket. No join, no window, no
    collect.
    """
    return skew_rollup(key_counts(df, key_col), n_buckets)


def key_counts(df: DataFrame, key_col: str) -> DataFrame:
    """Phase 1 of the skew audit: the per-key row-count table
    ``(_key, _cnt)``. Split out (round 14) because this IS the
    streaming twin's state: ``_cnt`` is a linear counter, so the same
    groupBy serves the batch face and a complete-mode streaming
    aggregation whose state merges across shards/micro-batches — the
    q91 per-key state family (state grows with KEY CARDINALITY, never
    with ingest volume). Map-side combine collapses hot keys to one
    partial per task, so the audit is immune to the skew it measures."""
    return df.groupBy(F.col(key_col).alias("_key")).agg(
        F.count(F.lit(1)).alias("_cnt")
    )


def skew_rollup(per_key: DataFrame, n_buckets: int) -> DataFrame:
    """Phase 2 of the skew audit: roll the |keys|-sized count table up
    to per-bucket volume / cardinality / hottest-key rows (lexicographic
    struct-max tie break — skew-immune, no window). Runs identically on
    a batch-built count table and on streaming state drained from
    ``key_counts``, so the report is fully determined by that state.
    Validates ``n_buckets`` HERE (round-14 review): q145 consumes this
    phase directly, bypassing the key_skew_audit wrapper, and
    ``hash60 % 0`` would be a modulo error / NULL buckets instead of
    a clear message."""
    if n_buckets <= 0:
        raise ValueError(f"n_buckets must be positive, got {n_buckets}")
    from ..functions import text as TX

    bucketed = per_key.select(
        (TX.hash60(F.col("_key").cast("string")) % n_buckets).alias("bucket"),
        "_key",
        "_cnt",
    )
    hot = F.max(F.struct(F.col("_cnt"), F.col("_key"))).alias("_hot")
    return (
        bucketed.groupBy("bucket")
        .agg(
            F.sum("_cnt").cast("long").alias("n_rows"),
            F.count(F.lit(1)).cast("long").alias("n_keys"),
            F.max("_cnt").cast("long").alias("max_key_rows"),
            hot,
        )
        .select(
            "bucket",
            "n_rows",
            "n_keys",
            "max_key_rows",
            F.col("_hot._key").alias("hot_key"),
            F.col("_hot._cnt").cast("long").alias("hot_key_rows"),
        )
    )
