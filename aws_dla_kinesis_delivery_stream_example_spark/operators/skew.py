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
