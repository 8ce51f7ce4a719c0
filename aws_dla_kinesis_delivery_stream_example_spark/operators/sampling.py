"""Deterministic distributed sampling operators.

Reproducibility contract: all "randomness" derives from the portable
60-bit md5 hash of the row's own id (functions.text.hash60), so every
engine, every cluster size, and every re-run draws the identical
sample — the property that makes a 100 TB curation run auditable and
resumable. No rand()/seed state anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..functions import text as TX

# 2^60 as an exact double (power of two => exact): hash60 -> (0, 1].
_HASH60_SPAN = float(2**60)


def hash_uniform(id_col) -> Column:
    """Deterministic uniform(0, 1] from a row id: (hash60(id)+1)/2^60.

    +1 keeps the value strictly positive so ln() is finite; the cast
    of the 60-bit integer to double loses bits below 2^-53 relative —
    identically in every IEEE engine, so cross-engine ordering is
    stable.
    """
    c = id_col if isinstance(id_col, Column) else F.col(id_col)
    return (TX.hash60(c.cast("string")) + 1).cast("double") / F.lit(_HASH60_SPAN)


def weighted_sample(
    df: DataFrame,
    strata_col: str,
    id_col: str,
    weight_col,
    k: int,
    n_salt: int = 16,
) -> DataFrame:
    """Weighted sampling WITHOUT replacement, k rows per stratum
    (Efraimidis-Spirakis 2006): draw u ~ uniform(0,1] per row, rank by
    the exponential key -ln(u)/w ascending, keep the k smallest per
    stratum. Inclusion probability is proportional to w within each
    stratum; the key is deterministic (hash_uniform), so the sample is
    reproducible bit-for-bit.

    Returns (strata_col, rnk, id_col, w) with rnk in 1..k.

    Scale shape: TWO-STAGE top-k — stage 1 ranks inside
    (stratum, id % n_salt) salted sub-partitions and keeps k each,
    stage 2 re-ranks the <= k*n_salt survivors per stratum. Exact by
    the union bound (every true top-k row survives its salt cut), and
    no window partition ever sorts more than ~1/n_salt of a stratum —
    a single-stage per-stratum window would sort a whole stratum's
    rows on one partition at 100 TB.

    Contract: ``id_col`` must be NUMERIC — the salt is ``id % n_salt``
    and under non-ANSI Spark a string id makes the modulo NULL,
    silently collapsing every row into one salt partition (correct
    output, but the two-stage scale shape is defeated). And weights
    must be STRICTLY POSITIVE: w=0 divides by zero in the key (throws
    under ANSI Spark, aborting the job on one bad row) and w<0 inverts
    the Efraimidis-Spirakis ordering — both raise at runtime via a
    guarded key expression rather than producing a wrong sample.
    """
    _NUMERIC = ("tinyint", "smallint", "int", "bigint", "float", "double")
    id_type = dict(df.dtypes).get(id_col)
    if id_type is None or not (
        id_type in _NUMERIC or id_type.startswith("decimal")
    ):
        raise TypeError(
            f"weighted_sample: id_col {id_col!r} must be numeric for the "
            f"id % n_salt two-stage salt, got {id_type!r} — hash or zip "
            "string ids to a numeric surrogate first (e.g. xxhash64(id))"
        )
    w_expr = weight_col if isinstance(weight_col, Column) else F.col(weight_col)
    w_expr = w_expr.cast("long")
    # Fail fast on non-positive weights (mirrors the bands/radius/id
    # validations elsewhere): raise_error is codegen'd and only fires
    # on the bad row, so the hot path cost is one comparison.
    w_checked = F.when(
        w_expr <= 0,
        F.raise_error(
            F.concat(
                F.lit("weighted_sample: non-positive weight for id "),
                F.col(id_col).cast("string"),
            )
        ).cast("long"),
    ).otherwise(w_expr)
    key = -F.log(hash_uniform(id_col)) / w_checked.cast("double")
    keyed = df.select(
        strata_col,
        id_col,
        w_expr.alias("w"),
        key.alias("k"),
        (F.col(id_col) % n_salt).alias("salt"),
    )
    s1 = W.partitionBy(strata_col, "salt").orderBy("k", id_col)
    survivors = (
        keyed.withColumn("rn1", F.row_number().over(s1))
        .filter(F.col("rn1") <= k)
        .drop("rn1", "salt")
    )
    s2 = W.partitionBy(strata_col).orderBy("k", id_col)
    return (
        survivors.withColumn("rnk", F.row_number().over(s2).cast("long"))
        .filter(F.col("rnk") <= k)
        .select(strata_col, "rnk", id_col, "w")
    )
