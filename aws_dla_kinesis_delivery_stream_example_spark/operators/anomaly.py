"""Rolling-statistics anomaly detection over event streams.

Batch face here; the identical milli-unit state (count / sum /
sum-of-squares, all exact BIGINTs) drops into a Welford-style
applyInPandasWithState streaming variant unchanged — the exactness is
what makes batch backfills agree bit-for-bit with the live detector.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


def rolling_zscore(
    df: DataFrame,
    entity_col: str,
    order_cols: tuple[str, ...],
    value_col: str,
    lookback: int = 20,
    min_n: int = 10,
    z_threshold: float = 3.0,
) -> DataFrame:
    """Per-entity rolling z-score outliers: each row's value against
    the mean/stddev of its previous <= ``lookback`` rows (>= ``min_n``
    required, zero-variance windows excluded); |z| >= ``z_threshold``
    flags the row. Input ``value_col`` must already be integer units
    (milli-units by convention) so the variance arithmetic is exact.

    Returns the input columns plus ``z`` (double). Keeps only flagged
    rows.

    Scale shape: one window partitioned by the entity — partitions are
    a single entity's history (bounded by per-entity activity, never
    the corpus). All three frame aggregates (count/sum/sum-of-squares)
    share ONE WindowExec pass. The z arithmetic is exact-integer until
    the last four IEEE ops (div/sub/div/sqrt on identical inputs ->
    bit-identical across engines): milli-unit values keep sum(v^2)
    inside BIGINT for |v| <= ~650k over a 20-row frame.
    """
    v = F.col(value_col)
    w = (
        W.partitionBy(entity_col)
        .orderBy(*order_cols)
        .rowsBetween(-lookback, -1)
    )
    st = df.select(
        "*",
        F.count(v).over(w).alias("_n"),
        F.sum(v).over(w).alias("_s"),
        F.sum(v * v).over(w).alias("_ss"),
    )
    var_num = F.col("_n") * F.col("_ss") - F.col("_s") * F.col("_s")
    z = (v.cast("double") - F.col("_s").cast("double") / F.col("_n")) / F.sqrt(
        var_num.cast("double") / (F.col("_n") * (F.col("_n") - 1))
    )
    return (
        st.filter((F.col("_n") >= min_n) & (var_num > 0))
        .withColumn("z", z)
        .filter(F.abs(F.col("z")) >= z_threshold)
        .drop("_n", "_s", "_ss")
    )
