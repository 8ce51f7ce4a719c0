"""Self-tests for the oracle comparator — the single function every
correctness claim in this repo flows through. These pin that it (a)
accepts genuinely-equal results regardless of column/row order, and
(b) actually FAILS on each mismatch class: a comparator that silently
passed would make the whole 95-query green wall hollow."""

from __future__ import annotations

from .conftest import SF_SMOKE
from .oracle_utils import compare


def _df(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


def test_accepts_reordered_columns_and_rows(spark):
    df = _df(spark, [(2, "b"), (1, "a")], "k long, v string")
    # oracle emits the columns in the opposite order and rows sorted
    ok, msg = compare(
        df, "SELECT 'a' AS v, CAST(1 AS BIGINT) AS k UNION ALL SELECT 'b', 2", SF_SMOKE
    )
    assert ok, msg


def test_detects_value_drift(spark):
    df = _df(spark, [(1, "a"), (2, "b")], "k long, v string")
    ok, msg = compare(
        df, "SELECT CAST(1 AS BIGINT) AS k, 'a' AS v UNION ALL SELECT 2, 'DRIFT'", SF_SMOKE
    )
    assert not ok and "values differ" in msg


def test_detects_row_count_mismatch(spark):
    df = _df(spark, [(1,)], "k long")
    ok, msg = compare(df, "SELECT CAST(1 AS BIGINT) AS k UNION ALL SELECT 2", SF_SMOKE)
    assert not ok and "row counts differ" in msg


def test_detects_column_name_mismatch(spark):
    df = _df(spark, [(1,)], "k long")
    ok, msg = compare(df, "SELECT CAST(1 AS BIGINT) AS wrong_name", SF_SMOKE)
    assert not ok and "columns differ" in msg


def test_int_vs_float_same_value_is_a_mismatch(spark):
    """The FIXTURES.md BIGINT-cast rule exists because of this: a
    Spark BIGINT 3 must NOT hash-match a DuckDB DOUBLE 3.0 — the type
    drift that rule prevents has to be DETECTABLE, not absorbed."""
    df = _df(spark, [(3,)], "k long")
    ok, msg = compare(df, "SELECT 3.0::DOUBLE AS k", SF_SMOKE)
    assert not ok and "values differ" in msg


def test_nan_equals_nan_and_null_equals_null(spark):
    df = _df(spark, [(1, float("nan"), None)], "k long, x double, s string")
    ok, msg = compare(
        df,
        "SELECT CAST(1 AS BIGINT) AS k, CAST('NaN' AS DOUBLE) AS x, "
        "CAST(NULL AS VARCHAR) AS s",
        SF_SMOKE,
    )
    assert ok, msg
