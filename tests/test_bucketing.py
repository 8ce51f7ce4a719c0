"""Bucketed co-located join: the repeated-join-without-shuffle pattern
that matters at 100 TB. Asserts the physical plan has no shuffle
Exchange when both sides are bucketed on the join key."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aws_dla_kinesis_delivery_stream_example_spark.sources import bucketing
from aws_dla_kinesis_delivery_stream_example_spark.sources.tables import load_table

from .conftest import SF_SMOKE


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    orders = load_table(spark, SF_SMOKE, "orders")
    lineitem = load_table(spark, SF_SMOKE, "lineitem").withColumnRenamed(
        "l_orderkey", "o_orderkey"
    )
    bucketing.write_bucketed(orders, "b_orders", "o_orderkey", 8)
    bucketing.write_bucketed(lineitem, "b_lineitem", "o_orderkey", 8)
    yield
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_bucketed_join_has_no_shuffle(spark, bucketed_tables):
    j = bucketing.bucketed_join(spark, "b_orders", "b_lineitem", "o_orderkey")
    agg = j.groupBy().count()
    # the join itself must not shuffle either side
    assert not bucketing.plan_has_shuffle(j)
    # and it returns correct results
    n = j.count()
    li = load_table(spark, SF_SMOKE, "lineitem")
    orders = load_table(spark, SF_SMOKE, "orders")
    expected = li.join(orders, li.l_orderkey == orders.o_orderkey).count()
    assert n == expected


def test_unbucketed_join_does_shuffle(spark):
    """Control: the same join on raw parquet shuffles (so the assertion
    above is meaningful)."""
    li = load_table(spark, SF_SMOKE, "lineitem")
    orders = load_table(spark, SF_SMOKE, "orders")
    # disable auto-broadcast so the control join is a genuine SMJ
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = li.join(orders, li.l_orderkey == orders.o_orderkey)
        assert bucketing.plan_has_shuffle(j)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")