"""Planted-positive fixtures for the catalog queries whose sf0.01
oracle rows are 0-vs-0 matches (VERDICT r06 "What's wrong" #1).

A 0-row hash match cannot distinguish a broken operator from a working
one, so these tests run the SAME catalog QuerySpecs (``all_specs()``,
not reimplementations) against a tiny local parquet lake with planted
rows that MUST appear in the output, and assert the exact hand-computed
values. A wrong regex (q61) or a wrong join type (q05) fails here even
though the driver's testdata never exercises the positive path.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from aws_dla_kinesis_delivery_stream_example_spark.plans import all_specs

SPECS = all_specs()


@pytest.fixture(scope="module")
def planted_sf_dir(tmp_path_factory) -> str:
    """A minimal sf-dir with planted positives for q05 and q61."""
    d = tmp_path_factory.mktemp("planted_sf")

    # documents: digit-bearing text covering the redaction edge cases —
    # multi-digit runs (redacted), single digits (NOT redacted, the
    # pattern is [0-9][0-9]+), digit-free text (filtered out).
    docs = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
            "text": pa.array(
                [
                    "call 555 0199 now",  # two runs
                    "no digits here",  # filtered out (0 redactions)
                    "a7b",  # single digit survives -> filtered out
                    "id=1234567890",  # one long run
                    "12 34 5 678",  # three runs + a surviving single digit
                ]
            ),
            "lang": pa.array(["en"] * 5),
            "source": pa.array(["web"] * 5),
            "n_chars": pa.array([17, 14, 3, 13, 11], pa.int64()),
        }
    )
    pq.write_table(docs, d / "documents.parquet")

    # customer/orders: customers 1 and 3 have NO orders (the planted
    # anti-join positives); 2 has two orders (must not multiply rows);
    # an order for custkey 99 references no customer (must not appear).
    cust = pa.table(
        {
            "c_custkey": pa.array([1, 2, 3, 4], pa.int64()),
            "c_name": pa.array(["Customer#1", "Customer#2", "Customer#3", "Customer#4"]),
            "c_nationkey": pa.array([0, 1, 2, 3], pa.int32()),
            "c_acctbal": pa.array([10.0, 20.0, 30.0, 40.0]),
            "c_mktsegment": pa.array(["BUILDING"] * 4),
        }
    )
    pq.write_table(cust, d / "customer.parquet")
    orders = pa.table(
        {
            "o_orderkey": pa.array([100, 101, 102, 103], pa.int64()),
            "o_custkey": pa.array([2, 2, 4, 99], pa.int64()),
            "o_orderstatus": pa.array(["O"] * 4),
            "o_totalprice": pa.array([1000.0, 2000.0, 3000.0, 4000.0]),
            "o_orderdate": pa.array([1_700_000_000_000_000] * 4, pa.timestamp("us")),
            "o_orderpriority": pa.array(["1-URGENT"] * 4),
        }
    )
    pq.write_table(orders, d / "orders.parquet")
    return str(d)


def test_q61_redacts_planted_digit_runs(spark, planted_sf_dir):
    """Every multi-digit run -> <NUM>; single digits and digit-free
    docs untouched. Lengths are hand-computed, not re-derived."""
    rows = {
        r["doc_id"]: r.asDict()
        for r in SPECS["q61_pii_redaction"].spark(spark, planted_sf_dir).collect()
    }
    # docs 2 (no digits) and 3 (single digit only) must be filtered out
    assert set(rows) == {1, 4, 5}
    # "call 555 0199 now" -> "call <NUM> <NUM> now" (len 20), 2 runs
    assert rows[1]["n_redactions"] == 2
    assert rows[1]["redacted_len"] == len("call <NUM> <NUM> now") == 20
    # "id=1234567890" -> "id=<NUM>" (len 8): ONE run, not per-digit
    assert rows[4]["n_redactions"] == 1
    assert rows[4]["redacted_len"] == len("id=<NUM>") == 8
    # "12 34 5 678" -> "<NUM> <NUM> 5 <NUM>" (len 19): the single "5"
    # must survive; a pattern like [0-9]+ would redact it (len 23 stays
    # but n_redactions would be 4) and fail here
    assert rows[5]["n_redactions"] == 3
    assert rows[5]["redacted_len"] == len("<NUM> <NUM> 5 <NUM>") == 19


def test_q05_anti_join_returns_planted_orphans(spark, planted_sf_dir):
    """Customers without orders come back exactly once; customers with
    orders (even multiple) and dangling order keys never appear."""
    got = [
        (r["c_custkey"], r["c_name"])
        for r in SPECS["q05_anti_join"].spark(spark, planted_sf_dir).collect()
    ]
    assert got == [(1, "Customer#1"), (3, "Customer#3")]
