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


@pytest.fixture(scope="module")
def pipeline_sf_dir(tmp_path_factory) -> str:
    """An sf-dir where EVERY q95 pipeline stage has exactly one doc
    planted for it to drop — including exact duplicates, which the
    driver corpus does not contain at all (its only duplication is
    near-dup), so the exact stage can only be evidenced here."""
    d = tmp_path_factory.mktemp("pipeline_sf")
    near_base = (
        "the alpha bravo charlie delta echo foxtrot golf hotel india "
        "juliet kilo lima mike november oscar papa quebec romeo the sierra"
    )
    texts = {
        # 1/2: exact duplicates -> exact stage keeps min id (1)
        1: "the whiskey xray yankee zulu is one of two three four five six seven",
        2: "the whiskey xray yankee zulu is one of two three four five six seven",
        # 3/4: near-duplicates (16/17 shared 5-gram shingles) -> one survivor
        3: near_base,
        4: near_base + " extra",
        # 5: junk -> quality gate drops it (alpha 0, punct-heavy)
        5: "1234 5678 !!! ??? ###",
        # 6: contaminated -> shares the bench doc's 4-gram
        6: "zebra quokka lemur axolotl are in the zoo with the animals and the keepers",
        # 7: clean keeper
        7: "the quick brown fox jumps over the lazy dog again today",
        # 8: 600-token doc -> blows the 500-token source budget
        8: " ".join(f"the pad{i}" for i in range(300)),
        # 50: the benchmark doc (doc_id % 50 == 0 -> excluded from input)
        50: "zebra quokka lemur axolotl pangolin",
    }
    ids = sorted(texts)
    docs = pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "text": pa.array([texts[i] for i in ids]),
            "lang": pa.array(["en"] * len(ids)),
            "source": pa.array(["s"] * len(ids)),
            "n_chars": pa.array([len(texts[i]) for i in ids], pa.int64()),
        }
    )
    pq.write_table(docs, d / "documents.parquet")
    return str(d)


def test_q95_every_pipeline_stage_drops_its_planted_doc(spark, pipeline_sf_dir):
    """The funnel must show exactly one doc removed per stage: 8 in,
    7 after exact dedup, 6 after near-dup survivor selection, 5 after
    the quality gate, 4 after decontamination, 3 under the token
    budget (the 600-token doc cannot fit). A wrong join type, regex,
    threshold direction, or window order at ANY stage breaks a
    specific number here."""
    rows = SPECS["q95_curation_pipeline"].spark(spark, pipeline_sf_dir).collect()
    assert len(rows) == 1
    r = rows[0].asDict()
    assert r["source"] == "s"
    assert r["n_input"] == 8
    assert r["n_exact"] == 7, "exact dup (doc 2) not removed"
    assert r["n_neardup"] == 6, "near-dup cluster {3,4} not collapsed"
    assert r["n_quality"] == 5, "junk doc 5 not dropped by the gate"
    assert r["n_decontam"] == 4, "contaminated doc 6 not dropped"
    assert r["n_kept"] == 3, "600-token doc 8 should exceed the budget"
    assert 0 < r["tokens_kept"] <= 100
