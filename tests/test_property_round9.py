"""Hypothesis property tests for the round-9b/9c/9d operators —
structural invariants that must hold for EVERY input, not just the
planted fixtures (the test_property_windows convention: few examples,
no deadline, Spark calls dominate)."""

from __future__ import annotations

import hashlib

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from aws_dla_kinesis_delivery_stream_example_spark.operators import (
    curation,
    sharding,
    skew,
)


def _hash60_py(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


_ids = st.lists(
    st.integers(min_value=0, max_value=10**9), min_size=1, max_size=40, unique=True
)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(ids=_ids, n_shards=st.integers(min_value=1, max_value=7), seed=st.integers(0, 99))
def test_shard_manifest_reconciles_for_any_input(spark, ids, n_shards, seed):
    """For ANY id set / shard count / seed: manifests partition the
    input (counts sum to |ids|), every shard value is in range, and
    the XOR checksum equals the independent Python fold."""
    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    man = sharding.shard_manifest(df, "doc_id", n_shards, seed=seed).collect()
    assert sum(r["n_docs"] for r in man) == len(ids)
    expect_xor: dict[int, int] = {}
    for i in ids:
        sh = _hash60_py(f"shard:{seed}:{i}") % n_shards
        expect_xor[sh] = expect_xor.get(sh, 0) ^ _hash60_py(f"order:{seed}:{i}")
    got = {r["shard"]: r["xor_check"] for r in man}
    assert got == expect_xor
    assert all(0 <= s < n_shards for s in got)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    old=st.dictionaries(st.integers(0, 50), st.integers(0, 3), max_size=30),
    new=st.dictionaries(st.integers(0, 50), st.integers(0, 3), max_size=30),
)
def test_snapshot_diff_is_a_partition_of_the_id_union(spark, old, new):
    """For ANY pair of snapshots: output ids == union of input ids
    (each exactly once), and each status matches the dict definition."""
    if not old and not new:
        return
    old_df = spark.createDataFrame(
        [(k, v) for k, v in old.items()], "doc_id long, fp long"
    ) if old else spark.createDataFrame([], "doc_id long, fp long")
    new_df = spark.createDataFrame(
        [(k, v) for k, v in new.items()], "doc_id long, fp long"
    ) if new else spark.createDataFrame([], "doc_id long, fp long")
    got = {
        r["doc_id"]: r["status"]
        for r in curation.snapshot_diff(old_df, new_df, "doc_id", "fp").collect()
    }
    assert set(got) == set(old) | set(new)
    for i, status in got.items():
        if i not in new:
            assert status == "removed"
        elif i not in old:
            assert status == "added"
        elif old[i] != new[i]:
            assert status == "changed"
        else:
            assert status == "unchanged"


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    keys=st.lists(st.integers(min_value=-100, max_value=100), min_size=1, max_size=60),
    n_buckets=st.integers(min_value=1, max_value=9),
)
def test_key_skew_audit_conservation_for_any_input(spark, keys, n_buckets):
    """For ANY key multiset (including negatives): row and key counts
    are conserved across buckets, and max_key_rows <= n_rows per
    bucket with the hot key's count equal to max_key_rows."""
    df = spark.createDataFrame([(k,) for k in keys], "user_id long")
    rows = skew.key_skew_audit(df, "user_id", n_buckets).collect()
    assert sum(r["n_rows"] for r in rows) == len(keys)
    assert sum(r["n_keys"] for r in rows) == len(set(keys))
    for r in rows:
        assert 1 <= r["max_key_rows"] <= r["n_rows"]
        assert r["hot_key_rows"] == r["max_key_rows"]
        assert keys.count(r["hot_key"]) == r["hot_key_rows"]
