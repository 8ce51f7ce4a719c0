"""Deterministic training-shard shuffle.

A 100 TB pretraining corpus must be (a) split into a fixed number of
shards, (b) shuffled within and across shards, and (c) reproducible —
re-running the job on the same snapshot must yield byte-identical
shard contents so data order (which affects the loss curve) is an
experiment variable, not an accident. Random-number generators don't
survive re-partitioning or speculative re-execution; content hashes
do. All "randomness" here derives from the engine-portable 60-bit
md5-prefix hash (functions.text.hash60, the q37/q104 convention), so
shard assignment and intra-shard order are pure functions of
(seed, doc_id) on ANY engine.

Scale shape: `assign_shards` is a pure projection (zero shuffles —
the hash is computed at scan); `shard_manifest` adds ONE map-side-
combinable hash aggregate over n_shards groups. Writing the actual
shards is then `df.repartition(n_shards, "shard")` + per-partition
sort by order_key — a single exchange whose partitioning is the
output layout, the minimum any shuffler can do. The XOR checksum is
order- and partitioning-independent (XOR is commutative), so two runs
on different cluster layouts can be compared shard-by-shard without
re-reading payloads.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions import text as TX


def _tagged_hash(tag: str, seed: int, id_col: Column) -> Column:
    """hash60 over 'tag:seed:id' — independent streams per tag, the
    domain-separation trick that keeps shard choice and intra-shard
    order uncorrelated (a single hash reused for both would sort each
    shard by its own bucket value: ordered buckets, not a shuffle)."""
    return TX.hash60(F.concat(F.lit(f"{tag}:{seed}:"), id_col.cast("string")))


def assign_shards(
    df: DataFrame,
    id_col: str,
    n_shards: int,
    seed: int = 17,
) -> DataFrame:
    """Add ``shard`` (int64 in [0, n_shards)) and ``order_key`` (int64)
    columns. Sorting by (shard, order_key) IS the deterministic global
    shuffle; ties on the 60-bit order_key are broken downstream by the
    unique id, though a collision needs ~2^30 docs per shard to show
    up at even 50% odds."""
    if n_shards <= 0:
        raise ValueError(f"assign_shards: n_shards must be positive, got {n_shards}")
    idc = F.col(id_col)
    return df.select(
        "*",
        (_tagged_hash("shard", seed, idc) % n_shards).alias("shard"),
        _tagged_hash("order", seed, idc).alias("order_key"),
    )


def shard_manifest(
    df: DataFrame,
    id_col: str,
    n_shards: int,
    seed: int = 17,
    chars_col: str | None = None,
) -> DataFrame:
    """Per-shard manifest: doc count, payload volume, XOR checksum of
    the order keys, and the key span. The checksum verifies shard
    CONTENT equality across runs/engines without comparing payloads;
    the span is what a downstream reader uses to merge-sort shards
    back into one deterministic stream.

    Columns: shard, n_docs, total_chars, xor_check, min_key, max_key.
    """
    assigned = assign_shards(df, id_col, n_shards, seed)
    vol = (
        F.sum(F.col(chars_col)).cast("long")
        if chars_col
        else F.count(F.lit(1)).cast("long")
    )
    return assigned.groupBy("shard").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        vol.alias("total_chars"),
        F.expr("bit_xor(order_key)").cast("long").alias("xor_check"),
        F.min("order_key").cast("long").alias("min_key"),
        F.max("order_key").cast("long").alias("max_key"),
    )


def write_shards(
    df: DataFrame,
    id_col: str,
    n_shards: int,
    out_dir: str,
    seed: int = 17,
    chars_col: str | None = None,
    tasks_per_shard: int = 1,
) -> DataFrame:
    """Materialize the deterministic shuffle: assign, partition so the
    output layout is the ONLY exchange, sort each partition by
    (shard, order_key, id), write parquet partitioned by shard, and
    return the manifest to verify the written files against.

    Two parallelism modes — the 100 TB knob:

    - ``tasks_per_shard=1``: `repartition(n_shards, "shard")` routes
      every row of a shard to ONE task; each `shard=K/` directory is
      that task's output in sorted order (one file unless
      ``spark.sql.files.maxRecordsPerFile`` splits it — split files
      number monotonically within the task, preserving the sort).
      Rerunning on any cluster layout rewrites byte-identical shard
      FILES. Right when shards are small enough for one task
      (<= a few GB each).
    - ``tasks_per_shard>1``: `repartitionByRange` over
      (shard, order_key) splits each shard across ~tasks_per_shard
      contiguous, non-overlapping key ranges — at 100 TB / 2048
      shards, one task per shard means ~50 GB tasks, so this is the
      mode that actually runs. Range boundaries come from sampling,
      so FILE boundaries may shift between runs/layouts; the
      CONCATENATED per-shard stream (files in name order — ascending
      partition id == ascending key range) is still the identical
      total order, and the manifest (count/XOR/span) is partitioning-
      invariant either way. Verify streams, not files, in this mode.

    The id tiebreak after order_key makes the within-shard order total
    even across 60-bit order-key collisions (~2^30 docs/shard for 50%
    odds), so the layout is reproducible unconditionally, not just
    almost-surely.
    """
    if tasks_per_shard < 1:
        raise ValueError(
            f"write_shards: tasks_per_shard must be >= 1, got {tasks_per_shard}"
        )
    assigned = assign_shards(df, id_col, n_shards, seed)
    if tasks_per_shard == 1:
        routed = assigned.repartition(n_shards, "shard")
    else:
        routed = assigned.repartitionByRange(
            n_shards * tasks_per_shard, F.col("shard"), F.col("order_key")
        )
    (
        routed.sortWithinPartitions("shard", "order_key", id_col)
        .write.partitionBy("shard")
        .mode("overwrite")
        .parquet(out_dir)
    )
    return shard_manifest(df, id_col, n_shards, seed, chars_col)
