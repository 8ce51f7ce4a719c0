"""Corpus-curation operators beyond per-doc scoring (SURVEY.md §2.11
extension): benchmark-contamination checks, incremental (batch-vs-
corpus) dedup, boilerplate n-gram detection, and embedding-centroid
quality stats.

100 TB design notes
-------------------
- Contamination: the *benchmark* shingle set is tiny (benchmarks are
  MBs, the corpus is TBs), so the membership probe is a broadcast semi
  join — the corpus-sized side streams map-side, no shuffle of corpus
  shingles at all.
- Incremental dedup: the "have we seen this content before" key is a
  fixed-width digest (md5 here: engine-independent, reproducible by any
  SQL oracle; swap xxhash64 in production for speed), so the anti join
  shuffles 16-byte keys, never document bodies.
- Boilerplate: document-frequency counting is a map-side-combinable
  aggregation; the resulting boilerplate set (shingles with df >=
  min_df) is vastly smaller than the corpus and broadcasts back for
  the per-doc ratio join.
- Centroid stats: per-label centroids are |labels| x dim doubles —
  broadcast-sized by construction; the per-vector cosine is a narrow
  map over the embedding column.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.vectors import cosine
from .staging import stage


def content_digest(text_col) -> Column:
    """Engine-independent content key for exact dedup across runs
    (md5 is reproducible in DuckDB/Trino/Flink SQL alike)."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.md5(c)


def contaminated_ids(
    candidates: DataFrame,
    benchmark: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 8,
) -> DataFrame:
    """IDs of candidate docs sharing >= 1 word-``n``-gram with any
    benchmark doc (the decontamination pass a training pipeline runs
    against eval sets before training).

    The benchmark shingle set is deduplicated and broadcast; candidate
    shingles stream through a map-side semi join. Shingles are
    represented by their md5-prefix hash (dedup._shingle_hash_rows)
    — membership is invariant under the injective mapping, the
    broadcast set shrinks ~4x, and the one-pass Python tokenize+hash
    beats interpreted JVM string-building (measured 4.4 s -> ~2 s at
    sf0.1 for the q64 shape).
    """
    from .dedup import _shingle_hash_rows

    bench_sh = (
        _shingle_hash_rows(benchmark, id_col, text_col, n)
        .select(F.col("h").alias("shingle"))
        .distinct()
    )
    cand_sh = _shingle_hash_rows(candidates, id_col, text_col, n).select(
        F.col("doc").alias(id_col), F.col("h").alias("shingle")
    )
    return (
        cand_sh.join(F.broadcast(bench_sh), "shingle", "left_semi")
        .select(id_col)
        .distinct()
    )


def incremental_dedup(
    batch: DataFrame, corpus: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """Dedup a new ingest batch against an existing corpus, then within
    itself: drop batch docs whose content digest already exists in the
    corpus, then keep the min-id survivor per digest among the rest.

    Returns one row per kept doc: (keep_id, source, n_copies) where
    n_copies counts the within-batch duplicates it absorbed.
    """
    bh = batch.withColumn("_h", content_digest(text_col))
    ch = corpus.select(content_digest(text_col).alias("_h")).distinct()
    fresh = bh.join(ch, "_h", "left_anti")
    return (
        fresh.groupBy("_h")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.expr(f"min_by(source, {id_col})").alias("source"),
            F.count(F.lit(1)).alias("n_copies"),
        )
        .drop("_h")
    )


def boilerplate_ratio(
    docs: DataFrame, id_col: str, text_col: str, n: int = 5, min_df: int = 3
) -> DataFrame:
    """Per-doc share of word-``n``-gram shingles that are *boilerplate*
    (appear in >= ``min_df`` distinct docs) — the C4-style repeated-
    template signal. Docs with zero shingles (shorter than ``n`` words)
    are excluded.

    Returns (id_col, n_shingles, n_boiler, boiler_ratio).
    """
    # The shingle explosion feeds two consumers (the df count and the
    # per-doc ratio join) — materialize it once instead of re-running
    # the tokenize+explode over the corpus (a staging table at scale).
    # Hash-represented shingles (see contaminated_ids): df counting and
    # set membership are injective-mapping-invariant.
    from .dedup import _shingle_hash_rows

    sh = stage(
        _shingle_hash_rows(docs, id_col, text_col, n).select(
            F.col("doc").alias(id_col), F.col("h").alias("shingle")
        )
    )
    boiler = (
        sh.groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") >= min_df)
        .select("shingle")
    )
    flagged = sh.join(
        F.broadcast(boiler.withColumn("_b", F.lit(1))), "shingle", "left"
    )
    return (
        flagged.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum(F.coalesce(F.col("_b"), F.lit(0))).cast("long").alias("n_boiler"),
        )
        .withColumn(
            "boiler_ratio",
            F.col("n_boiler").cast("double") / F.col("n_shingles").cast("double"),
        )
    )


def label_centroids(emb: DataFrame, vec_col: str, label_col: str) -> DataFrame:
    """Element-wise mean embedding per label as (label, centroid
    array<double>) — |labels| x dim rows, broadcast-sized."""
    unpacked = emb.select(
        F.col(label_col), F.posexplode(F.col(vec_col)).alias("pos", "val")
    )
    cent = unpacked.groupBy(label_col, "pos").agg(F.avg("val").alias("c"))
    return (
        cent.groupBy(label_col)
        .agg(F.array_sort(F.collect_list(F.struct("pos", "c"))).alias("pc"))
        .select(
            label_col, F.transform("pc", lambda s: s["c"]).alias("centroid")
        )
    )


def centroid_cosines(
    emb: DataFrame, id_col: str, vec_col: str, label_col: str
) -> DataFrame:
    """Cosine of every vector to its label centroid — the outlier /
    drift signal used to filter corrupt or mislabeled embeddings."""
    cents = label_centroids(emb, vec_col, label_col)
    return emb.join(F.broadcast(cents), label_col).select(
        id_col, label_col, cosine(vec_col, "centroid").alias("cos_centroid")
    )
