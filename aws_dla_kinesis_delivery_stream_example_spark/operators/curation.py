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


def contamination_overlap(
    candidates: DataFrame,
    benchmark: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 4,
) -> DataFrame:
    """Per-candidate-doc benchmark overlap FRACTION — the graded
    refinement of :func:`contaminated_ids`' boolean flag (the GPT-3
    appendix-C style "n-gram overlap with eval sets" audit): for every
    candidate document, what share of its distinct word ``n``-grams
    appears anywhere in the benchmark set. A pipeline thresholds this
    (drop at >= 10%, review at >= 1%) instead of dropping on a single
    shared shingle.

    Returns (id_col, n_shingles, n_hit, overlap_frac) — one row per
    candidate doc that has >= 1 shingle (docs shorter than ``n`` words
    produce none, same exclusion as ``boilerplate_ratio``);
    overlap_frac is rounded to 4 dp on both engines.

    100 TB shape: identical to ``contaminated_ids`` — the benchmark
    shingle set is distinct + broadcast (a real eval suite is MBs, not
    TBs), candidate shingles stream through one map-side hash join,
    and the per-doc ratio is a map-side-combinable count aggregation.
    No shuffle grows with the benchmark; everything else is linear in
    candidate corpus tokens.
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
    flagged = cand_sh.join(
        F.broadcast(bench_sh.withColumn("_b", F.lit(1))), "shingle", "left"
    )
    return (
        flagged.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum(F.coalesce(F.col("_b"), F.lit(0))).cast("long").alias("n_hit"),
        )
        .withColumn(
            "overlap_frac",
            F.round(
                F.col("n_hit").cast("double") / F.col("n_shingles").cast("double"),
                4,
            ),
        )
    )


def incremental_dedup(
    batch: DataFrame, corpus: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """Dedup a new ingest batch against an existing corpus, then within
    itself: drop batch docs whose content digest already exists in the
    corpus, then keep the min-id survivor per digest among the rest.

    Returns one row per kept doc: (keep_id, source, n_copies) where
    n_copies counts the within-batch duplicates it absorbed.

    NULL-text semantics are SQL's, deliberately (they are what the
    DuckDB oracle computes and what the q65 contract pins): a NULL
    digest never matches the corpus (anti-join null inequality), and
    all NULL-text batch docs then collapse into ONE group with a
    min-id survivor — GROUP BY treats NULLs as equal. If your
    pipeline means "content unknown, keep all" for failed
    extractions, pre-filter null texts before calling; silently
    treating unknown content as mutual duplicates is usually not what
    you want (tests/test_curation.py pins the SQL behavior).
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


def duplicated_span_stats(
    docs: DataFrame, id_col: str, text_col: str, n: int = 20
) -> DataFrame:
    """Per-doc duplicated-span coverage — the EXACTSUBSTR-style signal
    (Lee et al., "Deduplicating Training Data Makes Language Models
    Better"): how much of each document is covered by token ``n``-gram
    windows that occur MORE THAN ONCE in the corpus (cross-doc or
    within-doc). Unlike the pair-producing dedup family this emits one
    row per document, so there is NO pair join and no O(df^2) hazard
    anywhere: window hashing is a narrow map, the duplicate-window set
    is one map-side-combinable count aggregation, the join-back is an
    equi semi join on fixed-width hashes, and coverage is a per-doc
    window function — every stage linear in corpus token count.

    Coverage counts each token once even under overlapping duplicated
    windows (union of [pos, pos+n) intervals via a sorted lead() pass),
    which is what makes the number a defensible "fraction of this doc
    is duplicated text" curation signal rather than an occurrence
    count (``boilerplate_ratio`` is the occurrence-count variant at
    shingle granularity).

    Returns (id_col, n_tokens, n_dup_windows, dup_tokens,
    dup_fraction) for EVERY input document; docs shorter than ``n``
    tokens report zeros. Window hashes are 60-bit md5 prefixes —
    engine-portable (the q37 pattern), so the whole statistic sits
    under a full DuckDB hash oracle.
    """
    from pyspark.sql import Window

    from ..functions import text as TX

    toks = docs.select(
        F.col(id_col).alias("doc"), TX.words(text_col).alias("toks")
    ).withColumn("n_tokens", F.size("toks").cast("long"))
    window_structs = F.transform(
        F.sequence(F.lit(1), F.size("toks") - n + 1),
        lambda i: F.struct(
            i.alias("pos"),
            TX.hash60(F.concat_ws(" ", F.slice("toks", i, n))).alias("h"),
        ),
    )
    # ONE tokenize+hash pass feeds all three consumers (duplicate
    # count, join-back, final n_tokens projection): stage the
    # pre-explode frame holding (doc, n_tokens, hashed windows) —
    # a staging table at 100 TB scale.  Docs shorter than n carry a
    # NULL window array (explode drops them) but keep their n_tokens
    # row.  Staging pre-explode instead of post keeps the cache the
    # same size while making n_tokens free — the former shape re-ran
    # the tokenizing regex over the whole corpus a second time just to
    # recompute n_tokens for the final join.
    pre = stage(
        toks.select(
            "doc",
            "n_tokens",
            F.when(F.col("n_tokens") >= n, window_structs).alias("ws"),
        )
    )
    w = pre.select("doc", F.explode("ws").alias("w")).select(
        "doc", F.col("w.pos").alias("pos"), F.col("w.h").alias("h")
    )
    # duplicated = total occurrences > 1; NOT broadcast — at web scale
    # the duplicated-span set grows with the duplicate population, so
    # the join-back is a plain (linear) shuffle join, AQE may still
    # broadcast it when small
    dup = (
        w.groupBy("h")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") > 1)
        .select("h")
    )
    ww = Window.partitionBy("doc").orderBy("pos")
    nxt = F.lead("pos").over(ww)
    covered = (
        F.when(nxt.isNotNull() & (nxt - F.col("pos") < n), nxt - F.col("pos"))
        .otherwise(F.lit(n))
        .cast("long")
    )
    per_doc = (
        w.join(dup, "h", "left_semi")
        .select("doc", covered.alias("cov"))
        .groupBy("doc")
        .agg(
            F.count(F.lit(1)).alias("n_dup_windows"),
            F.sum("cov").alias("dup_tokens"),
        )
    )
    return (
        pre.select("doc", "n_tokens")
        .join(per_doc, "doc", "left")
        .select(
            F.col("doc").alias(id_col),
            "n_tokens",
            F.coalesce("n_dup_windows", F.lit(0)).cast("long").alias("n_dup_windows"),
            F.coalesce("dup_tokens", F.lit(0)).cast("long").alias("dup_tokens"),
            F.round(
                F.coalesce("dup_tokens", F.lit(0)).cast("double")
                / F.greatest(F.col("n_tokens"), F.lit(1)).cast("double"),
                6,
            ).alias("dup_fraction"),
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
