"""Corpus-curation query specs (q64+): decontamination, incremental
dedup, boilerplate detection, mixture reweighting, sequence packing,
embedding-centroid hygiene — the remaining operators a training-data
pipeline runs between raw ingest and tokenized output.

Conventions follow catalog.py: identical column aliases both sides,
total ORDER BY, BIGINT casts on integer aggregates, doubles rounded
where both engines are on-grid.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import text as TX
from ..operators import curation
from ..sources.tables import load_table
from .catalog import query

# Deterministic benchmark membership: every 50th doc plays the role of
# an eval-set document (sf-stable: scales with the corpus).
_BENCH_MOD = 50


@query(
    "q64_contamination_check",
    oracle=f"""
        WITH toks AS (
            SELECT doc_id, source,
                   regexp_extract_all(lower(text), '[a-z0-9]+') AS tk
            FROM documents
        ),
        sh AS (
            SELECT DISTINCT doc_id,
                   array_to_string(array_slice(tk, i, i + 3), ' ') AS shingle
            FROM toks, UNNEST(generate_series(1, greatest(len(tk) - 3, 0))) AS t(i)
        ),
        bench AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % {_BENCH_MOD} = 0),
        hit AS (
            SELECT DISTINCT s.doc_id FROM sh s JOIN bench b USING (shingle)
            WHERE s.doc_id % {_BENCH_MOD} <> 0
        )
        SELECT source,
               count(*) AS n_candidates,
               CAST(sum(CASE WHEN doc_id IN (SELECT doc_id FROM hit)
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_contaminated
        FROM documents
        WHERE doc_id % {_BENCH_MOD} <> 0
        GROUP BY source ORDER BY source
    """,
    description="Benchmark decontamination: candidate docs sharing any "
    "word-4-gram with the (broadcast) benchmark shingle set are flagged; "
    "per-source contamination counts are the audit output",
    tags=("llm", "curation", "dedup"),
)
def q64_contamination_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    bench_pred = F.col("doc_id") % _BENCH_MOD == 0
    bench, cand = docs.filter(bench_pred), docs.filter(~bench_pred)
    hits = curation.contaminated_ids(cand, bench, "doc_id", "text", n=4)
    flagged = cand.join(
        hits.withColumn("_hit", F.lit(1)), "doc_id", "left"
    )
    return (
        flagged.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_candidates"),
            F.sum(F.coalesce(F.col("_hit"), F.lit(0))).cast("long").alias("n_contaminated"),
        )
        .orderBy("source")
    )


@query(
    "q65_incremental_dedup",
    oracle="""
        WITH h AS (
            SELECT doc_id, source, md5(text) AS hsh FROM documents
        ),
        corpus AS (SELECT DISTINCT hsh FROM h WHERE doc_id % 2 = 0),
        batch AS (SELECT * FROM h WHERE doc_id % 2 = 1),
        fresh AS (
            SELECT b.* FROM batch b
            WHERE NOT EXISTS (SELECT 1 FROM corpus c WHERE c.hsh = b.hsh)
        )
        SELECT min(doc_id) AS keep_id,
               arg_min(source, doc_id) AS source,
               count(*) AS n_copies
        FROM fresh GROUP BY hsh ORDER BY keep_id
    """,
    description="Incremental dedup: a new ingest batch (odd doc_ids) is "
    "deduped against the existing corpus (even doc_ids) by md5 content "
    "digest — 16-byte keys through the anti join, never document bodies — "
    "then min-id-survivor deduped within itself",
    tags=("llm", "curation", "dedup"),
)
def q65_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    corpus = docs.filter(F.col("doc_id") % 2 == 0)
    batch = docs.filter(F.col("doc_id") % 2 == 1)
    kept = curation.incremental_dedup(batch, corpus, "doc_id", "text")
    return kept.select("keep_id", "source", "n_copies").orderBy("keep_id")


@query(
    "q66_boilerplate_ngrams",
    oracle="""
        WITH toks AS (
            SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS tk
            FROM documents
        ),
        sh AS (
            SELECT DISTINCT doc_id,
                   array_to_string(array_slice(tk, i, i + 4), ' ') AS shingle
            FROM toks, UNNEST(generate_series(1, greatest(len(tk) - 4, 0))) AS t(i)
        ),
        boiler AS (
            SELECT shingle FROM sh GROUP BY shingle HAVING count(*) >= 3
        ),
        per_doc AS (
            SELECT s.doc_id, count(*) AS n_sh,
                   sum(CASE WHEN b.shingle IS NOT NULL THEN 1 ELSE 0 END) AS n_boiler
            FROM sh s LEFT JOIN boiler b USING (shingle)
            GROUP BY s.doc_id
        )
        SELECT d.source,
               count(*) AS n_docs,
               CAST(sum(p.n_boiler) AS BIGINT) AS boiler_shingles,
               round(avg(CAST(p.n_boiler AS DOUBLE) / p.n_sh), 4) AS avg_boiler_ratio
        FROM per_doc p JOIN documents d ON d.doc_id = p.doc_id
        GROUP BY d.source ORDER BY source
    """,
    description="Boilerplate n-gram detection (C4-style): word-5-grams "
    "appearing in >= 3 distinct docs are boilerplate; the df count is "
    "map-side combinable and the boilerplate set broadcasts back for "
    "the per-doc ratio",
    tags=("llm", "curation", "quality"),
)
def q66_boilerplate_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    per_doc = curation.boilerplate_ratio(docs, "doc_id", "text", n=5, min_df=3)
    return (
        per_doc.join(docs.select("doc_id", "source"), "doc_id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_boiler").cast("long").alias("boiler_shingles"),
            F.round(F.avg(F.col("boiler_ratio")), 4).alias("avg_boiler_ratio"),
        )
        .orderBy("source")
    )


@query(
    "q67_mixture_reweight",
    oracle="""
        WITH s AS (
            SELECT source,
                   CAST(sum(len(regexp_extract_all(text, '\\w+|[^\\w\\s]'))) AS BIGINT)
                     AS n_tok
            FROM documents GROUP BY source
        ),
        t AS (
            SELECT source, n_tok,
                   CASE WHEN substr(source, length(source), 1)
                             IN ('0','2','4','6','8')
                        THEN 2.0 ELSE 1.0 END AS w
            FROM s
        ),
        g AS (SELECT sum(n_tok) AS total, sum(w) AS sumw FROM t)
        SELECT source, n_tok,
               round(w / sumw, 4) AS target_share,
               round(least(1.0, (w / sumw) * total / n_tok), 4) AS sample_rate
        FROM t, g ORDER BY source
    """,
    description="Domain-mixture reweighting: per-source sampling rates "
    "that hit a target mixture (2x weight on even-suffixed sources), "
    "clamped at 1.0 — one aggregation plus a broadcast of the 1-row "
    "global totals",
    tags=("llm", "curation"),
)
def q67_mixture_reweight(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    s = docs.groupBy("source").agg(
        F.sum(TX.bpe_token_count("text")).cast("long").alias("n_tok")
    )
    w = F.when(
        F.substring(F.col("source"), -1, 1).isin("0", "2", "4", "6", "8"), F.lit(2.0)
    ).otherwise(F.lit(1.0))
    t = s.withColumn("w", w)
    g = t.agg(
        F.sum("n_tok").cast("double").alias("total"), F.sum("w").alias("sumw")
    )
    rate = F.least(
        F.lit(1.0), (F.col("w") / F.col("sumw")) * F.col("total") / F.col("n_tok")
    )
    return (
        t.crossJoin(F.broadcast(g))
        .select(
            "source",
            "n_tok",
            F.round(F.col("w") / F.col("sumw"), 4).alias("target_share"),
            F.round(rate, 4).alias("sample_rate"),
        )
        .orderBy("source")
    )


_CTX = 2048  # packed-sequence context length (tokens)


@query(
    "q68_sequence_packing",
    oracle=f"""
        WITH t AS (
            SELECT source, doc_id,
                   len(regexp_extract_all(text, '\\w+|[^\\w\\s]')) AS n_tok
            FROM documents
        ),
        c AS (
            SELECT source, n_tok,
                   sum(n_tok) OVER (PARTITION BY source ORDER BY doc_id
                                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                     AS cum
            FROM t WHERE n_tok > 0
        )
        SELECT source,
               CAST(sum(n_tok) AS BIGINT) AS total_tokens,
               CAST(floor((max(cum) - 1) / {_CTX}) + 1 AS BIGINT) AS n_sequences,
               CAST(sum(CASE WHEN floor((cum - n_tok) / {_CTX})
                                  <> floor((cum - 1) / {_CTX})
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_straddlers
        FROM c GROUP BY source ORDER BY source
    """,
    description="Concat-and-split sequence packing accounting: docs "
    "stream per source in doc_id order into 2048-token sequences; "
    "outputs sequence counts and boundary-straddling docs (the rows "
    "needing cross-doc attention masks) — one window + one aggregate",
    tags=("llm", "curation", "window"),
)
def q68_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    docs = load_table(spark, sf_dir, "documents")
    t = docs.select(
        "source", "doc_id", TX.bpe_token_count("text").alias("n_tok")
    ).filter(F.col("n_tok") > 0)
    win = W.partitionBy("source").orderBy("doc_id").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    c = t.withColumn("cum", F.sum("n_tok").over(win))
    straddle = (
        F.floor((F.col("cum") - F.col("n_tok")) / _CTX)
        != F.floor((F.col("cum") - 1) / _CTX)
    ).cast("long")
    return (
        c.groupBy("source")
        .agg(
            F.sum("n_tok").cast("long").alias("total_tokens"),
            (F.floor((F.max("cum") - 1) / _CTX) + 1).cast("long").alias("n_sequences"),
            F.sum(straddle).cast("long").alias("n_straddlers"),
        )
        .orderBy("source")
    )


@query(
    "q69_embedding_centroid_stats",
    oracle="""
        WITH u AS (
            SELECT label, i AS pos, CAST(embedding[i] AS DOUBLE) AS val,
                   vec_id, embedding
            FROM embeddings, UNNEST(generate_series(1, len(embedding))) AS t(i)
        ),
        c AS (SELECT label, pos, avg(val) AS cv FROM u GROUP BY label, pos),
        d AS (
            SELECT u.vec_id, u.label,
                   sum(u.val * c.cv) AS dot,
                   sqrt(sum(u.val * u.val)) AS na,
                   sqrt(sum(c.cv * c.cv)) AS nb
            FROM u JOIN c ON c.label = u.label AND c.pos = u.pos
            GROUP BY u.vec_id, u.label
        )
        SELECT label,
               count(*) AS n,
               round(avg(dot / (na * nb)), 3) AS avg_cos,
               round(min(dot / (na * nb)), 3) AS min_cos
        FROM d GROUP BY label ORDER BY label
    """,
    description="Embedding hygiene vs label centroid: cosine of every "
    "vector to its label's mean embedding (broadcast centroids), the "
    "outlier/drift signal for corrupt or mislabeled vectors",
    tags=("llm", "curation", "similarity"),
)
def q69_embedding_centroid_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    cc = curation.centroid_cosines(emb, "vec_id", "embedding", "label")
    return (
        cc.groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("cos_centroid"), 3).alias("avg_cos"),
            F.round(F.min("cos_centroid"), 3).alias("min_cos"),
        )
        .orderBy("label")
    )


@query(
    "q93_duplicated_spans",
    oracle="""
        WITH t AS (
            SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
            FROM documents
        ),
        w AS (
            SELECT doc_id, i AS pos,
                   CAST('0x' || substring(
                       md5(array_to_string(array_slice(toks, i, i + 19), ' ')),
                       1, 15) AS BIGINT) AS h
            FROM t, UNNEST(generate_series(1, len(toks) - 19)) AS g(i)
            WHERE len(toks) >= 20
        ),
        d AS (SELECT h FROM w GROUP BY h HAVING count(*) > 1),
        dw AS (SELECT w.doc_id, w.pos FROM w JOIN d USING (h)),
        cov AS (
            SELECT doc_id,
                   CASE WHEN lead(pos) OVER (PARTITION BY doc_id ORDER BY pos)
                             - pos < 20
                        THEN lead(pos) OVER (PARTITION BY doc_id ORDER BY pos)
                             - pos
                        ELSE 20 END AS c
            FROM dw
        ),
        pd AS (
            SELECT doc_id, count(*) AS n_dup_windows, sum(c) AS dup_tokens
            FROM cov GROUP BY doc_id
        )
        SELECT t.doc_id,
               CAST(len(t.toks) AS BIGINT) AS n_tokens,
               CAST(coalesce(pd.n_dup_windows, 0) AS BIGINT) AS n_dup_windows,
               CAST(coalesce(pd.dup_tokens, 0) AS BIGINT) AS dup_tokens,
               round(coalesce(pd.dup_tokens, 0)
                     / greatest(len(t.toks), 1), 6) AS dup_fraction
        FROM t LEFT JOIN pd USING (doc_id)
        ORDER BY doc_id
    """,
    description="EXACTSUBSTR-style duplicated-span coverage (Lee et "
    "al.): per-doc fraction of tokens covered by 20-token windows "
    "occurring more than once in the corpus — one row per doc, no "
    "pair join, every stage linear in corpus token count (the massive-"
    "dedup quality signal used by modern pretraining pipelines)",
    tags=("llm", "curation", "dedup"),
)
def q93_duplicated_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return curation.duplicated_span_stats(docs, "doc_id", "text", n=20).orderBy(
        "doc_id"
    )
