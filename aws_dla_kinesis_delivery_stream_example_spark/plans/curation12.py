"""Round-13 batch additions (q140 + the q141 streaming twin's batch
pieces): DSIR-style importance reweighting.

Data Selection with Importance Resampling (Xie et al., 2023) selects
pretraining documents that RESEMBLE a target domain by estimating,
for hashed n-gram features, the ratio between the target's feature
distribution and the raw corpus's, then scoring each document by its
features' ratios. This is the mixture-shaping complement to the
filters already in the catalog: q67 reweights by GIVEN per-source
targets, q102 audits composition, q36/q97 gate on intrinsic quality —
q140 derives the weights FROM the data, pointing the corpus at a
target domain (here: the English stratum) without hand-set knobs.

Lattice deviation from the paper (documented): DSIR scores with
log-probability sums; cross-engine log on floats is not
hash-checkable. The score here is the per-bucket probability RATIO on
the integer milli floor lattice — score(b) = 1000 * c_tgt[b] * n_all
// (c_all[b] * n_tgt) — and a doc's importance is the floor-mean of
its token occurrences' scores. Monotone in the same direction as the
paper's per-token likelihood ratio, exactly reproducible in any
engine with 64-bit integers. At true 100 TB counts the raw triple
product can exceed int64; production folds the bucket counts first
(a 256-row transform) — EXECUTABLE here as ``dsir_distribution_milli``
/ ``dsir_reweight_milli`` (fold k = max(1, n_all div 2^24), identity
at bench counts, pinned equal to q140 by planted test). The catalog
faces keep the exact-count form, which bench counts never push past
the lattice, and hash-check it.

Conventions: the house md5-60-bit token hash folded mod 256 (the
q128 register fold geometry) computed JVM-side via conv() — the
bucket table is CORPUS-INDEPENDENT state (256 rows), which is the
entire scale story. The distribution is factored so q141 can
maintain the IDENTICAL (bkt, c_all, c_tgt) rows as streaming
aggregation state (the q128->q129 / q133->q134 twin discipline),
and the totals are derived FROM the distribution (sums of bucket
counts), so the 256-row state alone finalizes the whole report.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.staging import stage
from ..sources.tables import load_table
from .catalog import query
from .curation5 import calibration_oracle

_DSIR_BUCKETS = 256
_DSIR_TARGET_LANG = "en"
_DSIR_SELECT_MILLI = 1000  # selected = at-or-above corpus-average affinity

# Shared verbatim by q140 and its streaming twin q141 (the
# HIST_ORACLE / BLOOM_ORACLE convention): the stream's distribution
# state must finalize to the identical report row-for-row.
DSIR_ORACLE = f"""
    WITH tok AS (
        SELECT doc_id, source, lang,
               unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS t
        FROM documents
    ),
    b AS (
        SELECT doc_id, source, lang,
               CAST('0x' || substring(md5(t), 1, 15) AS BIGINT)
                   % {_DSIR_BUCKETS} AS bkt
        FROM tok
    ),
    tot AS (
        SELECT CAST(count(*) AS BIGINT) AS n_all,
               CAST(count(*) FILTER (WHERE lang = '{_DSIR_TARGET_LANG}')
                    AS BIGINT) AS n_tgt
        FROM b
    ),
    dist AS (
        SELECT bkt,
               CAST(count(*) AS BIGINT) AS c_all,
               CAST(count(*) FILTER (WHERE lang = '{_DSIR_TARGET_LANG}')
                    AS BIGINT) AS c_tgt
        FROM b GROUP BY bkt
    ),
    score AS (
        SELECT d.bkt,
               CAST(CASE WHEN t.n_tgt > 0
                         THEN 1000 * d.c_tgt * t.n_all
                              // (d.c_all * t.n_tgt)
                         ELSE 0 END AS BIGINT) AS s
        FROM dist d, tot t
    ),
    doc AS (
        SELECT b.doc_id, max(b.source) AS source,
               CAST(count(*) AS BIGINT) AS n_tok,
               CAST(sum(s.s) AS BIGINT) AS imp_sum
        FROM b JOIN score s USING (bkt)
        GROUP BY b.doc_id
    ),
    pd AS (
        SELECT doc_id, source,
               CAST(imp_sum // n_tok AS BIGINT) AS imp_milli
        FROM doc
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(imp_milli) // count(*) AS BIGINT) AS mean_imp_milli,
           CAST(count(*) FILTER (WHERE imp_milli >= {_DSIR_SELECT_MILLI})
                AS BIGINT) AS n_selected
    FROM pd GROUP BY source ORDER BY source
"""


def _dsir_bucket_rows(df: DataFrame) -> DataFrame:
    """(doc_id, source, lang, bkt): one row per token OCCURRENCE (DSIR
    uses counts, not presence), bkt = the house md5-60-bit hash folded
    mod 256, computed JVM-side (conv stays inside whole-stage codegen;
    no Python crossing). Works identically on a batch frame and on the
    unbounded streaming frame (q141)."""
    toks = F.expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)")
    return df.select(
        "doc_id", "source", "lang", F.explode(toks).alias("t")
    ).select(
        "doc_id",
        "source",
        "lang",
        F.expr(
            "CAST(conv(substring(md5(t), 1, 15), 16, 10) AS BIGINT)"
            f" % {_DSIR_BUCKETS}"
        ).alias("bkt"),
    )


def dsir_distribution(rows: DataFrame) -> DataFrame:
    """(bkt, c_all, c_tgt): the <= 256-row feature distribution. Counts
    are linear (commutative + associative), so the same agg serves the
    batch face and complete-mode streaming state (q141) — any
    micro-batch split or partial-agg merge order lands on identical
    rows, the q133/q134 argument."""
    is_tgt = F.col("lang") == _DSIR_TARGET_LANG
    return rows.groupBy("bkt").agg(
        F.count(F.lit(1)).cast("long").alias("c_all"),
        F.count(F.when(is_tgt, 1)).cast("long").alias("c_tgt"),
    )


# The milli fold's target magnitude: folded totals stay <= ~2^24 + 256,
# so the score's triple product 1000 * c_tgt' * n_all' peaks at
# ~1000 * 2^48 ~ 2.8e17 — inside int64 with 30x headroom — at ANY
# corpus size, while a 256-bucket distribution keeps ~2^24/256 = 65k
# quanta per bucket (relative quantization ~1.5e-5, invisible on the
# milli score lattice).
_DSIR_FOLD_LIMIT = 1 << 24


def dsir_distribution_milli(dist: DataFrame) -> DataFrame:
    """The 100 TB int64-headroom mode of the DSIR distribution,
    executable (round-13 verdict Next #4): fold the (c_all, c_tgt)
    bucket counts by k = max(1, n_all div 2^24) — a 256-row transform
    deriving k from the distribution's OWN total — before the ratio,
    so ``dsir_score_table``'s triple product stays inside int64 at
    true 100 TB token counts (raw, ``1000 * c_tgt * n_all`` crosses
    int64 once ``c_tgt * n_all`` passes ~9.2e15 — between ~1e8 total
    tokens for a fully skewed distribution and ~1.5e9 for a uniform
    one; a 100 TB corpus is ~2.5e13. The module docstring's
    documented deviation, now code instead of narration).

    Equivalence pin (the ``bloom_decontam_scale`` /
    ``minhash_calibration_sampled`` discipline): at bench counts
    n_all < 2^24, so k == 1 and the fold is the IDENTITY — the
    planted test pins ``dsir_reweight_milli`` == q140 column-for-
    column, and a second planted test drives near-int64-max synthetic
    counts through the fold, asserting no wrap (scores equal the
    pure-python big-int model of the folded lattice) and <= 3-milli
    drift from the exact big-int score."""
    dist = stage(dist)
    # staged: the fold-factor agg and the folded projection read it
    tot = dist.agg(F.sum("c_all").cast("long").alias("n_all_raw"))
    k = F.greatest(
        F.lit(1).cast("long"), F.expr(f"n_all_raw div {_DSIR_FOLD_LIMIT}")
    )
    return dist.crossJoin(F.broadcast(tot.select(k.alias("fold_k")))).select(
        "bkt",
        F.expr("c_all div fold_k").cast("long").alias("c_all"),
        F.expr("c_tgt div fold_k").cast("long").alias("c_tgt"),
    )


def dsir_reweight_milli(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q140's at-scale mode, executable: the identical report built
    through ``dsir_distribution_milli``'s folded lattice. Library
    entry point, NOT a catalog query — at bench counts the fold is
    the identity (k == 1), so the catalog face q140 is strictly more
    informative; this exists so the int64-headroom story is code the
    planted pin can hold still (the ``bloom_decontam_scale``
    convention)."""
    rows = stage(_dsir_bucket_rows(load_table(spark, sf_dir, "documents")))
    # staged: the distribution agg and the per-doc scoring join each
    # read the exploded token frame once (q140's shape)
    return _dsir_output(
        spark,
        sf_dir,
        dsir_distribution_milli(dsir_distribution(rows)),
        rows=rows,
    )


def dsir_score_table(dist: DataFrame) -> DataFrame:
    """(bkt, s): the per-bucket milli ratio scores from a (bkt, c_all,
    c_tgt) distribution — exact (q140/q141) or milli-folded
    (``dsir_distribution_milli``). The TOTALS are derived from the
    distribution itself (sums of bucket counts), so the 256-row frame
    alone determines the score table.

    Empty/underflow conventions (round-13 advisor + the milli fold):
    a corpus with ZERO target-language tokens has no measurable
    affinity — every score is 0 (so imp_milli = 0 < the 1000
    selection bar: nothing selected) instead of Spark
    NULL-vs-DuckDB-error divergence on the 0/0 ratio; a bucket whose
    folded mass underflows to c_all = 0 (possible only under the
    milli fold, impossible for the exact groupBy output) likewise
    scores 0. Mirrored verbatim in DSIR_ORACLE's CASE (where only the
    n_tgt arm is reachable)."""
    dist = stage(dist)
    # staged: the totals agg and the score projection read it; for the
    # streaming twin this also freezes the drained state
    tot = dist.agg(
        F.sum("c_all").cast("long").alias("n_all"),
        F.sum("c_tgt").cast("long").alias("n_tgt"),
    )
    return dist.crossJoin(F.broadcast(tot)).select(
        "bkt",
        F.when(
            (F.col("n_tgt") > 0) & (F.col("c_all") > 0),
            F.expr("1000 * c_tgt * n_all div (c_all * n_tgt)"),
        )
        .otherwise(F.lit(0))
        .cast("long")
        .alias("s"),
    )


def _dsir_output(
    spark: SparkSession,
    sf_dir: str,
    dist: DataFrame,
    rows: DataFrame | None = None,
) -> DataFrame:
    """Finalize the report from a (bkt, c_all, c_tgt) distribution —
    batch-built (q140) or drained from streaming state (q141):
    per-doc scoring joins the broadcast ``dsir_score_table`` onto one
    token pass (``rows``, rebuilt from the batch table when the
    caller — the streaming twin — doesn't already hold a staged
    one)."""
    if rows is None:
        rows = _dsir_bucket_rows(load_table(spark, sf_dir, "documents"))
    score = dsir_score_table(dist)
    doc = (
        rows.join(F.broadcast(score), "bkt")
        .groupBy("doc_id")
        .agg(
            F.max("source").alias("source"),
            F.count(F.lit(1)).cast("long").alias("n_tok"),
            F.sum("s").cast("long").alias("imp_sum"),
        )
    )
    pd = doc.select(
        "doc_id",
        "source",
        F.expr("imp_sum div n_tok").cast("long").alias("imp_milli"),
    )
    return (
        pd.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.expr("sum(imp_milli) div count(*)")
            .cast("long")
            .alias("mean_imp_milli"),
            F.count(F.when(F.col("imp_milli") >= _DSIR_SELECT_MILLI, 1))
            .cast("long")
            .alias("n_selected"),
        )
        .orderBy("source")
    )


@query(
    "q140_dsir_reweight",
    oracle=DSIR_ORACLE,
    description="DSIR-style importance reweighting toward the English "
    "target stratum: hashed-unigram bucket distributions (md5-60-bit "
    "mod 256) for target and corpus, per-bucket probability ratio on "
    "the integer milli floor lattice, per-doc importance = floor-mean "
    "of its token occurrences' bucket scores, rolled up per source "
    "with the count selected at >= corpus-average affinity (1000 "
    "milli) — derives mixture weights FROM the data (vs q67's given "
    "targets), the Xie et al. 2023 data-selection shape",
    tags=("llm", "curation"),
)
def q140_dsir_reweight(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale shape: ONE corpus-sized token explode (staged — the
    distribution agg and the scoring join read it; the same cost
    class as every shingle pass in the dedup family). Everything
    derived is corpus-INDEPENDENT state: the bucket distribution
    collapses map-side to <= 256 rows before its exchange (staged —
    the totals and score projections read it), the totals are a 1-row
    broadcast derived FROM it (crossJoin of a scalar frame, the house
    exception), and the score table broadcast onto the token frame is
    256 rows at ANY corpus size — so the per-doc scoring pass never
    shuffles the corpus (join side is broadcast), and the per-doc agg
    collapses map-side per doc_id. At 100 TB the bucket table is the
    piece you persist and re-use across selection runs (it is
    mergeable: counts add across shards, measured saturating at
    exactly 256 rows at the 500k-doc rehearsal tier), exactly like
    the q128 registers — and q141 maintains the SAME rows as
    streaming aggregation state while the crawl lands. This batch
    face is replay-safe (deterministic re-aggregation over a static
    snapshot); the at-least-once linear-count caveat documented on
    q141 (cf. q51/q83) applies only to the streaming twin."""
    rows = stage(_dsir_bucket_rows(load_table(spark, sf_dir, "documents")))
    # staged: the distribution agg and the per-doc scoring join each
    # read the exploded token frame once
    return _dsir_output(spark, sf_dir, dsir_distribution(rows), rows=rows)


# --------------------------------------------------------------- q142

# Sampled-calibration stratum: the q60 multiplicative hash, mod 2,
# bucket 0 — the largest proper stratum, non-vacuous (n_truth > 0) at
# every committed SF (pinned by test; mod 4 already empties the truth
# set at sf0.01's geometry).
_Q142_MOD = 2
_Q142_BUCKET = 0


@query(
    "q142_sampled_calibration",
    # q114's oracle verbatim, restricted to the stratum in the ONE
    # place the corpus enters (the template's first CTE) — the audited
    # face and the sampled mode cannot drift apart. doc_id reduced mod
    # P BEFORE the multiply (round-13 advisor: the raw product
    # overflows int64 past id ~3.47e9; the reduced form is identical).
    oracle=calibration_oracle(
        "WHERE (doc_id % 2147483647) * 2654435761 % 2147483647 % "
        f"{_Q142_MOD} = {_Q142_BUCKET}"
    ),
    description="q114's MinHash estimator calibration run the way a "
    "100 TB deployment actually runs it — on a deterministic "
    "multiplicative-hash document stratum (q60 split convention, mod "
    "2 bucket 0): the cap-free exact-Jaccard truth side is the one "
    "corpus-quadratic piece, so at scale you sample documents (not "
    "pairs, keeping both generators' semantics intact within the "
    "stratum) and size bands/hashes from the sampled recall/"
    "precision; identical SQL template as q114 with the stratum "
    "predicate injected at the corpus scan",
    tags=("llm", "dedup", "audit"),
)
def q142_sampled_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale shape: the stratum predicate is integer arithmetic on
    doc_id applied AT THE SCAN, before shingling, signatures, or any
    exchange — everything downstream (the two candidate generators
    and their pair-set-sized audit join, q114's plan) runs on
    |corpus| / sample_mod rows. Sampling documents keeps the audit
    unbiased under hash-random strata (within-stratum pairs only —
    the standard LSH calibration protocol, the tradeoff
    minhash_calibration_sampled documents). At 100 TB sample_mod is
    the knob: 1000 for a 0.1% pilot; the catalog pins mod 2 so the
    oracle's truth set stays non-vacuous at bench SFs."""
    from ..operators.dedup import minhash_calibration_sampled

    docs = load_table(spark, sf_dir, "documents")
    return minhash_calibration_sampled(
        docs,
        threshold=0.5,
        sample_mod=_Q142_MOD,
        sample_bucket=_Q142_BUCKET,
    )
