"""Round-14 fourth batch: corpus attrition ledger (q149).

Every published pretraining pipeline ships an attrition table —
"started with N docs; language filter removed X%, length Y%, quality
Z%" (Dolma's and RefinedWeb's papers print exactly this) — because
it is the operational answer to "why did my document disappear".
q120 measures ONE filter dimension as an ablation grid; q30 is the
gate itself. q149 is the accounting layer OVER the gate: run q30's
exact filter chain in a FIXED order (lang -> length -> alpha-ratio),
label every document with the FIRST gate it fails (or 'kept'), and
roll up per (source, reason) doc/token counts with per-source shares
on the milli lattice. First-failure attribution makes the reasons a
PARTITION of the corpus (shares sum to ~1000 per source, unlike
overlap-style per-filter counts), which is what makes the table
actionable: each row is docs you would recover by relaxing exactly
that gate.

The chain order is the SPEC, documented rather than incidental: a
doc failing both lang and length counts against 'lang' because that
is the first gate a production pipeline evaluates (cheapest first).
The gate thresholds are q30's verbatim — a planted test pins
sum(kept) == |q30's result| so the ledger provably explains the
gate's keep-set and the two specs cannot drift.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import Window
from pyspark.sql import functions as F

from ..functions import text as TX
from ..sources.tables import load_table
from .catalog import query

# q30's gate constants, shared verbatim (the calibration_oracle /
# PII_ORACLE single-source discipline).
_ATTR_LANG = "en"
_ATTR_MIN_CHARS, _ATTR_MAX_CHARS = 100, 5000
_ATTR_MIN_ALPHA = 0.6

ATTRITION_REASONS = ("lang", "len_short", "len_long", "alpha", "kept")


def attrition_reason() -> Column:
    """First-failing-gate label for a documents row — one chained
    CASE, evaluated scan-side inside whole-stage codegen. NULL
    alpha-ratio (empty text) falls to 'alpha' on both faces (CASE
    skips a NULL condition in Spark and DuckDB alike), though
    n_chars < 100 catches every such doc first on honest metadata."""
    ar = TX.alpha_ratio("text")
    return (
        F.when(F.col("lang") != _ATTR_LANG, F.lit("lang"))
        .when(F.col("n_chars") < _ATTR_MIN_CHARS, F.lit("len_short"))
        .when(F.col("n_chars") > _ATTR_MAX_CHARS, F.lit("len_long"))
        .when(ar >= _ATTR_MIN_ALPHA, F.lit("kept"))
        .otherwise(F.lit("alpha"))
    )


def attrition_counters(df: DataFrame) -> DataFrame:
    """Per-(source, reason) LINEAR counters over any documents-shaped
    frame: (source, reason, n_docs, n_tokens). Both columns are sums —
    commutative, associative, mergeable across shards and
    micro-batches — so the SAME agg serves the batch face (q149) and
    complete-mode streaming state (q150, the q143/q144 twin
    discipline): state is |sources| x |reasons| rows (<= 5 per
    source), constant at any ingest volume. The reason label and the
    token count are scan-side projections; the agg collapses map-side
    before its one tiny exchange."""
    return (
        df.select(
            "source",
            attrition_reason().alias("reason"),
            F.coalesce(TX.bpe_token_count(F.col("text")), F.lit(0)).alias("tk"),
        )
        .groupBy("source", "reason")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("tk").cast("long").alias("n_tokens"),
        )
    )


def attrition_finalize(counters: DataFrame) -> DataFrame:
    """Finalize the ledger from the counter table ALONE (batch-built
    or drained from streaming state): per-source doc shares derive
    from the counters, so the tiny state fully determines the report.
    The share window sorts a <= 5*|sources|-row frame."""
    per_src = Window.partitionBy("source")
    return counters.select(
        "source",
        "reason",
        "n_docs",
        "n_tokens",
        F.expr("1000 * n_docs").cast("long").alias("_num"),
        F.sum("n_docs").over(per_src).cast("long").alias("_den"),
    ).select(
        "source",
        "reason",
        "n_docs",
        "n_tokens",
        F.expr("_num div _den").cast("long").alias("share_milli"),
    ).orderBy("source", "reason")


# Shared verbatim by q149 and its streaming twin q150.
ATTRITION_ORACLE = f"""
        WITH lab AS (
            SELECT source,
                   CASE
                     WHEN lang <> '{_ATTR_LANG}' THEN 'lang'
                     WHEN n_chars < {_ATTR_MIN_CHARS} THEN 'len_short'
                     WHEN n_chars > {_ATTR_MAX_CHARS} THEN 'len_long'
                     WHEN CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g'))
                               AS DOUBLE) / nullif(length(text), 0)
                          >= {_ATTR_MIN_ALPHA} THEN 'kept'
                     ELSE 'alpha'
                   END AS reason,
                   coalesce(len(regexp_extract_all(text, '\\w+|[^\\w\\s]')), 0) AS tk
            FROM documents
        ),
        c AS (
            SELECT source, reason,
                   CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(sum(tk) AS BIGINT) AS n_tokens
            FROM lab GROUP BY source, reason
        )
        SELECT source, reason, n_docs, n_tokens,
               CAST(1000 * n_docs
                    // sum(n_docs) OVER (PARTITION BY source)
                    AS BIGINT) AS share_milli
        FROM c ORDER BY source, reason
    """


@query(
    "q149_attrition_ledger",
    oracle=ATTRITION_ORACLE,
    description="Corpus attrition ledger: q30's exact gate chain "
    "(lang -> length -> alpha-ratio) with FIRST-failure attribution "
    "per document, rolled up to per-(source, reason) doc/token counts "
    "and per-source shares (milli) — the Dolma/RefinedWeb-style "
    "attrition table that answers 'why did my document disappear'; "
    "first-failure makes the reasons a PARTITION of the corpus, so "
    "each row is exactly the docs recovered by relaxing that gate "
    "(sum(kept) == |q30| pinned by test; q120 is the one-dimension "
    "ablation face)",
    tags=("llm", "curation", "audit"),
)
def q149_attrition_ledger(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale shape: label + token count are one scan-side codegen
    pass; the (source, reason) agg map-side combines to <= 5 rows per
    source per task before its exchange; the share window and sort
    touch only the <= 5*|sources|-row ledger. The corpus crosses ONE
    exchange — the same cheapest-in-catalog class as q143. Budget
    pinned (tests/test_plan_shapes.py::test_round14_exchange_budgets)."""
    docs = load_table(spark, sf_dir, "documents")
    return attrition_finalize(attrition_counters(docs))
