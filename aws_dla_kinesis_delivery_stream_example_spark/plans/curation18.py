"""Round-15 second batch: encoding/mojibake repair audit (q153).

Dolma's UTF-8 cleanup (and every production crawl pipeline since C4)
repairs DOUBLE-ENCODED text: a UTF-8 document mis-decoded as cp1252
and re-encoded turns 'e-acute' into the two-char digraph 'A-tilde
copyright', the right single quote into a three-char sequence, and so
on — the web is full of it, and a tokenizer trained on mojibake burns
vocabulary slots on garbage digraphs. q153 is the audit + repair as
one scan: per-sequence detection counts, a chained literal-replace
repair over a finite mapping table, a residual re-scan REPORTING
convergence (the q143 convention — report, never assume), and
per-source rates on the milli lattice.

The mapping table is GENERATED, not hand-typed: the double-encoded
form of each target character is ``ch.encode('utf-8').
decode('cp1252')`` — the exact corruption being repaired (cp1252, not
ISO-8859-1: real mojibake routes through Windows-1252, whose 0x80-9F
block is printable; every chosen target character round-trips). One
constant feeds the Spark expressions, the DuckDB oracle, the planted
stratum, and the tests — the single-source-of-truth discipline.

Dialect safety (the q127/q143 divergence discipline), and why the
detector is arithmetic rather than regex: non-ASCII characters inside
Java vs RE2 regex character classes are a dialect minefield, so the
per-sequence count is computed EXACTLY in both engines as

    (length(text) - length(replace(text, seq, ''))) / length(seq)

— all literal string ops on codepoint lengths (Spark ``length`` and
DuckDB ``length`` both count codepoints), integer division exact.
The repair is the same finite table applied as chained literal
``replace`` calls; Java's and DuckDB's replace are both left-to-right
non-overlapping scans, so the rewritten text is identical across
engines. No replacement manufactures another map key from its own
output (the 3-char quote sequences share a 2-char prefix but no map
key IS that bare prefix), and the residual column measures, rather
than trusts, that property on real data.

Bench fixture: the synthetic corpus is pure ASCII word salad, so the
catalog face plants a deterministic mojibake stratum AT THE SCAN
(the q143 planted-PII convention): docs with doc_id % 5 == 0 gain a
double-encoded 'cafe' (with e-acute), % 7 == 0 a double-encoded
"don't" (right single quote), % 11 == 0 a double-encoded 'naive'
(i-diaeresis) — overlapping strata, identical integer-arithmetic
plant in both faces. The library pieces (``mojibake_counters`` /
``mojibake_finalize``) take ANY (source, text) frame, so real crawl
text drops in unchanged.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .catalog import query


def double_encode(ch: str) -> str:
    """The corruption q153 repairs: UTF-8 bytes mis-decoded as
    Windows-1252. Exposed for tests and for building real repair
    tables from character lists."""
    return ch.encode("utf-8").decode("cp1252")


# Target characters that dominate real mojibake corpora (all chosen
# to round-trip through cp1252 — 0x81/8D/8F/90/9D never appear in
# their UTF-8 encodings). é e-acute, è e-grave, ü
# u-umlaut, ñ n-tilde, ï i-diaeresis, ’ right single
# quote, “ left double quote.
_MOJIBAKE_CHARS = ("é", "è", "ü", "ñ", "ï", "’", "“")

# (double-encoded sequence, intended character), applied in order —
# though entries are mutually non-manufacturing, so order is not
# load-bearing; the residual column verifies that on data.
MOJIBAKE_MAP: tuple[tuple[str, str], ...] = tuple(
    (double_encode(c), c) for c in _MOJIBAKE_CHARS
)

# Planted-stratum snippets, built from the same constants.
_PLANT_CAFE = " caf" + double_encode("é")
_PLANT_DONT = " don" + double_encode("’") + "t"
_PLANT_NAIVE = " na" + double_encode("ï") + "ve"


def _n_seq(col: Column, seq: str) -> Column:
    """Exact occurrence count of the literal ``seq`` in ``col`` via
    codepoint-length arithmetic — no regex, no dialect risk."""
    return (
        (F.length(col) - F.length(F.replace(col, F.lit(seq), F.lit(""))))
        / F.lit(len(seq))
    ).cast("long")


def mojibake_repair(col: Column) -> Column:
    """Chained literal replace of every map entry, in table order —
    the Dolma-style double-encoding repair as a pure column
    expression (whole-stage codegen, zero Python crossings)."""
    for bad, good in MOJIBAKE_MAP:
        col = F.replace(col, F.lit(bad), F.lit(good))
    return col


def mojibake_counters(df: DataFrame) -> DataFrame:
    """Per-source LINEAR counters over any (source, text) frame:
    (source, n_docs, docs_with_mojibake, n_seq, chars_repaired,
    n_residual). Every column is a sum — commutative, associative,
    mergeable across shards and micro-batches — so the SAME agg
    serves the batch face (q153) and complete-mode streaming state
    (q154, the q143/q144 twin discipline): state is |sources| x 5
    BIGINTs, constant at any ingest volume. Detection, repair, and
    the residual re-scan are one scan-side codegen pass; the agg
    collapses map-side before its one |sources|-row exchange."""
    t = F.col("text")
    n_seq = sum(
        (_n_seq(t, bad) for bad, _ in MOJIBAKE_MAP), F.lit(0).cast("long")
    )
    det = df.select(
        "source",
        n_seq.alias("n_seq"),
        F.length(t).alias("len0"),
        mojibake_repair(t).alias("rep"),
    )
    res = det.select(
        "source",
        "n_seq",
        (F.col("len0") - F.length(F.col("rep"))).cast("long").alias("chars_rep"),
        sum(
            (_n_seq(F.col("rep"), bad) for bad, _ in MOJIBAKE_MAP),
            F.lit(0).cast("long"),
        ).alias("n_res"),
    )
    return res.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum((F.col("n_seq") > 0).cast("long"))
        .cast("long")
        .alias("docs_with_mojibake"),
        F.sum("n_seq").cast("long").alias("n_seq"),
        F.sum("chars_rep").cast("long").alias("chars_repaired"),
        F.sum("n_res").cast("long").alias("n_residual"),
    )


def mojibake_finalize(counters: DataFrame) -> DataFrame:
    """Finalize the audit from the counter table ALONE (batch-built
    or drained from streaming state): the rate derives from counts,
    so the |sources|-row state fully determines the report."""
    return counters.select(
        "source",
        "n_docs",
        "docs_with_mojibake",
        "n_seq",
        "chars_repaired",
        F.expr("1000 * docs_with_mojibake div n_docs")
        .cast("long")
        .alias("mojibake_doc_rate_milli"),
        "n_residual",
    ).orderBy("source")


def mojibake_audit_report(df: DataFrame) -> DataFrame:
    """Per-source mojibake audit of any (source, text) frame: doc and
    sequence counts, repaired-character volume, the mojibake-document
    rate (milli), and the residual count AFTER repair (0 == the
    finite table converged in one pass — true on the bench corpus,
    where any drift fails the hash). One corpus pass, one tiny agg."""
    return mojibake_finalize(mojibake_counters(df))


def _mojibake_augment(docs: DataFrame) -> DataFrame:
    """The deterministic planted mojibake stratum (module docstring):
    doc_id arithmetic + string concat, identical in Spark and DuckDB.
    Applied AT THE SCAN — a projection, no exchange."""
    did = F.col("doc_id")
    cafe = F.when(did % 5 == 0, F.lit(_PLANT_CAFE)).otherwise(F.lit(""))
    dont = F.when(did % 7 == 0, F.lit(_PLANT_DONT)).otherwise(F.lit(""))
    naive = F.when(did % 11 == 0, F.lit(_PLANT_NAIVE)).otherwise(F.lit(""))
    return docs.select(
        "doc_id",
        "source",
        F.concat(F.col("text"), cafe, dont, naive).alias("text"),
    )


def _seq_count_sql(col: str, seq: str) -> str:
    return (
        f"(length({col}) - length(replace({col}, '{seq}', '')))"
        f" // {len(seq)}"
    )


def _repair_sql(col: str) -> str:
    sql = col
    for bad, good in MOJIBAKE_MAP:
        sql = f"replace({sql}, '{bad}', '{good}')"
    return sql


_NSEQ_SQL = " + ".join(_seq_count_sql("text", bad) for bad, _ in MOJIBAKE_MAP)
_NRES_SQL = " + ".join(_seq_count_sql("rep", bad) for bad, _ in MOJIBAKE_MAP)

# Shared verbatim by q153 and its streaming twin q154 (the PII_ORACLE
# convention): the stream's counter state must finalize to the
# identical report row-for-row. Every non-ASCII literal below is
# GENERATED from MOJIBAKE_MAP/_PLANT_* — one source of truth.
MOJIBAKE_ORACLE = f"""
        WITH aug AS (
            SELECT source,
                   text
                   || CASE WHEN doc_id % 5 = 0
                           THEN '{_PLANT_CAFE}' ELSE '' END
                   || CASE WHEN doc_id % 7 = 0
                           THEN '{_PLANT_DONT}' ELSE '' END
                   || CASE WHEN doc_id % 11 = 0
                           THEN '{_PLANT_NAIVE}' ELSE '' END AS text
            FROM documents
        ),
        det AS (
            SELECT source,
                   CAST({_NSEQ_SQL} AS BIGINT) AS n_seq,
                   length(text) AS len0,
                   {_repair_sql("text")} AS rep
            FROM aug
        ),
        res AS (
            SELECT source, n_seq,
                   CAST(len0 - length(rep) AS BIGINT) AS chars_rep,
                   CAST({_NRES_SQL} AS BIGINT) AS n_res
            FROM det
        )
        SELECT source,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(CASE WHEN n_seq > 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS docs_with_mojibake,
               CAST(sum(n_seq) AS BIGINT) AS n_seq,
               CAST(sum(chars_rep) AS BIGINT) AS chars_repaired,
               CAST(1000 * sum(CASE WHEN n_seq > 0 THEN 1 ELSE 0 END)
                    // count(*) AS BIGINT) AS mojibake_doc_rate_milli,
               CAST(sum(n_res) AS BIGINT) AS n_residual
        FROM res GROUP BY source ORDER BY source
    """


@query(
    "q153_mojibake_audit",
    oracle=MOJIBAKE_ORACLE,
    description="Encoding/mojibake repair audit: Dolma-style "
    "double-encoded-UTF-8 cleanup as a first-class report — a finite "
    "GENERATED repair table (utf8-bytes-misread-as-cp1252 -> intended "
    "char) applied as chained LITERAL replaces (left-to-right "
    "non-overlapping in Java and DuckDB alike — no regex, no "
    "unicode-class dialect risk), per-sequence detection counts via "
    "exact codepoint-length arithmetic, repaired-character volume, "
    "per-source rates (milli), and a residual re-scan REPORTING "
    "one-pass convergence (the q143 convention); bench corpus is "
    "pure ASCII, so a deterministic doc_id-keyed mojibake stratum is "
    "planted at the scan, identically in both faces",
    tags=("llm", "curation", "text"),
)
def q153_mojibake_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale shape: plant (a projection), detect (length arithmetic),
    repair (chained literal replaces), and the residual re-scan are
    ALL one scan-side whole-stage-codegen pass over the corpus — zero
    Python crossings, zero corpus-sized exchanges; the only exchanges
    are the |sources|-row agg + final sort (the q143/q149
    cheapest-in-catalog class). At 100 TB the repaired-text REWRITE
    (persisting ``rep`` next to the audit) rides the same pass when
    run as a materialization job. Budget pinned
    (tests/test_plan_shapes.py::test_round15b_exchange_budgets)."""
    docs = load_table(spark, sf_dir, "documents")
    return mojibake_audit_report(_mojibake_augment(docs))
