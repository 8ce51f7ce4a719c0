"""Round-14 batch additions: PII detection / redaction audit (q143).

Every production pretraining pipeline runs a PII pass before training
(Gopher scrubs emails/phones in §A.1.1-style cleanup; C4 drops
blocklisted pages; the reference pipeline's transform stage —
``kds_example`` record transformer, see ``streaming/transform.py`` —
is exactly where such a scrub sits in flight). The catalog's q61 is
the primitive redaction (multi-digit runs -> <NUM>); q143 is the
first-class audit: three scan-side detectors (email / NANP phone /
IPv4 — all JVM ``regexp_extract_all``, zero Python crossings),
per-doc match counts, a chained redaction rewrite, a residual
re-scan PROVING the rewrite converged, and per-source rates on the
integer milli lattice.

Bench fixture: the synthetic corpus carries no organic PII (pure
word salad), so the catalog face plants a deterministic PII stratum
AT THE SCAN — doc_id arithmetic + string concat, reproducible in any
engine: docs with doc_id % 7 == 0 gain an email, % 11 == 0 a NANP
phone, % 13 == 0 an IPv4 (overlapping strata — doc 0 carries all
three). The detector/redactor core (``pii_audit_report``,
``pii_redact``) takes ANY (source, text) frame; the planted test
drives it on hand-written PII with ids outside every stratum, so the
augmentation is the identity there.

Regex dialect (the q127 divergence discipline): patterns are
restricted to the Java-regex / DuckDB-RE2 COMMON SUBSET — character
classes, bounded repetition, ``\\b`` word boundaries, literal
escapes; no backreferences, no lookaround (RE2 has neither).
Spark-side patterns go through ``F.lit()`` / Python-string args,
never SQL string literals, so backslash handling cannot diverge.
Two behaviors documented rather than "fixed": DuckDB's
``regexp_replace`` needs the explicit ``'g'`` flag to match Spark's
replace-all; and the IPv4 detector accepts octets up to 999 (no
<=255 range check — standard scrubber practice: over-redaction is
the safe direction, and a range check needs alternation both
dialects support but real scrubbers skip).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .catalog import query

# Detector patterns — Java/RE2 common subset ONLY (module docstring).
_PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PII_PHONE = r"\(\d{3}\) \d{3}-\d{4}"
_PII_IP = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"

# Redaction order is load-bearing and fixed: emails first (their
# local parts may contain digits/dots the narrower detectors could
# partially eat), then phones, then IPs. Sentinels contain no digits,
# so no rewrite can manufacture a new match — the residual re-scan
# asserts exactly that.
PII_KINDS: tuple[tuple[str, str, str], ...] = (
    ("email", _PII_EMAIL, "[EMAIL]"),
    ("phone", _PII_PHONE, "[PHONE]"),
    ("ip", _PII_IP, "[IP]"),
)


def _n_matches(col: Column, pat: str) -> Column:
    """Match count of ``pat`` in ``col`` — JVM-side, codegen'd."""
    return F.size(F.regexp_extract_all(col, F.lit(pat), F.lit(0))).cast("long")


def pii_redact(col: Column) -> Column:
    """Chained replace-all of every detector, in PII_KINDS order.

    Two deliberate design properties make the single pass robust
    (both planted-tested):

    1. Sentinels are digit-free and BRACKET-DELIMITED: '[' / ']'
       belong to no detector's character set, so no residual match
       can cross, absorb, or abut a sentinel — e.g. 'a@b.co@x.co'
       rewrites to '[EMAIL]@x.co', where the ']' against the second
       '@' stops the sentinel's letters (legal local-part chars on
       their own!) from seeding a fresh email.
    2. The only boundary-sensitive detector (IPv4's ``\\b``) is
       redacted LAST, so a boundary CREATED by an earlier rewrite is
       caught within the same pass — 'x@y.co1.2.3.4' detects 0 IPs
       (the 'o' suppresses the boundary) yet converges to
       '[EMAIL][IP]' in one pass: the email rewrite's ']' exposes the
       IP to the later redaction stage. Detection counts and the
       rewrite legitimately disagree there; the audit records both.

    The residual column REPORTS convergence rather than assuming it
    (pinned 0 on bench + planted corpora; both faces compute it from
    the same rewritten text, so any detector/redactor drift fails the
    bench hash). Redaction is idempotent on its own output — pinned
    by the double-redaction test."""
    for _, pat, repl in PII_KINDS:
        col = F.regexp_replace(col, pat, repl)
    return col


def pii_counters(df: DataFrame) -> DataFrame:
    """Per-source LINEAR counters over any (source, text) frame:
    (source, n_docs, docs_with_pii, n_email, n_phone, n_ip,
    n_residual). Every column is a sum/count — commutative,
    associative, mergeable across shards and micro-batches — so the
    SAME agg serves the batch face (q143) and complete-mode streaming
    state (q144, the q133/q134 / q140/q141 twin discipline): state is
    |sources| x 6 BIGINTs, constant at any ingest volume. Detectors
    and the redaction rewrite are scan-side projections inside
    whole-stage codegen; the agg collapses map-side before its one
    |sources|-row exchange."""
    det = df.select(
        "source",
        _n_matches(F.col("text"), _PII_EMAIL).alias("n_email"),
        _n_matches(F.col("text"), _PII_PHONE).alias("n_phone"),
        _n_matches(F.col("text"), _PII_IP).alias("n_ip"),
        pii_redact(F.col("text")).alias("red"),
    )
    res = det.select(
        "source",
        "n_email",
        "n_phone",
        "n_ip",
        (
            _n_matches(F.col("red"), _PII_EMAIL)
            + _n_matches(F.col("red"), _PII_PHONE)
            + _n_matches(F.col("red"), _PII_IP)
        )
        .cast("long")
        .alias("n_res"),
    )
    return res.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(
            ((F.col("n_email") + F.col("n_phone") + F.col("n_ip")) > 0).cast(
                "long"
            )
        )
        .cast("long")
        .alias("docs_with_pii"),
        F.sum("n_email").cast("long").alias("n_email"),
        F.sum("n_phone").cast("long").alias("n_phone"),
        F.sum("n_ip").cast("long").alias("n_ip"),
        F.sum("n_res").cast("long").alias("n_residual"),
    )


def pii_finalize(counters: DataFrame) -> DataFrame:
    """Finalize the audit from the counter table ALONE (batch-built or
    drained from streaming state): the rate is derived from counts, so
    the |sources|-row state fully determines the report."""
    return counters.select(
        "source",
        "n_docs",
        "docs_with_pii",
        "n_email",
        "n_phone",
        "n_ip",
        F.expr("1000 * docs_with_pii div n_docs")
        .cast("long")
        .alias("pii_doc_rate_milli"),
        "n_residual",
    ).orderBy("source")


def pii_audit_report(df: DataFrame) -> DataFrame:
    """Per-source PII audit of any (source, text) frame: doc and
    match counts per detector, the PII-document rate (milli), and the
    residual match count AFTER redaction (0 == the rewrite converged
    in one pass — true on the bench corpus, where any drift fails the
    hash; nonzero on adversarial boundary-glued text, the documented
    ``pii_redact`` unmasking edge the audit REPORTS rather than
    hides). One corpus pass, one tiny agg (``pii_counters``) + the
    finalize projection."""
    return pii_finalize(pii_counters(df))


def _pii_augment(docs: DataFrame) -> DataFrame:
    """The deterministic planted-PII stratum (module docstring):
    integer arithmetic on doc_id + string concat, identical in Spark
    and DuckDB. Applied AT THE SCAN — a projection, no exchange."""
    did = F.col("doc_id")
    email = F.when(
        did % 7 == 0,
        F.concat(
            F.lit(" reach user"), did.cast("string"), F.lit("@example.com")
        ),
    ).otherwise(F.lit(""))
    phone = F.when(
        did % 11 == 0,
        F.concat(
            F.lit(" call (555) "),
            (did % 900 + 100).cast("string"),
            F.lit("-"),
            (did % 9000 + 1000).cast("string"),
        ),
    ).otherwise(F.lit(""))
    ip = F.when(
        did % 13 == 0,
        F.concat(
            F.lit(" from 10."),
            (did % 256).cast("string"),
            F.lit("."),
            F.expr("doc_id div 7 % 256").cast("string"),
            F.lit("."),
            (did % 254 + 1).cast("string"),
        ),
    ).otherwise(F.lit(""))
    return docs.select(
        "doc_id",
        "source",
        F.concat(F.col("text"), email, phone, ip).alias("text"),
    )


# Shared verbatim by q143 and its streaming twin q144 (the
# HIST_ORACLE / DSIR_ORACLE convention): the stream's counter state
# must finalize to the identical report row-for-row.
PII_ORACLE = f"""
        WITH aug AS (
            SELECT doc_id, source,
                   text
                   || CASE WHEN doc_id % 7 = 0
                           THEN ' reach user' || doc_id || '@example.com'
                           ELSE '' END
                   || CASE WHEN doc_id % 11 = 0
                           THEN ' call (555) ' || (doc_id % 900 + 100)
                                || '-' || (doc_id % 9000 + 1000)
                           ELSE '' END
                   || CASE WHEN doc_id % 13 = 0
                           THEN ' from 10.' || (doc_id % 256)
                                || '.' || (doc_id // 7 % 256)
                                || '.' || (doc_id % 254 + 1)
                           ELSE '' END AS text
            FROM documents
        ),
        det AS (
            SELECT source,
                   CAST(len(regexp_extract_all(text, '{_PII_EMAIL}')) AS BIGINT) AS n_email,
                   CAST(len(regexp_extract_all(text, '{_PII_PHONE}')) AS BIGINT) AS n_phone,
                   CAST(len(regexp_extract_all(text, '{_PII_IP}')) AS BIGINT) AS n_ip,
                   regexp_replace(regexp_replace(regexp_replace(text,
                       '{_PII_EMAIL}', '[EMAIL]', 'g'),
                       '{_PII_PHONE}', '[PHONE]', 'g'),
                       '{_PII_IP}', '[IP]', 'g') AS red
            FROM aug
        ),
        res AS (
            SELECT source, n_email, n_phone, n_ip,
                   CAST(len(regexp_extract_all(red, '{_PII_EMAIL}'))
                      + len(regexp_extract_all(red, '{_PII_PHONE}'))
                      + len(regexp_extract_all(red, '{_PII_IP}')) AS BIGINT) AS n_res
            FROM det
        )
        SELECT source,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(CASE WHEN n_email + n_phone + n_ip > 0
                             THEN 1 ELSE 0 END) AS BIGINT) AS docs_with_pii,
               CAST(sum(n_email) AS BIGINT) AS n_email,
               CAST(sum(n_phone) AS BIGINT) AS n_phone,
               CAST(sum(n_ip) AS BIGINT) AS n_ip,
               CAST(1000 * sum(CASE WHEN n_email + n_phone + n_ip > 0
                                    THEN 1 ELSE 0 END)
                    // count(*) AS BIGINT) AS pii_doc_rate_milli,
               CAST(sum(n_res) AS BIGINT) AS n_residual
        FROM res GROUP BY source ORDER BY source
    """


@query(
    "q143_pii_audit",
    oracle=PII_ORACLE,
    description="PII detection/redaction audit: email + NANP-phone + "
    "IPv4 detectors (JVM regexp, Java/RE2 common-subset patterns), "
    "per-source doc and match counts, PII-document rate (milli), and "
    "a residual re-scan after the chained [EMAIL]/[PHONE]/[IP] "
    "rewrite REPORTING whether redaction converged (0 on the bench "
    "corpus; the adversarial boundary-unmasking edge is documented "
    "and planted-tested) — the first-class scrub stage every "
    "pretraining pipeline runs (q61 is the digit-run primitive); "
    "bench corpus carries no organic PII, so a deterministic "
    "doc_id-keyed PII stratum is planted at the scan, identically in "
    "both faces",
    tags=("llm", "curation", "text"),
)
def q143_pii_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale shape: plant (a projection), detect (3 regexp counts),
    redact (3 chained regexp_replace), residual re-scan (3 more
    counts) are ALL one scan-side whole-stage-codegen pass over the
    corpus — zero Python crossings, zero corpus-sized exchanges; the
    only exchanges are the |sources|-row agg + final sort. At 100 TB
    this is the cheapest query class in the catalog: one pass, one
    tiny agg — the redacted-text REWRITE (persisting ``red`` next to
    the audit) rides the same pass when run as a materialization job."""
    docs = load_table(spark, sf_dir, "documents")
    return pii_audit_report(_pii_augment(docs))
