"""Round-16 second batch: CCNet-style perplexity-bucket filtering
(q157) + its streaming twin (q158).

CCNet (and every LM-data pipeline since) buckets crawl documents into
head/middle/tail by the perplexity of a small reference language
model, then keeps head (or head+middle) — the quality gate that runs
BEFORE expensive dedup.  The engine's version replaces the KenLM
5-gram with a UNIGRAM SURPRISAL model whose every quantity is
integer-exact in both engines (the q37/q127 dialect-safety
discipline — no floating log anywhere):

- reference model: token -> count over a designated reference stratum
  (the catalog face uses ``source = 'src0'``; the library takes any
  reference frame — CCNet uses Wikipedia);
- token surprisal (integer, ~log2(N/cnt)): ``bitlen(N) - bitlen(cnt)``
  where ``bitlen(x) = length(bin(x))`` — the binary-digit count, exact
  and identical in Spark (`length(bin(x))`) and DuckDB (same spelling);
  out-of-vocabulary tokens score ``bitlen(N) + 1``, strictly above
  every in-vocabulary token;
- per-doc score on the milli lattice: ``m = 1000 * sum(s) div n_tok``;
- bucket thresholds are a property of the MODEL, not the corpus (the
  CCNet discipline — thresholds fixed at training time, which is also
  what makes the streaming twin's labels static): ``g`` = the
  reference's own mean surprisal, ``1000 * sum(cnt * s) div N`` over
  the vocabulary; head: ``20 * m <= 19 * g`` (5% under the reference
  mean), tail: ``10 * m >= 11 * g`` (10% over), else middle — all
  cross-multiplied integer comparisons, no division.

Bench fixture: the synthetic corpus is near-uniform word salad (31
tokens, counts within one bit of each other), so natural docs sit in
a tight +-8% band around ``g`` — real head/tail mass must be planted
(the q143/q151/q153/q155 convention), doc_id arithmetic identical in
both engines: doc_id % 11 == 0 docs append 25 copies of the planted
common token ``hd`` (its reference count comes from the plant itself
— src0's % 11 docs — making its surprisal low), and doc_id % 9 == 0
docs append 8 DISTINCT near-OOV tokens ``zq<doc_id>a..h`` (each
appears at most once in the reference, scoring at or above
bitlen(N) - 1).  Measured bucket mass: head 26/35/404, tail 51/47/527
docs at sf0.001/0.01/0.1 — every bucket non-vacuous at every SF, with
both plants also exercising the boundary (high-m docs stay middle).

Model scalars (N, g) ride as python ints from a bounded 1-row collect
(the q75/q148 convention — a trained LM's constants, not data), the
vocabulary stays a distributed frame.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import text as TX
from ..operators.staging import stage
from ..sources.tables import load_table
from .catalog import query

# Reference stratum of the catalog face (library: any frame).
PPL_REF_SOURCE = "src0"
# Head/tail thresholds relative to the reference mean surprisal g
# (milli): head 20*m <= 19*g, tail 10*m >= 11*g.
_HEAD_NUM, _HEAD_DEN = 19, 20
_TAIL_NUM, _TAIL_DEN = 11, 10
_HEAD_COPIES = 25  # planted 'hd' tokens per head-stratum doc


def _bitlen(col: Column) -> Column:
    """Integer floor(log2(x)) + 1 via binary-digit count — exact and
    identical in Spark and DuckDB (`length(bin(x))`)."""
    return F.length(F.bin(col))


def _ppl_augment(docs: DataFrame) -> DataFrame:
    """The deterministic planted head/tail strata (module docstring):
    doc_id arithmetic + string concat, identical in Spark and DuckDB.
    Applied AT THE SCAN — a projection, no exchange."""
    did = F.col("doc_id")
    head = F.when(
        did % 11 == 0,
        F.concat(F.lit(" "), F.repeat(F.lit("hd "), _HEAD_COPIES)),
    ).otherwise(F.lit(""))
    zq = F.concat(
        *[
            F.concat(F.lit(" zq"), did.cast("string"), F.lit(c))
            for c in "abcdefgh"
        ]
    )
    tail = F.when(did % 9 == 0, zq).otherwise(F.lit(""))
    return docs.select(
        "doc_id", "source", F.concat(F.col("text"), head, tail).alias("text")
    )


def _tokens(df: DataFrame) -> DataFrame:
    """(doc_id, source, tok) — one row per token occurrence; scan-side
    narrow (lower + regex extract + explode, zero Python crossings)."""
    return df.select(
        "doc_id", "source", F.explode(TX.words("text")).alias("tok")
    )


def surprisal_model(ref_docs: DataFrame) -> tuple[DataFrame, int, int]:
    """Train the unigram surprisal model on any (doc_id, source, text)
    reference frame: returns (vocab, n_ref, g) where vocab is the
    DISTRIBUTED (tok, cnt) frame and n_ref / g are the model's two
    scalar constants (total reference tokens; the reference's own mean
    surprisal, milli) — a bounded 1-row collect, the q75 convention:
    these are the trained LM's parameters, fixed before the corpus
    pass, which is exactly what lets the streaming twin label records
    at ingest with no corpus-wide second pass.

    Scale shape: the (tok, cnt) agg map-side combines per token before
    its one exchange, and Zipf bounds the vocabulary at ~1e5-1e6 rows
    per language at ANY corpus size (the q147 argument); g folds the
    vocab frame itself (sum(cnt * s) — reduce-before-multiply keeps
    every product under bitlen(N) * N, int64-safe to ~2e17 reference
    tokens)."""
    vocab = stage(
        _tokens(ref_docs).groupBy("tok").agg(
            F.count(F.lit(1)).cast("long").alias("cnt")
        )
    )
    # ONE agg job for both scalars (round-16 review): the g numerator
    # sum(cnt * (bitlen(N) - bitlen(cnt))) = bitlen(N) * sum(cnt)
    # - sum(cnt * bitlen(cnt)), and both sums are independent of N.
    row = vocab.agg(
        F.sum("cnt").cast("long").alias("n_ref"),
        F.sum(F.col("cnt") * _bitlen("cnt")).cast("long").alias("wbits"),
    ).collect()[0]
    n_ref = int(row["n_ref"] or 0)
    if n_ref <= 0:
        raise ValueError("surprisal_model: empty reference corpus")
    g = 1000 * (n_ref.bit_length() * n_ref - int(row["wbits"])) // n_ref
    return vocab, n_ref, g


def ppl_counters(
    docs: DataFrame, vocab: DataFrame, n_ref: int
) -> DataFrame:
    """Per-document surprisal accumulators over any (doc_id, source,
    text) frame: (doc_id, source, n_tok, sum_s).  Tokenize + the
    LEFT join to the vocabulary are stateless (in streaming: a
    stream-static join — the model is the static dim, the q151
    blocklist pattern), and the single groupBy(doc_id) agg is
    streamable (count/sum/min — mergeable across shards and
    micro-batches), so the SAME function serves the batch face and
    complete-mode streaming state (q158).  HONEST state note: state
    is per-DOCUMENT (2 BIGINTs + source each) — the q145/q91 per-key
    family, growing with ingested documents, not |sources|; the
    constants n_ref (and g at finalize) are the static model's.

    Docs whose text has zero tokens contribute no rows (no token, no
    score) — the same library caveat as q156's counter face."""
    bl_n = len(bin(n_ref)) - 2  # python bitlen of the static scalar
    s = F.when(
        F.col("cnt").isNull(), F.lit(bl_n + 1).cast("long")
    ).otherwise(F.lit(bl_n) - _bitlen("cnt")).cast("long")
    scored = _tokens(docs).join(vocab, "tok", "left").select(
        "doc_id", "source", s.alias("s")
    )
    return scored.groupBy("doc_id").agg(
        F.min("source").alias("source"),
        F.count(F.lit(1)).cast("long").alias("n_tok"),
        F.sum("s").cast("long").alias("sum_s"),
    )


def bucket_expr(m: Column, g: int) -> Column:
    """head / middle / tail against the model constant g — integer
    cross-multiplications, no division."""
    return (
        F.when(F.lit(_HEAD_DEN) * m <= F.lit(_HEAD_NUM * g), F.lit("head"))
        .when(F.lit(_TAIL_DEN) * m >= F.lit(_TAIL_NUM * g), F.lit("tail"))
        .otherwise(F.lit("middle"))
    )


def labeled_rollup(
    counters: DataFrame,
    label_of,
    label_name: str,
    score_col: str = "sum_s",
) -> DataFrame:
    """Shared finalize for every per-doc counter family (q157/q158
    surprisal, q159/q160 bigram, q161/q162 classifier): from the
    (doc_id, source, n_tok, <score_col>) counter table ALONE —
    batch-built or drained from streaming state — label each doc by
    ``label_of(m)`` over the milli mean ``m = 1000 * score div
    n_tok`` and report per (source, label) doc/token counts plus the
    per-source doc share (milli).  The drained state fully
    determines the report, which is what lets each batch/streaming
    twin pair share this finalize AND one verbatim oracle."""
    c = stage(counters)  # feeds the rollup AND the per-source totals
    lab = c.select(
        "source",
        "n_tok",
        label_of(
            F.expr(f"1000 * {score_col} div n_tok").cast("long")
        ).alias(label_name),
    )
    rollup = lab.groupBy("source", label_name).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_tok").cast("long").alias("n_tokens"),
    )
    # renamed join key: rollup and totals share the staged counter
    # frame's lineage, and on a DRAINED memory-sink table the two
    # branches carry identical attribute ids — the q152/q156
    # disambiguation trap (curation17.py:180-186)
    totals = c.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("src_docs")
    ).select(F.col("source").alias("t_source"), "src_docs")
    return (
        rollup.join(totals, F.col("source") == F.col("t_source"))
        .select(
            "source",
            label_name,
            "n_docs",
            "n_tokens",
            F.expr("1000 * n_docs div src_docs")
            .cast("long")
            .alias("doc_share_milli"),
        )
        .orderBy("source", label_name)
    )


def ppl_finalize(counters: DataFrame, g: int) -> DataFrame:
    """The bucket report from the per-doc counter table ALONE
    (batch-built or drained from streaming state) plus the model
    constant g — q157/q158's face of :func:`labeled_rollup`, shared
    verbatim by the bigram pair q159/q160."""
    return labeled_rollup(counters, lambda m: bucket_expr(m, g), "bucket")


def perplexity_bucket_report(
    docs: DataFrame, ref_docs: DataFrame
) -> DataFrame:
    """End-to-end library mode: train the surprisal model on
    ``ref_docs``, score and bucket ``docs``, report per (source,
    bucket).  Any two frames; the catalog face passes the planted
    corpus and its src0 stratum."""
    vocab, n_ref, g = surprisal_model(ref_docs)
    return ppl_finalize(ppl_counters(docs, vocab, n_ref), g)


# --- DuckDB oracle, generated from the SAME constants.  Shared
# VERBATIM by q157 and q158 (the drained per-doc state determines
# every output column, so the twins are identical-output twins).

_ZQ_SQL = " || ".join(
    f"' zq' || CAST(doc_id AS VARCHAR) || '{c}'" for c in "abcdefgh"
)

PPL_ORACLE = f"""
        WITH aug AS (
            SELECT doc_id, source,
                   text
                   || CASE WHEN doc_id % 11 = 0
                           THEN ' ' || repeat('hd ', {_HEAD_COPIES})
                           ELSE '' END
                   || CASE WHEN doc_id % 9 = 0
                           THEN {_ZQ_SQL} ELSE '' END AS text
            FROM documents
        ),
        toks AS (
            SELECT doc_id, source,
                   unnest(regexp_extract_all(lower(text), '[a-z0-9]+'))
                       AS tok
            FROM aug
        ),
        ref AS (
            SELECT tok, CAST(count(*) AS BIGINT) AS cnt
            FROM toks WHERE source = '{PPL_REF_SOURCE}' GROUP BY tok
        ),
        n AS (SELECT CAST(sum(cnt) AS BIGINT) AS nref FROM ref),
        g AS (
            SELECT CAST(1000 * sum(cnt * (length(bin(n.nref))
                                          - length(bin(cnt))))
                        // n.nref AS BIGINT) AS g
            FROM ref CROSS JOIN n GROUP BY n.nref
        ),
        scored AS (
            SELECT t.doc_id, t.source,
                   CASE WHEN r.cnt IS NULL
                        THEN length(bin(n.nref)) + 1
                        ELSE length(bin(n.nref)) - length(bin(r.cnt))
                   END AS s
            FROM toks t LEFT JOIN ref r USING (tok) CROSS JOIN n
        ),
        docm AS (
            SELECT doc_id, source,
                   CAST(count(*) AS BIGINT) AS n_tok,
                   CAST(1000 * sum(s) // count(*) AS BIGINT) AS m
            FROM scored GROUP BY doc_id, source
        ),
        lab AS (
            SELECT source, n_tok,
                   CASE WHEN {_HEAD_DEN} * m <= {_HEAD_NUM} * (SELECT g FROM g)
                        THEN 'head'
                        WHEN {_TAIL_DEN} * m >= {_TAIL_NUM} * (SELECT g FROM g)
                        THEN 'tail'
                        ELSE 'middle' END AS bucket
            FROM docm
        ),
        tot AS (
            SELECT source, CAST(count(*) AS BIGINT) AS src_docs
            FROM docm GROUP BY source
        )
        SELECT l.source, l.bucket,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(l.n_tok) AS BIGINT) AS n_tokens,
               CAST(1000 * count(*) // t.src_docs AS BIGINT)
                   AS doc_share_milli
        FROM lab l JOIN tot t ON l.source = t.source
        GROUP BY l.source, l.bucket, t.src_docs
        ORDER BY l.source, l.bucket
    """


@query(
    "q157_perplexity_buckets",
    oracle=PPL_ORACLE,
    description="CCNet-style perplexity-bucket audit: a unigram "
    "surprisal model trained on a reference stratum (src0 here; any "
    "frame in library mode — CCNet uses Wikipedia), every quantity "
    "integer-exact in both engines (surprisal = bitlen(N)-bitlen(cnt) "
    "via binary-digit counts, OOV = bitlen(N)+1, per-doc mean on the "
    "milli lattice), head/middle/tail buckets against the MODEL's own "
    "mean surprisal g with cross-multiplied thresholds (head -5%, "
    "tail +10%) — fixed at training time, the property that lets the "
    "streaming twin label at ingest; per-(source, bucket) doc/token "
    "counts and per-source doc shares (milli); head/tail strata "
    "planted deterministically at the scan (near-uniform bench vocab "
    "puts natural docs in a tight middle band)",
    tags=("llm", "curation", "quality", "text"),
)
def q157_perplexity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale shape: (1) the vocabulary agg map-side combines per token
    before its one exchange and is Zipf-bounded (~1e5-1e6 rows per
    language at ANY corpus size — the q147 argument); (2) the corpus
    scoring pass is tokenize (narrow) + ONE left join against the
    vocab, UNHINTED — AQE broadcasts the Zipf-bounded build side at
    any scale; (3) the per-doc agg exchanges once on doc_id; (4) the
    report rollup + per-source totals reuse the staged counter frame
    and exchange |sources|-scale rows.  Model scalars (N, g) are a
    bounded 1-row collect (the trained LM's constants, the q75
    convention).  Budget pinned
    (tests/test_plan_shapes.py::test_round16b_exchange_budgets)."""
    docs = _ppl_augment(load_table(spark, sf_dir, "documents"))
    ref = docs.filter(F.col("source") == PPL_REF_SOURCE)
    return perplexity_bucket_report(docs, ref)
