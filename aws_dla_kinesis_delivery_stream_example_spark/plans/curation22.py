"""Round-17 second batch: Naive-Bayes log-likelihood-ratio quality
classifier (q161) + its streaming twin (q162) — the DCLM/fastText
direction.

Modern curation pipelines pair the LM-perplexity filter (q157/q159)
with a DISCRIMINATIVE quality classifier: CCNet trains a fastText
model to separate Wikipedia from raw crawl, DCLM's strongest single
lever is a fastText classifier over curated positives, Llama-style
pipelines do the same.  At its core every one of these is a linear
model over token features whose weight is a log-likelihood ratio
between a positive (curated) and a negative (background) class — the
Naive-Bayes view.  The engine's version keeps that core and makes
every quantity integer-exact in both engines (the q157/q159 bitlen
lattice — no floating log anywhere):

- two class models from one tokenize pass each: token -> count over
  the positive stratum (catalog face: ``source = 'src0'``, the
  curated side) and over the negative stratum (everything else);
- per-token weight = the surprisal DIFFERENCE ``s_neg(tok) -
  s_pos(tok)`` (monotone in log p_pos(tok) - log p_neg(tok)), with
  each side's surprisal exactly q157's: ``bitlen(N) - bitlen(cnt)``
  in-vocabulary, ``bitlen(N) + 1`` out-of-vocabulary;
- the weight is SHIFTED by the training-time constant ``shift =
  bitlen(N_pos) + 1`` (the most negative raw weight), so every
  stored weight is >= 0 and every downstream division operates on
  non-negative integers — Spark's ``div`` truncates toward zero
  while DuckDB's ``//`` floors, so negative-operand division is the
  one genuinely dialect-UNSAFE integer op and the lattice simply
  never performs one;
- per-doc score: ``m = 1000 * sum(w) div n_tok`` (milli mean weight);
- the decision threshold is FIXED AT TRAINING TIME as the midpoint
  of the two classes' own mean weights (``gw_pos`` / ``gw_neg``,
  each a milli mean over the class's token mass): keep iff
  ``2 * m >= gw_pos + gw_neg``.  The midpoint absorbs the class-size
  offset that raw LLR suffers when the background is much larger
  than the curated set, and — like q157/q159's g — it is a property
  of the MODEL, which is what lets the streaming twin label at
  ingest with no corpus-wide second pass.

Bench plant: the synthetic corpus is near-uniform word salad, so the
classes barely separate naturally and both labels must be planted
(the q157 convention, with class-conditional strata since a
discriminative model needs class-correlated features):

- ``qk`` (positive-characteristic): appended 25x to src0 docs with
  ``doc_id % 7 == 0`` (concentrating its mass in the positive class)
  AND to any-source docs with ``doc_id % 23 == 0`` (so a keep
  stratum exists in EVERY source — these docs borrow the
  positive-characteristic token);
- ``vx`` (negative-characteristic): appended 25x to non-src0 docs
  with ``doc_id % 13 == 0`` — frequent in the background, absent
  from the positive class, so its weight is strongly negative
  (relative to the shift) and those docs land drop.

Measured label mass (keep/drop docs): 284/216 at sf0.001, 463/37 at
sf0.01, 4635/365 at sf0.1 — both labels non-vacuous at every SF.
The sf0.001 near-split is the honest artifact of the miniature: the
near-uniform natural docs sit in a band straddling the midpoint
threshold, so knife-edge (but deterministic, oracle-identical)
rounding decides them; at larger SFs the classes separate and drop
converges toward the planted vx stratum (365 at sf0.1 ~= the
non-src0 %13 mass plus a thin knife-edge band).  The catalog
face's job is exercising both labels and every weight path
(both-vocab, pos-only, neg-only) with deterministic parity, not
calibrating the miniature.

Reference anchor: extends ``plans/curation20.py:101`` (q157's kit —
the round-16 verdict's named extension point) in the classifier
direction; CCNet/DCLM citations above.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.staging import stage
from ..sources.tables import load_table
from .catalog import query
from .curation20 import PPL_REF_SOURCE, _bitlen, _tokens, labeled_rollup

_QK_COPIES = 25  # positive-characteristic plant copies
_VX_COPIES = 25  # negative-characteristic plant copies


def _llr_augment(docs: DataFrame) -> DataFrame:
    """The deterministic planted keep/drop strata (module docstring):
    doc_id arithmetic + source predicate + string concat, identical
    in Spark and DuckDB.  Applied AT THE SCAN — a projection, no
    exchange."""
    did, src = F.col("doc_id"), F.col("source")
    qk = F.when(
        ((src == PPL_REF_SOURCE) & (did % 7 == 0)) | (did % 23 == 0),
        F.concat(F.lit(" "), F.repeat(F.lit("qk "), _QK_COPIES)),
    ).otherwise(F.lit(""))
    vx = F.when(
        (src != PPL_REF_SOURCE) & (did % 13 == 0),
        F.concat(F.lit(" "), F.repeat(F.lit("vx "), _VX_COPIES)),
    ).otherwise(F.lit(""))
    return docs.select(
        "doc_id", "source", F.concat(F.col("text"), qk, vx).alias("text")
    )


def llr_classifier(
    pos_docs: DataFrame, neg_docs: DataFrame
) -> tuple[DataFrame, int, int, int]:
    """Train the NB-LLR classifier: returns ``(weights, w_oov,
    theta2, shift)`` where ``weights`` is the DISTRIBUTED (tok, w)
    frame over the UNION of the two vocabularies (every stored w
    >= 0 thanks to the shift), ``w_oov`` the constant weight for a
    token absent from BOTH classes (possible only in library mode —
    on the catalog face the scored corpus IS pos + neg, so every
    token is in the union), and ``theta2 = gw_pos + gw_neg`` the
    doubled decision threshold (keep iff 2*m >= theta2).

    Scale shape: each class agg map-side combines per token before
    its one exchange and is Zipf-bounded (the q147/q157 argument);
    the weight table is their FULL OUTER join — union-of-vocab
    sized, still broadcast-scale; the class totals ride as a 2-row
    collect (one union-agg job) and the two class means as a 1-row
    fold of the weight frame (the q157 one-agg discipline, one job
    per bounded output).  ``cnt * w <= (bl_p + bl_n + 2) * N`` keeps
    every product int64-safe."""
    vp = stage(
        _tokens(pos_docs).groupBy("tok").agg(
            F.count(F.lit(1)).cast("long").alias("cnt_p")
        )
    )
    vn = stage(
        _tokens(neg_docs).groupBy("tok").agg(
            F.count(F.lit(1)).cast("long").alias("cnt_n")
        )
    )
    # ONE job for both class totals: union of two 1-row aggs.
    tot = {
        r["cls"]: int(r["n"] or 0)
        for r in vp.agg(F.sum("cnt_p").cast("long").alias("n"))
        .select(F.lit("p").alias("cls"), "n")
        .unionAll(
            vn.agg(F.sum("cnt_n").cast("long").alias("n")).select(
                F.lit("n").alias("cls"), "n"
            )
        )
        .collect()
    }
    n_pos, n_neg = tot.get("p", 0), tot.get("n", 0)
    if n_pos <= 0:
        raise ValueError("llr_classifier: empty positive class")
    if n_neg <= 0:
        raise ValueError("llr_classifier: empty negative class")
    bl_p, bl_n = n_pos.bit_length(), n_neg.bit_length()
    shift = bl_p + 1  # most negative raw weight: s_neg=0, s_pos=bl_p+1
    s_pos = F.when(
        F.col("cnt_p").isNull(), F.lit(bl_p + 1)
    ).otherwise(F.lit(bl_p) - _bitlen("cnt_p"))
    s_neg = F.when(
        F.col("cnt_n").isNull(), F.lit(bl_n + 1)
    ).otherwise(F.lit(bl_n) - _bitlen("cnt_n"))
    weights = stage(
        vp.join(vn, "tok", "full_outer").select(
            "tok",
            (s_neg - s_pos + F.lit(shift)).cast("long").alias("w"),
            F.col("cnt_p"),
            F.col("cnt_n"),
        )
    )
    # ONE job for both class mean weights: a 1-row fold of the
    # weight frame (all class tokens are in the union by
    # construction, so each mean sees its class's full mass).
    row = weights.agg(
        F.sum(F.col("cnt_p") * F.col("w")).cast("long").alias("swp"),
        F.sum(F.col("cnt_n") * F.col("w")).cast("long").alias("swn"),
    ).collect()[0]
    gw_pos = 1000 * int(row["swp"]) // n_pos
    gw_neg = 1000 * int(row["swn"]) // n_neg
    w_oov = (bl_n + 1) - (bl_p + 1) + shift  # = bl_n + 1, constant
    return weights.select("tok", "w"), w_oov, gw_pos + gw_neg, shift


def llr_counters(
    docs: DataFrame, weights: DataFrame, w_oov: int
) -> DataFrame:
    """Per-document weight accumulators: (doc_id, source, n_tok,
    sum_w) — the q157/q159 counter schema, so the finalize below
    serves batch and drained streaming state alike.  The weight
    lookup is ONE stateless LEFT join (in streaming: a stream-static
    join against the trained weight dim, q158's pattern), UNHINTED:
    the corpus-sized token stream joins a Zipf-bounded build side,
    so AQE broadcasts it at any scale.  HONEST state note: per-doc
    accumulators, the q145/q91/q158/q160 per-key family."""
    w = F.coalesce(F.col("w"), F.lit(w_oov)).cast("long")
    scored = _tokens(docs).join(weights, "tok", "left").select(
        "doc_id", "source", w.alias("w")
    )
    return scored.groupBy("doc_id").agg(
        F.min("source").alias("source"),
        F.count(F.lit(1)).cast("long").alias("n_tok"),
        F.sum("w").cast("long").alias("sum_w"),
    )


def llr_finalize(counters: DataFrame, theta2: int) -> DataFrame:
    """The keep/drop report from the per-doc counter table ALONE
    (batch-built or drained from streaming state) plus the trained
    threshold — q161/q162's face of :func:`curation20.labeled_rollup`
    (one shared copy of the rollup/totals machinery incl. the
    drained-memory-table join trap): keep iff 2*m >= theta2, the
    training-time midpoint rule."""
    return labeled_rollup(
        counters,
        lambda m: F.when(
            F.lit(2) * m >= F.lit(theta2), F.lit("keep")
        ).otherwise(F.lit("drop")),
        "label",
        score_col="sum_w",
    )


def llr_filter_report(
    docs: DataFrame, pos_docs: DataFrame, neg_docs: DataFrame
) -> DataFrame:
    """End-to-end library mode: train the classifier on the two class
    frames, score and label ``docs``, report per (source, label).
    Any three frames; the catalog face passes the planted corpus and
    its src0 / non-src0 strata.  PROVENANCE: production hands this
    INDEPENDENTLY curated classes (DCLM's positives are a curated
    instruction set, not a stratum of the scored crawl) — the
    catalog face reuses the closed input only because the oracle
    gate requires a deterministic model."""
    weights, w_oov, theta2, _shift = llr_classifier(pos_docs, neg_docs)
    return llr_finalize(llr_counters(docs, weights, w_oov), theta2)


# --- DuckDB oracle, generated from the SAME constants.  Shared
# VERBATIM by q161 and q162 (the drained per-doc state plus the
# trained threshold determine every output column).

LLR_ORACLE = f"""
        WITH aug AS (
            SELECT doc_id, source,
                   text
                   || CASE WHEN (source = '{PPL_REF_SOURCE}'
                                 AND doc_id % 7 = 0)
                                OR doc_id % 23 = 0
                           THEN ' ' || repeat('qk ', {_QK_COPIES})
                           ELSE '' END
                   || CASE WHEN source <> '{PPL_REF_SOURCE}'
                                AND doc_id % 13 = 0
                           THEN ' ' || repeat('vx ', {_VX_COPIES})
                           ELSE '' END AS text
            FROM documents
        ),
        toks AS (
            SELECT doc_id, source,
                   unnest(regexp_extract_all(lower(text), '[a-z0-9]+'))
                       AS tok
            FROM aug
        ),
        vp AS (
            SELECT tok, CAST(count(*) AS BIGINT) AS cnt_p
            FROM toks WHERE source = '{PPL_REF_SOURCE}' GROUP BY tok
        ),
        vn AS (
            SELECT tok, CAST(count(*) AS BIGINT) AS cnt_n
            FROM toks WHERE source <> '{PPL_REF_SOURCE}' GROUP BY tok
        ),
        np AS (SELECT CAST(sum(cnt_p) AS BIGINT) AS n FROM vp),
        nn AS (SELECT CAST(sum(cnt_n) AS BIGINT) AS n FROM vn),
        w AS (
            SELECT coalesce(vp.tok, vn.tok) AS tok, cnt_p, cnt_n,
                   CAST(
                     (CASE WHEN cnt_n IS NULL
                           THEN length(bin((SELECT n FROM nn))) + 1
                           ELSE length(bin((SELECT n FROM nn)))
                                - length(bin(cnt_n)) END)
                   - (CASE WHEN cnt_p IS NULL
                           THEN length(bin((SELECT n FROM np))) + 1
                           ELSE length(bin((SELECT n FROM np)))
                                - length(bin(cnt_p)) END)
                   + length(bin((SELECT n FROM np))) + 1
                   AS BIGINT) AS w
            FROM vp FULL OUTER JOIN vn ON vp.tok = vn.tok
        ),
        g AS (
            SELECT CAST(1000 * sum(cnt_p * w)
                        // (SELECT n FROM np) AS BIGINT)
                   + CAST(1000 * sum(cnt_n * w)
                        // (SELECT n FROM nn) AS BIGINT) AS theta2
            FROM w
        ),
        scored AS (
            -- LEFT JOIN + both-OOV coalesce mirrors llr_counters
            -- exactly (vacuous on the catalog face, where the scored
            -- corpus IS pos + neg, but the semantics stay aligned)
            SELECT t.doc_id, t.source,
                   coalesce(
                       w.w, length(bin((SELECT n FROM nn))) + 1
                   ) AS w
            FROM toks t LEFT JOIN w ON t.tok = w.tok
        ),
        docm AS (
            SELECT doc_id, source,
                   CAST(count(*) AS BIGINT) AS n_tok,
                   CAST(1000 * sum(w) // count(*) AS BIGINT) AS m
            FROM scored GROUP BY doc_id, source
        ),
        lab AS (
            SELECT source, n_tok,
                   CASE WHEN 2 * m >= (SELECT theta2 FROM g)
                        THEN 'keep' ELSE 'drop' END AS label
            FROM docm
        ),
        tot AS (
            SELECT source, CAST(count(*) AS BIGINT) AS src_docs
            FROM docm GROUP BY source
        )
        SELECT l.source, l.label,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(l.n_tok) AS BIGINT) AS n_tokens,
               CAST(1000 * count(*) // t.src_docs AS BIGINT)
                   AS doc_share_milli
        FROM lab l JOIN tot t ON l.source = t.source
        GROUP BY l.source, l.label, t.src_docs
        ORDER BY l.source, l.label
    """


@query(
    "q161_llr_quality_filter",
    oracle=LLR_ORACLE,
    description="NB-LLR quality-classifier filter, DCLM/fastText "
    "direction — the discriminative half that modern pipelines pair "
    "with the LM-perplexity filter (q157/q159): per-token weight = "
    "surprisal difference s_neg - s_pos between a curated positive "
    "class (src0; any frame in library mode — DCLM trains on curated "
    "instruction data) and the background, each side on q157's exact "
    "bitlen lattice with OOV strictly maximal; weights shifted by the "
    "training-time constant bitlen(N_pos)+1 so every stored weight "
    "and every division is non-negative (negative-operand integer "
    "division is the one dialect-unsafe lattice op — Spark truncates, "
    "DuckDB floors — so the lattice never performs one); per-doc "
    "milli mean weight, keep iff 2*m >= gw_pos + gw_neg (the midpoint "
    "of the two classes' own mean weights — fixed at training time, "
    "absorbing the class-size offset of raw LLR); per-(source, label) "
    "doc/token counts + per-source doc shares; class-conditional "
    "keep/drop strata planted at the scan (qk positive-characteristic "
    "incl. a cross-source borrow stratum, vx negative-characteristic)",
    tags=("llm", "curation", "quality", "text"),
)
def q161_llr_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale shape: (1) each class vocabulary agg map-side combines
    per token before its one exchange and is Zipf-bounded; the weight
    table is their FULL OUTER join — union-of-vocab sized, still a
    broadcast-scale dim at 100 TB; (2) the corpus pass is tokenize
    (narrow) + ONE left join against the weight dim, UNHINTED — AQE
    broadcasts the Zipf-bounded build side at any scale — then ONE
    per-doc exchange; (3) the report rollup + per-source totals reuse
    the staged counter frame (|sources|-scale).  The trained
    constants (class totals, theta2, the OOV weight) ride as bounded
    collects (2-row + 1-row, one job each — a trained classifier's
    parameters, the q75/q157 convention).  Budget pinned
    (tests/test_plan_shapes.py::test_round17b_exchange_budgets)."""
    docs = _llr_augment(load_table(spark, sf_dir, "documents"))
    pos = docs.filter(F.col("source") == PPL_REF_SOURCE)
    neg = docs.filter(F.col("source") != PPL_REF_SOURCE)
    return llr_filter_report(docs, pos, neg)
