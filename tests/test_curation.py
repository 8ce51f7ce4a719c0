"""Curation-operator unit tests (operator-level, planted signals) —
complements the oracle-parity gate which checks the q64-q69 catalog
specs against DuckDB."""

from __future__ import annotations

from pyspark.sql import functions as F

from aws_dla_kinesis_delivery_stream_example_spark.operators import curation


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


def test_contamination_finds_planted_overlap(spark):
    bench = _docs(spark, [(100, "alpha beta gamma delta epsilon", "bench")])
    cand = _docs(
        spark,
        [
            (1, "zzz alpha beta gamma delta yyy", "web"),  # shares a 4-gram
            (2, "totally different words here now", "web"),
            (3, None, "web"),
            (4, "", "web"),
        ],
    )
    hits = sorted(
        r.doc_id for r in curation.contaminated_ids(cand, bench, "doc_id", "text", n=4).collect()
    )
    assert hits == [1]


def test_incremental_dedup_null_and_cross_batch_semantics(spark):
    """Nulls follow SQL GROUP BY semantics on both engines: a null
    digest never matches the corpus (anti join null semantics), and
    null-text docs within the batch form one group with a min-id
    survivor — identical to the DuckDB oracle's behavior."""
    corpus = _docs(spark, [(0, "seen before", "c"), (2, None, "c")])
    batch = _docs(
        spark,
        [
            (1, "seen before", "b"),  # dup of corpus -> dropped
            (3, None, "b"),  # null digest: survives the anti join
            (5, None, "b"),  # second null: collapses into doc 3's group
            (7, "brand new", "b"),
            (9, "brand new", "b"),  # within-batch dup of 7
        ],
    )
    kept = {
        r.keep_id: r.n_copies
        for r in curation.incremental_dedup(batch, corpus, "doc_id", "text").collect()
    }
    assert kept == {3: 2, 7: 2}


def test_boilerplate_planted_template(spark):
    """A shared 5-gram template across >= min_df docs is flagged; the
    unique remainder is not."""
    template = "please subscribe to our newsletter"
    rows = [(i, f"{template} unique{i} words{i} here{i} now{i} end{i}", "s") for i in range(3)]
    rows.append((99, "entirely unrelated text goes right here today", "s"))
    out = {
        r.doc_id: (r.n_boiler, r.n_shingles)
        for r in curation.boilerplate_ratio(
            _docs(spark, rows), "doc_id", "text", n=5, min_df=3
        ).collect()
    }
    for i in range(3):
        assert out[i][0] >= 1  # the template shingle is boilerplate
    assert out[99][0] == 0


def test_centroid_cosines_identical_vectors(spark):
    """All-identical vectors per label => centroid == vector => cosine
    exactly 1.0 for every row."""
    emb = spark.createDataFrame(
        [(i, [1.0, 2.0, 2.0], i % 2) for i in range(6)],
        "vec_id long, embedding array<float>, label int",
    )
    cc = curation.centroid_cosines(emb, "vec_id", "embedding", "label").collect()
    assert len(cc) == 6
    for r in cc:
        assert abs(r.cos_centroid - 1.0) < 1e-12
