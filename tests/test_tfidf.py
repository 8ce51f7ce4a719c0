"""Planted-signal tests for the sparse TF-IDF cosine operator (q81)."""

from __future__ import annotations

from aws_dla_kinesis_delivery_stream_example_spark.operators.tfidf import (
    tfidf_cosine_pairs,
    tfidf_postings,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_identical_docs_score_one(spark):
    docs = _docs(
        spark,
        [
            (1, "quick brown fox jumps over the lazy dog"),
            (2, "quick brown fox jumps over the lazy dog"),
            (3, "entirely different words about spark engines"),
        ],
    )
    out = {(r["doc_a"], r["doc_b"]): r["cos_sim"] for r in
           tfidf_cosine_pairs(docs, "doc_id", "text", threshold=0.9).collect()}
    assert set(out) == {(1, 2)}
    assert abs(out[(1, 2)] - 1.0) < 1e-6


def test_hot_token_cap_prunes_stopword_only_overlap(spark):
    # docs 1-4 share ONLY the hot token "the" (df=4); docs 1/2 also
    # share rare content. With the cap at df<=2 the hot token is
    # pruned: 1-2 still pair on their rare terms, but no pair exists
    # merely through "the".
    docs = _docs(
        spark,
        [
            (1, "the zebra quagga unique"),
            (2, "the zebra quagga unique"),
            (3, "the completely other material"),
            (4, "the unrelated further content"),
        ],
    )
    pairs = {
        (r["doc_a"], r["doc_b"])
        for r in tfidf_cosine_pairs(
            docs, "doc_id", "text", threshold=0.01, max_df=2
        ).collect()
    }
    assert (1, 2) in pairs
    assert all(p == (1, 2) for p in pairs)


def test_relative_cap_floor(spark):
    # max_df_frac over a tiny corpus must not go below the absolute
    # floor: with floor 50 nothing is pruned at n_docs=3.
    docs = _docs(
        spark,
        [(1, "alpha beta"), (2, "alpha gamma"), (3, "alpha delta")],
    )
    toks = tfidf_postings(
        docs, "doc_id", "text", max_df=50, max_df_frac=0.1
    )
    assert toks.filter("tok = 'alpha'").count() == 3  # df=3 <= 50 floor


def test_frac_only_cap_is_rejected(spark):
    # The purely relative cap is the measured-quadratic footgun
    # (SCALE_REHEARSAL_r05: exponent 2.81); it must be unreachable
    # through the public signature.
    import pytest as _pytest

    docs = _docs(spark, [(1, "alpha beta")])
    with _pytest.raises(ValueError, match="max_df_frac requires max_df"):
        tfidf_postings(docs, "doc_id", "text", max_df_frac=0.1)
    with _pytest.raises(ValueError, match="max_df_frac requires max_df"):
        tfidf_cosine_pairs(docs, "doc_id", "text", max_df_frac=0.1)


def test_relative_cap_ceiling_clamps(spark):
    # 30 docs all sharing "alpha" (df=30). frac=1.0 alone would keep it
    # (rel cap 30); the ceiling clamps the relative term to 10, and the
    # floor (2) stays below that, so the hot token is pruned. A rarer
    # token (df=2) survives via the floor.
    docs = _docs(
        spark,
        [(i, "alpha" + (" rare" if i < 2 else "")) for i in range(30)],
    )
    toks = tfidf_postings(
        docs, "doc_id", "text", max_df=2, max_df_frac=1.0, max_df_ceiling=10
    )
    surviving = {r["tok"] for r in toks.collect()}
    assert surviving == {"rare"}
    # ceiling=None restores the unbounded relative mode (escape hatch)
    toks = tfidf_postings(
        docs, "doc_id", "text", max_df=2, max_df_frac=1.0, max_df_ceiling=None
    )
    assert {r["tok"] for r in toks.collect()} == {"alpha", "rare"}


def test_cap_composition_boundaries(spark):
    # The effective cap is greatest(floor, least(frac*N, ceiling)).
    # Build a 20-doc corpus with tokens at df = 3, 6, 12 and walk the
    # three regimes: floor-dominated, frac-dominated, ceiling-clamped.
    rows = []
    for i in range(20):
        toks = ["common"] if i < 12 else ["filler%d" % i]
        if i < 6:
            toks.append("mid")
        if i < 3:
            toks.append("rare")
        rows.append((i, " ".join(toks)))
    docs = _docs(spark, rows)

    def surviving(**kw):
        return {
            r["tok"]
            for r in tfidf_postings(docs, "doc_id", "text", **kw).collect()
        }

    # floor-dominated: greatest(5, least(0.05*20=1, 100)) = 5 -> df<=5
    assert "rare" in surviving(max_df=5, max_df_frac=0.05, max_df_ceiling=100)
    assert "mid" not in surviving(max_df=5, max_df_frac=0.05, max_df_ceiling=100)
    # frac-dominated: greatest(2, least(0.35*20=7, 100)) = 7 -> df<=7
    s = surviving(max_df=2, max_df_frac=0.35, max_df_ceiling=100)
    assert "mid" in s and "common" not in s
    # ceiling-clamped: greatest(2, least(1.0*20=20, 7)) = 7 -> df<=7
    s = surviving(max_df=2, max_df_frac=1.0, max_df_ceiling=7)
    assert "mid" in s and "common" not in s


def test_weights_are_on_6dp_grid(spark):
    docs = _docs(spark, [(1, "a a b"), (2, "b c")])
    ws = [r["w"] for r in tfidf_postings(docs, "doc_id", "text").collect()]
    assert all(abs(w - round(w, 6)) < 1e-12 for w in ws)


def test_bm25_tf_and_length_normalization(spark):
    from aws_dla_kinesis_delivery_stream_example_spark.operators.tfidf import bm25_topk

    docs = _docs(
        spark,
        [
            # doc 1: two hits, short -> top
            (1, "spark spark engine"),
            # doc 2: one hit, same length
            (2, "spark other engine"),
            # doc 3: one hit, much longer -> length-normalized below 2
            (3, "spark " + "filler " * 40),
            # doc 4: no hits -> absent
            (4, "nothing relevant here"),
        ],
    )
    out = bm25_topk(docs, "doc_id", "text", ["spark"], top_k=10).collect()
    ranked = [r["doc"] for r in out]
    assert ranked == [1, 2, 3]  # tf dominance, then length normalization
    scores = {r["doc"]: r["bm25"] for r in out}
    assert scores[1] > scores[2] > scores[3] > 0


def test_staging_released_after_sweep(spark):
    """Operator-internal staging caches must be releasable: run the
    persisting operators, act on their results, release, and require
    zero persistent RDDs left in the session (the long-lived-session
    leak the round-4 review flagged)."""
    from aws_dla_kinesis_delivery_stream_example_spark.operators import dedup, tfidf
    from aws_dla_kinesis_delivery_stream_example_spark.operators.staging import (
        release_staging,
    )
    from aws_dla_kinesis_delivery_stream_example_spark.sources.tables import load_table

    from .conftest import SF_SMOKE

    docs = load_table(spark, SF_SMOKE, "documents")
    # scope the assertion to THIS sweep's delta: earlier tests may have
    # run localCheckpoint-based operators (duplicate_clusters in
    # q49/q94) whose superseded checkpoint RDDs linger until the
    # driver GC triggers the ContextCleaner — out of scope here
    before = set(spark.sparkContext._jsc.getPersistentRDDs().keySet())
    tfidf.tfidf_cosine_pairs(docs, "doc_id", "text", threshold=0.5).count()
    dedup.shingle_jaccard_pairs(docs, "doc_id", "text", threshold=0.5).count()
    during = set(spark.sparkContext._jsc.getPersistentRDDs().keySet())
    assert len(during - before) > 0
    assert release_staging(blocking=True) >= 2
    after = set(spark.sparkContext._jsc.getPersistentRDDs().keySet())
    assert after - before == set(), "staging sweep left its own caches behind"


def test_staging_registry_is_thread_scoped(spark):
    """release_staging() on one thread must not drop frames another
    thread staged (the interleaved-queries hazard): each submitting
    thread owns a private registry."""
    import threading

    from aws_dla_kinesis_delivery_stream_example_spark.operators.staging import (
        release_staging,
        stage,
        staged_elsewhere,
    )

    df = spark.range(10)
    stage(df)
    other_released, other_orphans = [], []
    def _other():
        other_orphans.append(staged_elsewhere())
        other_released.append(release_staging())
    t = threading.Thread(target=_other)
    t.start()
    t.join()
    assert other_released == [0]  # the other thread sees nothing to drop
    assert other_orphans == [1]  # ...but the mismatch IS observable
    assert df.storageLevel.useMemory  # ours is still persisted
    assert release_staging(blocking=True) == 1  # and we can drop it
    assert staged_elsewhere() == 0


def test_milliweight_overflow_guard(spark):
    """A pathological doc repeating one rare token enough to push
    w_m past the int64-safe bound must FAIL FAST, not wrap silently."""
    import pytest as _pytest

    from aws_dla_kinesis_delivery_stream_example_spark.operators import tfidf
    from aws_dla_kinesis_delivery_stream_example_spark.operators.staging import (
        release_staging,
    )

    docs = spark.createDataFrame(
        [
            (1, "zzquare " * 2_000_000),  # tf=2e6 of a rare token: w ~ tf*ln(3/2) > 3000
            (2, "ordinary text here"),
        ],
        "doc_id long, text string",
    )
    with _pytest.raises(Exception, match="integer-cosine bound"):
        tfidf.tfidf_cosine_pairs(docs, "doc_id", "text").count()
    release_staging(blocking=True)
