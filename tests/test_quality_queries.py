"""Planted-signal tests for the model-based quality queries (q85-q87):
the oracle rehearsal proves engine parity; these prove the scores
actually separate what they claim to separate."""

from __future__ import annotations

from pyspark.sql import functions as F

from aws_dla_kinesis_delivery_stream_example_spark.plans import quality as Q


def test_perplexity_ranks_shuffled_text_above_natural(spark, tmp_path):
    # "natural" docs repeat the corpus's dominant bigrams; the planted
    # doc uses the same words in orders never seen elsewhere -> its
    # bigrams are rare under the corpus LM -> top NLL.
    natural = "the quick brown fox jumps over the lazy dog"
    rows = [(i, natural) for i in range(10)] + [
        (99, "dog the over fox quick lazy jumps brown the")
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string").withColumns(
        {"lang": F.lit("en"), "source": F.lit("s"), "n_chars": F.length("text")}
    )
    sf_dir = str(tmp_path)
    df.write.parquet(f"{sf_dir}/documents.parquet")
    out = Q.q86_bigram_perplexity(spark, sf_dir).collect()
    assert out[0]["doc_id"] == 99  # most perplexing
    assert out[0]["nll"] > out[-1]["nll"]


def test_kl_zero_for_identical_sources_positive_for_drifted(spark, tmp_path):
    common = "alpha beta gamma delta"
    rows = (
        [(i, common, "same_a") for i in range(5)]
        + [(10 + i, common, "same_b") for i in range(5)]
        + [(20 + i, "omega omega omega omega", "drifted") for i in range(5)]
    )
    df = spark.createDataFrame(rows, "doc_id long, text string, source string").withColumns(
        {"lang": F.lit("en"), "n_chars": F.length("text")}
    )
    sf_dir = str(tmp_path)
    df.write.parquet(f"{sf_dir}/documents.parquet")
    kl = {r["source"]: r["kl"] for r in Q.q87_source_kl_drift(spark, sf_dir).collect()}
    # a fully-drifted vocabulary diverges far more than the shared one
    assert kl["drifted"] > kl["same_a"] >= 0
    assert kl["same_a"] == kl["same_b"]  # symmetric inputs, identical score


def test_classifier_prefers_clean_prose(spark, tmp_path):
    clean = "The quick brown fox jumps over the lazy dog in the morning."
    noisy = "$$$ 1234 @@@@ ???? !!!! 9999 ####"
    rows = [(1, clean, "clean"), (2, noisy, "noisy")]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string").withColumns(
        {"lang": F.lit("en"), "n_chars": F.length("text")}
    )
    sf_dir = str(tmp_path)
    df.write.parquet(f"{sf_dir}/documents.parquet")
    out = {r["source"]: r for r in Q.q85_quality_classifier(spark, sf_dir).collect()}
    assert out["clean"]["avg_p"] > out["noisy"]["avg_p"]
    assert out["clean"]["n_kept"] == 1 and out["noisy"]["n_kept"] == 0
