#!/usr/bin/env python
"""Scale rehearsal for the dedup/ANN operator family (SCALE.md §Dedup).

Runs the quadratic-hazard operators across the full 100x span of
available scale factors (sf0.001 -> sf0.1) and records, per SF:

- wall time per operator
- CANDIDATE pair counts (the pre-verification join fan-out — the
  number that must stay near-linear for the banded designs to hold)
- output pair counts

Prints one JSON line per (sf, op) plus a final summary with the
log10 growth exponent of candidates vs corpus size between the
smallest and largest SF (1.0 = perfectly linear; the banded designs
should sit near 1, the exact-Jaccard path is the one to watch).

Usage: python scripts/scale_rehearsal.py [--max-df N]
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from aws_dla_kinesis_delivery_stream_example_spark.operators import curation, dedup  # noqa: E402
from aws_dla_kinesis_delivery_stream_example_spark.session import get_spark  # noqa: E402
from aws_dla_kinesis_delivery_stream_example_spark.sources.tables import load_table  # noqa: E402

SFS = [("0.001", "/root/testdata/sf0.001"), ("0.01", "/root/testdata/sf0.01"), ("0.1", "/root/testdata/sf0.1")]


def synthesize_10x(src_dir: str) -> str:
    """Deterministic 10x documents/embeddings set: replicate sf0.1 with
    per-replica perturbation (no driver dependency; written under /tmp).

    The growth model is 'the corpus grew 10x with the same duplicate
    DENSITY', not '10 copies of everything': replica k>0 prefixes every
    token with r{k} (disjoint vocabulary per replica, so no spurious
    cross-replica near-dups — within-replica structure is preserved
    verbatim) and adds seeded N(0, 0.05) noise to embeddings (cluster
    geometry persists, exact duplicates stop being exact). One-time
    cost, keyed by source mtime.
    """
    import hashlib
    import re as _re

    import numpy as np
    import pandas as pd  # noqa: F401 (pyarrow->pandas roundtrip)
    import pyarrow as pa
    import pyarrow.parquet as pq

    key = hashlib.md5(
        f"{src_dir}:{os.path.getmtime(os.path.join(src_dir, 'documents.parquet'))}".encode()
    ).hexdigest()[:10]
    out_dir = os.path.join("/tmp", f"spark_graft_scale10x_{key}")
    marker = os.path.join(out_dir, "_SYNTH_OK")
    if os.path.exists(marker):
        return out_dir
    os.makedirs(out_dir, exist_ok=True)

    docs = pq.read_table(os.path.join(src_dir, "documents.parquet")).to_pandas()
    tok = _re.compile(r"[A-Za-z0-9]+")
    frames = []
    for k in range(10):
        d = docs.copy()
        d["doc_id"] = d["doc_id"] + k * 10_000_000
        if k:
            pre = f"r{k}"
            d["text"] = d["text"].map(
                lambda s, p=pre: tok.sub(lambda m: p + m.group(0), s)
                if isinstance(s, str)
                else s
            )
        frames.append(d)
    big = pd.concat(frames, ignore_index=True)
    pq.write_table(pa.Table.from_pandas(big, preserve_index=False),
                   os.path.join(out_dir, "documents.parquet"))

    emb = pq.read_table(os.path.join(src_dir, "embeddings.parquet")).to_pandas()
    mat = np.vstack(emb["embedding"].to_numpy()).astype("float32")
    eframes = []
    for k in range(10):
        e = emb.copy()
        e["vec_id"] = e["vec_id"] + k * 10_000_000
        m = mat if k == 0 else mat + np.random.default_rng(k).normal(
            0.0, 0.05, mat.shape
        ).astype("float32")
        e["embedding"] = list(m)
        eframes.append(e)
    bige = pd.concat(eframes, ignore_index=True)
    pq.write_table(pa.Table.from_pandas(bige, preserve_index=False),
                   os.path.join(out_dir, "embeddings.parquet"))
    open(marker, "w").close()
    return out_dir


def timed(fn):
    t0 = time.perf_counter()
    out = fn()
    return out, round(time.perf_counter() - t0, 2)


def main() -> None:
    max_df = None
    if "--max-df" in sys.argv:
        max_df = int(sys.argv[sys.argv.index("--max-df") + 1])
    tiers = list(SFS)
    if "--with-10x" in sys.argv:
        tiers.append(("1.0-synth", synthesize_10x(SFS[-1][1])))
    spark = get_spark()
    results: dict[str, dict] = {}
    for sf, sf_dir in tiers:
        docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
        n_docs = docs.count()
        row: dict = {"n_docs": n_docs}

        # exact n-gram Jaccard: candidates = pairs sharing >=1 shingle
        cand, row["jaccard_sec"] = timed(
            lambda: dedup.shingle_jaccard_pairs(
                docs, "doc_id", "text", threshold=0.0, max_df=max_df
            ).count()
        )
        row["jaccard_candidates"] = cand

        # MinHash LSH: candidates = banded-join pairs (threshold 0)
        cand, row["minhash_sec"] = timed(
            lambda: dedup.minhash_near_duplicates(docs, "doc_id", "text", threshold=0.0).count()
        )
        row["minhash_candidates"] = cand

        # SimHash: candidates = PRE-verification band-collision sig
        # pairs at the production radius (Manku block-triple banding,
        # round-6 hot-bucket valve at its defaults). Also decompose the
        # candidate set: how many pass the Hamming<=3 verify (the rest
        # cost one XOR+POPCNT each), and how crowded the worst band
        # bucket is (the valve's trigger signal).
        from pyspark.sql import functions as _F

        # persist the CANDIDATE set so the true-pairs decomposition does
        # not re-run the expensive band join. The distinct-sig input
        # stays UNPERSISTED on purpose: persisting it hides the size
        # statistics that let Catalyst broadcast the band self-joins
        # (measured 2.2 -> 5.9 s on q28), which would distort the very
        # timing this rehearsal records.
        usig = (
            dedup.simhash_signatures(docs, "doc_id", "text")
            .select("sig", "chunks")
            .distinct()
        )
        cand_df = dedup.simhash_band_candidates(usig, max_hamming=3).persist()
        cand, row["simhash_sec"] = timed(cand_df.count)
        row["simhash_candidates"] = cand
        row["simhash_true_pairs"] = cand_df.filter(
            _F.bit_count(_F.col("sig_a").bitwiseXOR(_F.col("sig_b"))) <= 3
        ).count()
        banded = usig.select(
            "sig",
            _F.explode(_F.array(*dedup._manku_band_keys(_F.col("sig")))).alias("bk"),
        )
        row["simhash_max_bucket"] = (
            banded.groupBy("bk").count().agg(_F.max("count")).collect()[0][0]
        )
        cand_df.unpersist()

        # clusters over the q49-style pair set
        pairs = dedup.shingle_jaccard_pairs(docs, "doc_id", "text", threshold=0.5, max_df=max_df)
        n_clustered, row["clusters_sec"] = timed(lambda: dedup.duplicate_clusters(pairs).count())
        row["clustered_docs"] = n_clustered

        # contamination: candidate shingle hits against a FIXED-size
        # benchmark set (a real eval set does not grow with the corpus)
        # — the broadcast side is constant, so hits must grow ~linearly
        # with the corpus
        from pyspark.sql import functions as F

        full = load_table(spark, sf_dir, "documents").select("doc_id", "text", "source")
        bench = full.filter(F.col("doc_id") < 10)
        cand_docs = full.filter(F.col("doc_id") >= 10)
        n_hits, row["contam_sec"] = timed(
            lambda: curation.contaminated_ids(cand_docs, bench, "doc_id", "text", n=4).count()
        )
        row["contam_candidates"] = n_hits

        # boilerplate: the df-count aggregation is linear; the hazard is
        # the boilerplate-set size (broadcast back) — track it
        n_boiler, row["boiler_sec"] = timed(
            lambda: curation.boilerplate_ratio(full, "doc_id", "text", n=5, min_df=3)
            .filter("n_boiler > 0")
            .count()
        )
        row["boiler_candidates"] = n_boiler

        # semantic dedup: candidate pairs are bounded by sum over
        # clusters of n_c^2/2 ~ n^2/k — the blocking must keep the
        # within-cluster pair count near n^2/k, NOT n^2 (growth
        # exponent ~2 of cluster-local candidates is expected and fine;
        # the win is the constant 1/k and bucket-locality: no shuffle
        # of the pair space, only of assignments)
        from aws_dla_kinesis_delivery_stream_example_spark.operators import clustering

        emb = load_table(spark, sf_dir, "embeddings")
        # at the 10x tier the unvalved threshold-0 pair count (~n^2/k)
        # would be ~156M rows of count-only output; engage the
        # documented hot-cluster valve instead — the exponent then
        # shows the valve flattening the cluster-local quadratic, which
        # is exactly the 100 TB operating mode
        sub_blocks = 4 if sf == "1.0-synth" else None
        row["semdedup_sub_blocks"] = sub_blocks
        n_pairs, row["semdedup_sec"] = timed(
            lambda: clustering.semantic_near_duplicates(
                emb, threshold=0.0, sub_blocks=sub_blocks
            ).count()
        )
        row["semdedup_candidates"] = n_pairs

        # sparse TF-IDF: candidates = pairs sharing >=1 surviving token
        # (threshold disabled). The greatest(floor, frac*n) valve keeps
        # per-token fan-out bounded relative to the corpus; candidate
        # growth should track the near-dup population, not n^2.
        from aws_dla_kinesis_delivery_stream_example_spark.operators import tfidf as TF

        n_tf, row["tfidf_sec"] = timed(
            lambda: TF.tfidf_cosine_pairs(
                docs, "doc_id", "text", threshold=-1.0, max_df=50, max_df_frac=0.1
            ).count()
        )
        row["tfidf_candidates"] = n_tf

        # the ABSOLUTE cap is the documented 100 TB mode: candidate
        # growth must flatten once df outgrows the cap (the relative
        # mode above is the catalog/test-fixture mode and is allowed
        # to grow ~quadratically on the planted near-dup population)
        n_tfa, row["tfidf_abs_sec"] = timed(
            lambda: TF.tfidf_cosine_pairs(
                docs, "doc_id", "text", threshold=-1.0, max_df=50
            ).count()
        )
        row["tfidf_abs_candidates"] = n_tfa

        results[sf] = row
        # operator-internal persists (postings/shingle staging) are
        # per-measurement scratch; don't let them tax the next SF
        spark.catalog.clearCache()
        print("SCALEJSON " + json.dumps({"sf": sf, **row}), flush=True)

    lo, hi = results[tiers[0][0]], results[tiers[-1][0]]
    growth = math.log10(max(hi["n_docs"], 1) / max(lo["n_docs"], 1))
    summary = {"span_docs": f'{lo["n_docs"]}->{hi["n_docs"]}', "max_df": max_df}
    for op in (
        "jaccard", "minhash", "simhash", "contam", "boiler", "semdedup",
        "tfidf", "tfidf_abs",
    ):
        c_lo, c_hi = max(lo[f"{op}_candidates"], 1), max(hi[f"{op}_candidates"], 1)
        summary[f"{op}_candidate_exponent"] = round(math.log10(c_hi / c_lo) / growth, 2)
        summary[f"{op}_time_ratio"] = round(hi[f"{op}_sec"] / max(lo[f"{op}_sec"], 0.01), 1)
    print("SCALESUMMARY " + json.dumps(summary), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
