"""Planted-positive fixtures for the round-11 catalog additions
(q132-q135) — landed WITH the additions, per the round-10 verdict's
evidence-kit invariant (planted tests + budget pins + local 2-SF
artifacts in the same round as the queries).

q132's fixture is the interesting one: it plants a GENUINE bloom
false positive — a probe 4-shingle, found by offline search, whose
three 16-bit hash windows all collide with bits set by a 647-shingle
bench doc while the shingle itself is absent from the bench set. The
test re-verifies the collision property from raw md5 at runtime (the
house hash is deterministic), so the constant cannot rot silently.
"""

from __future__ import annotations

import hashlib

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from aws_dla_kinesis_delivery_stream_example_spark.plans import all_specs

SPECS = all_specs()
_M = 1 << 16


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _write_documents(d, rows) -> str:
    """rows = (doc_id, text, lang, source, n_chars|None); None ->
    len(text)."""
    docs = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows]),
            "lang": pa.array([r[2] for r in rows]),
            "source": pa.array([r[3] for r in rows]),
            "n_chars": pa.array(
                [len(r[1]) if r[4] is None else r[4] for r in rows], pa.int64()
            ),
        }
    )
    pq.write_table(docs, d / "documents.parquet")
    return str(d)


# ---------------------------------------------------------------- q132

# Offline-searched bloom false positive (see module docstring): with
# the bench doc = tokens b000..b649 (647 4-shingles), this probe
# shingle's three bit-window projections all land on set bits while
# the 60-bit hash itself is NOT in the bench set.
_FP_TEXT = "fp1645620 xq yq zq"
_BENCH_TOKENS = [f"b{i:03d}" for i in range(650)]


@pytest.fixture(scope="module")
def bloom_sf_dir(tmp_path_factory) -> str:
    """doc 50 (doc_id % 50 == 0) is the bench doc; probes live in
    their own sources so each row isolates one outcome: a truly
    contaminated probe, a clean probe, and the searched false
    positive."""
    d = tmp_path_factory.mktemp("bloom_sf")
    return _write_documents(
        d,
        [
            (50, " ".join(_BENCH_TOKENS), "en", "bench", None),
            # shares its single 4-shingle "b000 b001 b002 b003":
            (1, " ".join(_BENCH_TOKENS[:4]), "en", "contam", None),
            (2, "clean alpha bravo charlie", "en", "clean", None),
            (3, _FP_TEXT, "en", "fp", None),
        ],
    )


def test_q132_fp_constant_still_collides():
    """Re-derive the planted collision from raw md5: all three bit
    windows of the FP shingle are present in the bench windows, yet
    the hash itself is absent. If the house hash or the window
    layout (0 / >>22 / >>44, mod 2^16) ever changes, THIS fails
    before the Spark assertion can go stale."""
    sh = [
        " ".join(_BENCH_TOKENS[i : i + 4]) for i in range(len(_BENCH_TOKENS) - 3)
    ]
    hs = {_h60(s) for s in sh}
    h = _h60(_FP_TEXT)
    assert h not in hs
    assert h % _M in {x % _M for x in hs}
    assert (h >> 22) % _M in {(x >> 22) % _M for x in hs}
    assert (h >> 44) % _M in {(x >> 44) % _M for x in hs}


def test_q132_planted_bloom_outcomes(spark, bloom_sf_dir):
    rows = {
        r["source"]: r.asDict()
        for r in SPECS["q132_bloom_decontam"].spark(spark, bloom_sf_dir).collect()
    }
    # the bench doc itself is not a probe
    assert set(rows) == {"contam", "clean", "fp"}
    # truly contaminated: bloom AND exact hit; fpr denominator
    # (n - exact) is 0 -> NULL via nullif, not a crash
    assert rows["contam"] == {
        "source": "contam",
        "n_shingles": 1,
        "bloom_pos": 1,
        "exact_pos": 1,
        "false_pos": 0,
        "fpr_milli": None,
    }
    assert rows["clean"] == {
        "source": "clean",
        "n_shingles": 1,
        "bloom_pos": 0,
        "exact_pos": 0,
        "false_pos": 0,
        "fpr_milli": 0,
    }
    # the searched collision: bloom says yes, exact says no
    assert rows["fp"] == {
        "source": "fp",
        "n_shingles": 1,
        "bloom_pos": 1,
        "exact_pos": 0,
        "false_pos": 1,
        "fpr_milli": 1000,
    }


# ----------------------------------------------------------- q133/q134


@pytest.fixture(scope="module")
def hist_sf_dir(tmp_path_factory) -> str:
    """n_chars values placed on bin EDGES (hand-binned below): s1
    covers octaves 0-3 with an exact-median bin hit (err 0), s2 the
    even-count median position, s3 a value one past a bin lower bound
    so est < exact (err > 0), plus an n_chars=0 doc that must be
    filtered, not binned (log2(0) would be undefined)."""
    d = tmp_path_factory.mktemp("hist_sf")
    rows = []
    did = 0
    for src, vals in (
        ("s1", [1, 2, 3, 8, 10]),
        ("s2", [4, 4, 6, 7]),
        ("s3", [17, 31]),
    ):
        for v in vals:
            did += 1
            rows.append((did, "x", "en", src, v))
    rows.append((did + 1, "", "en", "s1", 0))  # filtered out
    return _write_documents(d, rows)


# Hand-computed expectations. Bins: v=1->bin0(lo1); 2->4(lo2); 3->6(lo3);
# 4->8(lo4); 6->10(lo6); 7->11(lo7); 8->12(lo8); 10->13(lo10);
# 17->16(lo16); 31->19(lo28).
# s1 n=5: k25=2,k50=3,k75=4; cum 1/2/3/4/5 over bins 0,4,6,12,13.
# s2 n=4: k25=1,k50=2,k75=3; cum 2/3/4 over bins 8,10,11.
# s3 n=2: k25=1,k50=1,k75=2; cum 1/2 over bins 16,19; exact median
#   (rn (2+1)//2 = 1) = 17, est 16 -> err 1000*1//17 = 58.
_HIST_WANT = {
    "s1": {
        "n_docs": 5,
        "est_p25": 2,
        "est_p50": 3,
        "est_p75": 8,
        "exact_p50": 3,
        "err_p50_milli": 0,
    },
    "s2": {
        "n_docs": 4,
        "est_p25": 4,
        "est_p50": 4,
        "est_p75": 6,
        "exact_p50": 4,
        "err_p50_milli": 0,
    },
    "s3": {
        "n_docs": 2,
        "est_p25": 16,
        "est_p50": 16,
        "est_p75": 28,
        "exact_p50": 17,
        "err_p50_milli": 58,
    },
}


def _check_hist_rows(rows) -> None:
    got = {r["source"]: r.asDict() for r in rows}
    assert set(got) == set(_HIST_WANT)
    for src, want in _HIST_WANT.items():
        for col, val in want.items():
            assert got[src][col] == val, (src, col, got[src][col], val)


def test_q133_planted_histogram_quantiles(spark, hist_sf_dir):
    _check_hist_rows(SPECS["q133_hist_quantiles"].spark(spark, hist_sf_dir).collect())


def test_q134_streaming_histogram_equals_batch(spark, hist_sf_dir):
    """The streaming face on the same planted lake must fold to the
    identical hand-computed rows (the q128/q129 convention: stream
    state is just another route to the same sketch)."""
    _check_hist_rows(SPECS["q134_streaming_hist"].spark(spark, hist_sf_dir).collect())


# ---------------------------------------------------------------- q135

# Offline-verified CDC geometry: the 4-gram window "cw4 aa bb cc"
# hashes to 0 mod 32 (fires); every other window in the planted docs
# does not. Doc E is doc A with ONE token prepended — the insertion-
# robustness positive: the cut re-anchors on the same content window,
# so the tail chunk "y1 y2" still dedups across A/B/E (fixed-stride
# chunking would shift every downstream boundary and lose it).
_CDC_A = "x1 x2 x3 cw4 aa bb cc y1 y2"


@pytest.fixture(scope="module")
def cdc_sf_dir(tmp_path_factory) -> str:
    d = tmp_path_factory.mktemp("cdc_sf")
    return _write_documents(
        d,
        [
            (1, _CDC_A, "en", "web", None),
            (2, "y1 y2", "en", "web", None),  # = A's tail chunk
            (3, "zz1 zz2 zz3", "en", "web", None),  # unique, no window
            (4, "w0 " + _CDC_A, "en", "web", None),  # A + 1 inserted token
        ],
    )


def test_q135_cut_window_fires():
    """The planted cut window (and ONLY it) fires mod 32 — re-derived
    from raw md5 so a hash or mask change fails loudly here first."""
    toks = ("w0 " + _CDC_A).split()
    fired = [
        " ".join(toks[p - 4 : p])
        for p in range(4, len(toks))
        if _h60(" ".join(toks[p - 4 : p])) % 32 == 0
    ]
    assert fired == ["cw4 aa bb cc"]


def test_q135_planted_cdc_chunks(spark, cdc_sf_dir):
    rows = {
        r["doc_id"]: r.asDict()
        for r in SPECS["q135_cdc_chunk_dedup"].spark(spark, cdc_sf_dir).collect()
    }
    assert set(rows) == {1, 2, 3, 4}
    # A: chunks "x1..cc"(7, unique) + "y1 y2"(2, df=3)
    assert rows[1] == {
        "doc_id": 1,
        "n_tokens": 9,
        "n_chunks": 2,
        "dup_chunks": 1,
        "dup_tokens": 2,
        "dup_milli": 222,  # 1000*2 div 9
    }
    # B: one whole-doc chunk, shared
    assert rows[2] == {
        "doc_id": 2,
        "n_tokens": 2,
        "n_chunks": 1,
        "dup_chunks": 1,
        "dup_tokens": 2,
        "dup_milli": 1000,
    }
    # D: too short for any window -> one unique chunk
    assert rows[3] == {
        "doc_id": 3,
        "n_tokens": 3,
        "n_chunks": 1,
        "dup_chunks": 0,
        "dup_tokens": 0,
        "dup_milli": 0,
    }
    # E (insertion): head chunk grew by the inserted token (unique),
    # tail chunk STILL dedups — the whole point of content-defined
    # boundaries
    assert rows[4] == {
        "doc_id": 4,
        "n_tokens": 10,
        "n_chunks": 2,
        "dup_chunks": 1,
        "dup_tokens": 2,
        "dup_milli": 200,
    }
