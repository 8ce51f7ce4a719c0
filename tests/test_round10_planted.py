"""Planted-positive fixtures for the round-10 catalog additions
(q127-q131) — round-10 verdict Next #1.

Same discipline as test_planted_positives.py: run the SAME catalog
QuerySpecs (``all_specs()``, not reimplementations) against tiny local
parquet lakes with hand-constructed documents, and assert exact
hand-computed output values — including the edge paths the driver
corpus never exercises (a 2-token doc's NULL dup-trigram lattice, a
duplicate-shingle source's idempotent HLL registers, a planted
cross-split leaked shingle, a doc with zero boilerplate coverage).

Hash-based expectations (HLL registers, split assignment) are
recomputed independently in-test with hashlib + pure-int math — the
house 60-bit md5 prefix (FIXTURES.md) — never by calling the engine's
own column builders.
"""

from __future__ import annotations

import hashlib
import math

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from aws_dla_kinesis_delivery_stream_example_spark.plans import all_specs

SPECS = all_specs()


def _h60(s: str) -> int:
    """The house hash, recomputed independently: first 15 md5 hex
    chars = 60 bits (FIXTURES.md; CAST('0x'||substring(md5(s),1,15)
    AS BIGINT) in DuckDB)."""
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _write_documents(d, rows) -> str:
    """rows = list of (doc_id, text, lang, source). n_chars =
    len(text), the testdata convention."""
    docs = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows]),
            "lang": pa.array([r[2] for r in rows]),
            "source": pa.array([r[3] for r in rows]),
            "n_chars": pa.array([len(r[1]) for r in rows], pa.int64()),
        }
    )
    pq.write_table(docs, d / "documents.parquet")
    return str(d)


# ---------------------------------------------------------------- q127


@pytest.fixture(scope="module")
def gopher_sf_dir(tmp_path_factory) -> str:
    """Docs with hand-countable bigram/trigram layouts covering every
    q127 branch: a heavy repeater, a just-below-threshold clean doc,
    a single-token doc (filtered), a 2-token doc (trigram lattice is
    NULL via nullif), and a doc whose top bigram repeats NON-adjacent
    in text order (the sort_array run-length fold must still find it).
    """
    d = tmp_path_factory.mktemp("gopher_sf")
    return _write_documents(
        d,
        [
            # bigrams: [cat dog, dog cat, cat dog, dog cat, cat dog]
            # -> top 3/5; trigrams 4, distinct 2 -> dup 2/4
            (1, "cat dog cat dog cat dog", "en", "web"),
            # 18 unique tokens: 17 bigrams, top 1 -> 1000 div 17 = 58
            # milli, one BELOW the 60 gate; 16 distinct trigrams
            (2, " ".join(f"w{i:02d}" for i in range(1, 19)), "en", "web"),
            (3, "solo", "en", "web"),  # < 2 tokens: filtered out
            # 2 tokens: 1 bigram, 0 trigrams -> dup lattice NULL
            (4, "aa bb", "en", "web"),
            # bigrams: [x y, y z, z x, x y] — "x y" repeats at
            # positions 1 and 4 (never adjacent until sorted)
            (5, "x y z x y", "en", "web"),
        ],
    )


def test_q127_planted_repetition_lattices(spark, gopher_sf_dir):
    rows = {
        r["doc_id"]: r.asDict()
        for r in SPECS["q127_gopher_repetition"].spark(spark, gopher_sf_dir).collect()
    }
    assert set(rows) == {1, 2, 4, 5}  # doc 3 has < 2 tokens
    # doc 1: 6 tokens, 5 bigrams, top "cat dog" x3; 4 trigrams 2 dup
    assert rows[1] == {
        "doc_id": 1,
        "n_tokens": 6,
        "n_bigrams": 5,
        "top_bigram_n": 3,
        "top_bigram_milli": 600,  # 1000*3 div 5
        "dup_trigram_milli": 500,  # 1000*(4-2) div 4
        "flag_repetitive": True,
    }
    # doc 2: all-unique, top_bigram_milli = 1000 div 17 = 58 < 60 gate
    assert rows[2] == {
        "doc_id": 2,
        "n_tokens": 18,
        "n_bigrams": 17,
        "top_bigram_n": 1,
        "top_bigram_milli": 58,
        "dup_trigram_milli": 0,
        "flag_repetitive": False,
    }
    # doc 4: one bigram (1000 milli, flagged), ZERO trigrams -> the
    # dup lattice must be NULL (nullif path), not 0 and not a crash
    assert rows[4] == {
        "doc_id": 4,
        "n_tokens": 2,
        "n_bigrams": 1,
        "top_bigram_n": 1,
        "top_bigram_milli": 1000,
        "dup_trigram_milli": None,
        "flag_repetitive": True,
    }
    # doc 5: "x y" repeats non-adjacent in text order; the run-length
    # fold over sort_array must still count 2 (a fold over the UNsorted
    # array would report 1 and fail here)
    assert rows[5]["top_bigram_n"] == 2
    assert rows[5]["n_bigrams"] == 4
    assert rows[5]["top_bigram_milli"] == 500
    assert rows[5]["dup_trigram_milli"] == 0  # x y z / y z x / z x y
    assert rows[5]["flag_repetitive"] is True


# ----------------------------------------------------------- q128/q129


def _hll_expected(shingles: set[str]) -> dict:
    """Independent register-file + estimate computation for one
    source: register = h % 256, rho = 53 - bitlength(h >> 8) (53 when
    the window is 0), scaled sum = sum 2^(53-rho) + empties * 2^53,
    est = HALF_UP(alpha_256 * 256^2 * 2^53 / S) mirroring the plan's
    left-associative IEEE expression."""
    regs: dict[int, int] = {}
    for s in shingles:
        h = _h60(s)
        w = h >> 8
        rho = (53 - w.bit_length()) if w > 0 else 53
        r = h % 256
        regs[r] = max(regs.get(r, 0), rho)
    s_scaled = sum(1 << (53 - rho) for rho in regs.values()) + (256 - len(regs)) * (
        1 << 53
    )
    x = (0.7213 / (1.0 + 1.079 / 256.0)) * 256.0 * 256.0 * 9007199254740992.0 / float(
        s_scaled
    )
    est = int(math.floor(x + 0.5))  # Spark round() is HALF_UP
    exact = len(shingles)
    return {
        "exact_shingles": exact,
        "n_registers_hit": len(regs),
        "hll_sum_scaled": s_scaled,
        "hll_est": est,
        "err_milli": (1000 * abs(est - exact)) // exact,
    }


@pytest.fixture(scope="module")
def hll_sf_dir(tmp_path_factory) -> str:
    """Three sources: s1 = one 5-token doc (single shingle), s2 = TWO
    docs with IDENTICAL text (the register file must be the same as
    one doc — max-idempotence), s3 = one 6-token doc (two shingles)."""
    d = tmp_path_factory.mktemp("hll_sf")
    return _write_documents(
        d,
        [
            (1, "alpha bravo charlie delta echo", "en", "s1"),
            (2, "golf hotel india juliet kilo", "en", "s2"),
            (3, "golf hotel india juliet kilo", "en", "s2"),  # exact dup
            (4, "one two three four five six", "en", "s3"),
        ],
    )


_HLL_WANT = {
    "s1": _hll_expected({"alpha bravo charlie delta echo"}),
    "s2": _hll_expected({"golf hotel india juliet kilo"}),
    "s3": _hll_expected(
        {"one two three four five", "two three four five six"}
    ),
}


def _check_hll_rows(rows) -> None:
    got = {r["source"]: r.asDict() for r in rows}
    assert set(got) == {"s1", "s2", "s3"}
    for src, want in _HLL_WANT.items():
        row = got[src]
        for col, val in want.items():
            assert row[col] == val, (src, col, row[col], val)


def test_q128_planted_register_file(spark, hll_sf_dir):
    """Registers, scaled sum, estimate and error all recomputed
    independently with hashlib + int math; s2's duplicate doc must not
    move a single bit (max-idempotence is WHY this sketch survives
    at-least-once replay)."""
    _check_hll_rows(SPECS["q128_hll_distinct"].spark(spark, hll_sf_dir).collect())


def test_q129_streaming_register_file_equals_batch(spark, hll_sf_dir):
    """The streaming face on the same planted lake: register file and
    fold must match the SAME hand-computed rows bit-for-bit (the
    q112/q113 convention — stream state is just another route to the
    identical sketch)."""
    _check_hll_rows(SPECS["q129_streaming_hll"].spark(spark, hll_sf_dir).collect())


# ---------------------------------------------------------------- q130


def _split_of(doc_id: int) -> str:
    b = _h60(f"split:{doc_id}") % 10
    return "train" if b < 8 else ("val" if b == 8 else "test")


@pytest.fixture(scope="module")
def split_sf_dir(tmp_path_factory):
    """Planted leakage: one val doc and one test doc each share one
    5-shingle with a train doc; one val doc is too short to shingle
    at all (a short doc cannot leak); the rest are disjoint. Doc ids
    are PICKED by recomputing the split hash independently, so the
    fixture stays valid whatever ids the hash favors."""
    ids = {"train": [], "val": [], "test": []}
    for i in range(1, 500):
        s = _split_of(i)
        if len(ids[s]) < 3:
            ids[s].append(i)
        if all(len(v) >= 3 for v in ids.values()):
            break
    assert all(len(v) >= 3 for v in ids.values())
    tr1, tr2, _ = ids["train"]
    v1, v2, v3 = ids["val"]
    te1, te2, _ = ids["test"]
    texts = {
        tr1: "alpha bravo charlie delta echo foxtrot",  # 2 shingles
        tr2: "one two three four five",  # 1 shingle
        # shares "alpha bravo charlie delta echo" with tr1:
        v1: "zulu alpha bravo charlie delta echo",
        v2: "november oscar papa quebec romeo sierra",  # clean
        v3: "tiny doc here",  # < 5 tokens: no shingles, cannot leak
        # shares "bravo charlie delta echo foxtrot" with tr1:
        te1: "bravo charlie delta echo foxtrot golf",
        te2: "uniform victor whiskey xray yankee",  # clean
    }
    d = tmp_path_factory.mktemp("split_sf")
    rows = [(i, t, "en", "web") for i, t in sorted(texts.items())]
    sf = _write_documents(d, rows)
    chars = {s: 0 for s in ids}
    counts = {s: 0 for s in ids}
    for i, t in texts.items():
        chars[_split_of(i)] += len(t)
        counts[_split_of(i)] += 1
    return sf, counts, chars


def test_q130_planted_leakage(spark, split_sf_dir):
    sf, counts, chars = split_sf_dir
    rows = {
        r["split"]: r.asDict()
        for r in SPECS["q130_split_leakage"].spark(spark, sf).collect()
    }
    assert set(rows) == {"train", "val", "test"}
    # train: leakage columns are NULL by definition
    assert rows["train"] == {
        "split": "train",
        "n_docs": counts["train"],
        "total_chars": chars["train"],
        "n_contaminated": None,
        "contam_milli": None,
    }
    # val: exactly the ONE planted leaked doc of 3 (the 3-token doc
    # must not count — no shingles, no leak)
    assert rows["val"] == {
        "split": "val",
        "n_docs": 3,
        "total_chars": chars["val"],
        "n_contaminated": 1,
        "contam_milli": 333,  # 1000*1 div 3
    }
    # test: one leaked of 2
    assert rows["test"] == {
        "split": "test",
        "n_docs": 2,
        "total_chars": chars["test"],
        "n_contaminated": 1,
        "contam_milli": 500,
    }


# ---------------------------------------------------------------- q131


@pytest.fixture(scope="module")
def boiler_sf_dir(tmp_path_factory):
    """A corpus whose top-64 boilerplate set is exactly knowable by
    hand: 4 template bigrams at df=5 (always in), then 60 'aa…'
    bigrams at df=1 that win every remaining slot on the (df DESC,
    name ASC) tie-break — all other df=1 bigrams sort after 'aa'.
    81 distinct bigrams total, so 17 are genuinely OUTSIDE the set."""
    d = tmp_path_factory.mktemp("boiler_sf")
    template = "click here now please buy"  # 4 template bigrams
    rows = [
        # 5 template docs: 4 template bigrams + "buy qq{i}a" border +
        # 2 own filler bigrams = 7 distinct each, 4 boiler
        (i, f"{template} qq{i}a qq{i}b qq{i}c", "en", "web")
        for i in range(1, 6)
    ]
    # sacrificial doc: tokens aa00..aa60 -> 60 df=1 bigrams that sort
    # before every other df=1 bigram ("aa…" < "buy…" < "qq…" < "rr…")
    rows.append((6, " ".join(f"aa{i:02d}" for i in range(61)), "en", "web"))
    # zero-coverage doc: both its bigrams lose the name tie-break
    rows.append((7, "rr1 rr2 rr3", "en", "web"))
    return _write_documents(d, rows)


def test_q131_planted_boilerplate_coverage(spark, boiler_sf_dir):
    rows = {
        r["doc_id"]: r.asDict()
        for r in SPECS["q131_boilerplate_coverage"].spark(spark, boiler_sf_dir).collect()
    }
    assert set(rows) == {1, 2, 3, 4, 5, 6, 7}
    # template docs: 7 distinct bigrams, the 4 df=5 ones are boiler
    for i in range(1, 6):
        assert rows[i] == {
            "doc_id": i,
            "n_distinct_bigrams": 7,
            "n_boiler": 4,
            "coverage_milli": 571,  # 1000*4 div 7
        }, i
    # sacrificial doc: all 60 of its bigrams made the set
    assert rows[6] == {
        "doc_id": 6,
        "n_distinct_bigrams": 60,
        "n_boiler": 60,
        "coverage_milli": 1000,
    }
    # zero-coverage doc: 81 distinct corpus bigrams > 64 slots, and
    # "rr1 rr2"/"rr2 rr3" lose the (df DESC, name ASC) tie-break to
    # the 'aa…' block — a wrong tie-break order fails HERE
    assert rows[7] == {
        "doc_id": 7,
        "n_distinct_bigrams": 2,
        "n_boiler": 0,
        "coverage_milli": 0,
    }
