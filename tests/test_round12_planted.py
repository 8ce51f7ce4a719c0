"""Round-12 planted/equivalence coverage.

bloom_decontam_scale (plans/curation10.py) is q132's truth-column-free
100 TB mode — same bloom gate, no bench-sized broadcast. These tests
pin it to the audited face: its (source, n_shingles, bloom_pos) rows
must equal q132's first three columns on BOTH the searched-collision
planted fixture and the real smoke-SF corpus, and its physical plan
must carry exactly the three bit-set broadcasts (the exact-marker
broadcast must be GONE — that absence is the entire point).
"""

from __future__ import annotations

import pytest

from aws_dla_kinesis_delivery_stream_example_spark.plans import all_specs
from aws_dla_kinesis_delivery_stream_example_spark.plans.curation10 import (
    bloom_decontam_scale,
)

from .conftest import SF_SMOKE
from .test_round11_planted import bloom_sf_dir  # noqa: F401  (fixture)

SPECS = all_specs()


def _scale_vs_q132(spark, sf_dir: str) -> None:
    scale = {
        r["source"]: (r["n_shingles"], r["bloom_pos"])
        for r in bloom_decontam_scale(spark, sf_dir).collect()
    }
    full = {
        r["source"]: (r["n_shingles"], r["bloom_pos"])
        for r in SPECS["q132_bloom_decontam"].spark(spark, sf_dir).collect()
    }
    assert scale == full and len(scale) > 0


def test_bloom_scale_equals_q132_on_planted(spark, bloom_sf_dir):  # noqa: F811
    """On the planted fixture the searched false positive must survive
    the scale mode too: bloom_pos=1 for source 'fp' even though no
    exact column exists to say so."""
    _scale_vs_q132(spark, bloom_sf_dir)
    rows = {
        r["source"]: r.asDict()
        for r in bloom_decontam_scale(spark, bloom_sf_dir).collect()
    }
    assert rows["fp"] == {"source": "fp", "n_shingles": 1, "bloom_pos": 1}
    assert rows["clean"] == {"source": "clean", "n_shingles": 1, "bloom_pos": 0}


def test_bloom_scale_equals_q132_at_smoke_sf(spark):
    _scale_vs_q132(spark, SF_SMOKE)


def test_bloom_scale_plan_has_no_bench_broadcast(spark):
    """The scale mode's plan must contain EXACTLY three broadcast hash
    joins (p1/p2/p3 bit sets) and no join on the raw 60-bit hash `h` —
    dropping the bench-sized exact broadcast is what makes it the
    100 TB mode, so its absence is pinned, not narrated."""
    plan = bloom_decontam_scale(spark, SF_SMOKE)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("BroadcastHashJoin") == 3, plan
    import re

    join_keys = re.findall(r"BroadcastHashJoin \[([a-zA-Z0-9_#]+)", plan)
    assert all(k.startswith("p") for k in join_keys), join_keys
