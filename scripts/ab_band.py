#!/usr/bin/env python
"""Fresh-process catalog-band A/B (round-11 verdict "Next round" #3).

BENCH_r11.json carried a contiguous, plan-unchanged ~2x regression band
(q12-q27, worst q27 at 4.3x min-of-3) plus a tail band (q124/q125/
q129/q130) that only a fresh-process same-code A/B can classify as
host contention vs real. This tool runs the suspect band TWICE, each
in its own fresh process (sequential, never concurrent), with the
bench harness's exact estimator (min-of-REPEATS after a table warm-up,
staging released + cache cleared + GC between repeats), and writes an
artifact comparing both arms against the committed BENCH_r10/r11
per-query numbers.

Reading the artifact: for each query, `min_ab` is the best fresh-
process time this round. `vs_r11 = min_ab / r11` — a value well under
1 on the regressed queries means the r11 sweep number was inflated by
sweep-context/host contention (the code did not get slower); a value
near the r11 number means the regression is real and needs profiling.

Usage:
  python scripts/ab_band.py                 # both arms -> BENCH_AB_r12_band.json
  python scripts/ab_band.py --out FILE
  python scripts/ab_band.py --arm           # one arm (internal)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPEATS = 3

# The two regression bands from the round-11 verdict, verbatim.
BAND = [f"q{n:02d}" for n in range(12, 28)] + ["q124", "q125", "q129", "q130"]


def _band_specs():
    from aws_dla_kinesis_delivery_stream_example_spark.plans import all_specs

    specs = {}
    for name, spec in all_specs().items():
        prefix = name.split("_")[0]
        if prefix in BAND:
            specs[prefix] = (name, spec)
    missing = [q for q in BAND if q not in specs]
    assert not missing, f"band queries not in catalog: {missing}"
    return specs


def run_arm() -> None:
    from aws_dla_kinesis_delivery_stream_example_spark.operators.staging import (
        release_staging,
    )
    from aws_dla_kinesis_delivery_stream_example_spark.session import get_spark
    from aws_dla_kinesis_delivery_stream_example_spark.sources.tables import (
        TABLES,
        load_table,
    )

    spark = get_spark(app_name="ab-band")
    for t in TABLES:
        load_table(spark, SF_DIR, t).count()
    timings = {}
    # hoisted out of the timing loop (round-12 ADVICE, low): building
    # the full catalog spec dict belongs outside the measured path
    specs = _band_specs()
    for prefix in BAND:
        name, spec = specs[prefix]
        best = None
        for _ in range(REPEATS):
            t0 = time.perf_counter()
            spec.spark(spark, SF_DIR).collect()
            took = time.perf_counter() - t0
            best = took if best is None else min(best, took)
            release_staging()
            spark.catalog.clearCache()
            spark._jvm.System.gc()
        timings[prefix] = round(best, 3)
    print("ABJSON " + json.dumps(timings), flush=True)


def _one_process() -> dict:
    proc = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--arm"],
        capture_output=True,
        text=True,
        cwd=REPO,
        timeout=3600,
        env={**os.environ, "SPARK_GRAFT_SF_DIR": SF_DIR},
    )
    line = next(
        (ln for ln in proc.stdout.splitlines() if ln.startswith("ABJSON ")), None
    )
    if line is None:
        raise RuntimeError(
            f"band arm produced no ABJSON; stderr tail: {proc.stderr[-2000:]}"
        )
    return json.loads(line[len("ABJSON "):])


def _committed(path: str) -> dict:
    try:
        with open(os.path.join(REPO, path)) as f:
            d = json.load(f)
        return (d.get("parsed") or {}).get("queries") or d.get("queries") or {}
    except Exception:
        return {}


def main(out_path: str) -> None:
    r10, r11 = _committed("BENCH_r10.json"), _committed("BENCH_r11.json")
    arms = []
    for i in (1, 2):
        arm = _one_process()
        arms.append(arm)
        print(f"ARM{i}: total {round(sum(arm.values()), 2)} s", flush=True)
    per = {}
    for q in BAND:
        a, b = arms[0].get(q), arms[1].get(q)
        min_ab = min(v for v in (a, b) if v is not None)
        row = {"a": a, "b": b, "min_ab": min_ab}
        for label, src in (("r10", r10), ("r11", r11)):
            v = src.get(q)
            if isinstance(v, (int, float)):
                row[label] = v
                row[f"vs_{label}"] = round(min_ab / v, 3) if v else None
        per[q] = row
    artifact = {
        "purpose": (
            "Catalog-band A/B (round-11 verdict Next #3): two sequential "
            "fresh-process same-code runs of the BENCH_r11 regression "
            "bands (q12-q27 + q124/q125/q129/q130), min-of-%d estimator "
            "identical to bench.py. vs_r11 << 1 on a query = the r11 "
            "sweep number was sweep-context/host noise, not a code "
            "regression (no plan in these bands changed between rounds "
            "10 and 11 — verified by the round-11 judge via git diff)."
            % REPEATS
        ),
        "sf": SF_DIR,
        "repeats": REPEATS,
        "queries": per,
    }
    with open(out_path, "w") as f:
        json.dump(artifact, f, indent=1)
    print(f"ABOUT {out_path}", flush=True)


if __name__ == "__main__":
    if "--arm" in sys.argv:
        run_arm()
    else:
        out = (
            sys.argv[sys.argv.index("--out") + 1]
            if "--out" in sys.argv
            else os.path.join(REPO, "BENCH_AB_r12_band.json")
        )
        main(out)
