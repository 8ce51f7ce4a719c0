#!/usr/bin/env python
"""Pinned-load delivery bench (round-9 verdict "Next round" #6).

The fresh-process delivery band reached 69.9k-99.4k rec/s (42%) on
identical code (BENCH_AB_r09.json) — wide enough to hide a real 20%
regression. This mode removes every load-shape degree of freedom the
harness controls and uses robust estimators for the rest:

- ONE shared input, generated once per invocation: N_RECORDS
  deterministic bank-account records (sources/jsonlines.py generator —
  id-hash content, no RNG) in exactly N_FILES json files. Every
  process reads the same bytes.
- Fixed trigger count: ``max_files_per_trigger = N_FILES //
  N_TRIGGERS`` => exactly N_TRIGGERS micro-batches per drain, every
  run (availableNow with no cap admits all files in one batch whose
  size then depends on file-listing order).
- Per process: one warm-up drain (pays streaming codegen/startup —
  observed 22k cold vs 80k warm), then MEASURED_RUNS measured drains,
  each against a fresh dest+checkpoint; the process reports the
  MEDIAN (not max: max rewards one lucky GC window, the exact noise
  this mode exists to remove).
- Per run: PROCESSES fresh processes, sequential (never concurrent —
  contention is the other documented variance source); run value =
  median of the process medians.
- Artifact: TWO runs back-to-back on identical code + the relative
  band |a-b| / mean. Acceptance: band <= 0.10.

Usage:
  python scripts/pinned_delivery.py                 # both runs -> BENCH_AB_r10.json
  python scripts/pinned_delivery.py --out FILE
  python scripts/pinned_delivery.py --arm SRC_DIR   # one process (internal)
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_RECORDS = 400_000
N_FILES = 10
N_TRIGGERS = 5  # max_files_per_trigger = 2 -> exactly 5 micro-batches
MEASURED_RUNS = 3
PROCESSES = 5


def _drain_once(spark, src: str, base: str, tag: str) -> float:
    from aws_dla_kinesis_delivery_stream_example_spark.streaming.delivery import (
        DeliveryPipeline,
    )

    dest = os.path.join(base, f"dest_{tag}")
    pipe = DeliveryPipeline(
        spark,
        src,
        dest,
        document_sink=True,
        max_files_per_trigger=N_FILES // N_TRIGGERS,
    )
    t0 = time.perf_counter()
    pipe.run()
    elapsed = time.perf_counter() - t0
    assert pipe.result.n_input == N_RECORDS, "pinned delivery lost records"
    assert pipe.result.reconciled()
    assert pipe.result.n_batches == N_TRIGGERS, (
        f"trigger count not pinned: {pipe.result.n_batches} != {N_TRIGGERS}"
    )
    shutil.rmtree(dest, ignore_errors=True)
    return N_RECORDS / elapsed


def run_arm(src: str) -> None:
    from aws_dla_kinesis_delivery_stream_example_spark.session import get_spark

    spark = get_spark(app_name="pinned-delivery")
    base = tempfile.mkdtemp(prefix="pinned_delivery_")
    try:
        _drain_once(spark, src, base, "warmup")
        rates = [
            _drain_once(spark, src, base, f"m{i}") for i in range(MEASURED_RUNS)
        ]
    finally:
        shutil.rmtree(base, ignore_errors=True)
    print(
        "ABJSON "
        + json.dumps(
            {
                "median_rec_per_s": round(statistics.median(rates), 1),
                "measured": [round(r, 1) for r in rates],
            }
        ),
        flush=True,
    )


def _one_process(src: str) -> dict:
    proc = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--arm", src],
        capture_output=True,
        text=True,
        cwd=REPO,
        timeout=1800,
    )
    line = next(
        (ln for ln in proc.stdout.splitlines() if ln.startswith("ABJSON ")), None
    )
    if line is None:
        raise RuntimeError(
            f"pinned arm produced no ABJSON; stderr tail: {proc.stderr[-2000:]}"
        )
    return json.loads(line[len("ABJSON "):])


def run_pinned(out_path: str) -> None:
    src_base = tempfile.mkdtemp(prefix="pinned_delivery_src_")
    src = os.path.join(src_base, "src")
    try:
        # Generate the shared input once, in its own short-lived process
        # so the orchestrator never holds a SparkSession while arms run.
        gen = (
            "import sys; sys.path.insert(0, %r); "
            "from aws_dla_kinesis_delivery_stream_example_spark.session import get_spark; "
            "from aws_dla_kinesis_delivery_stream_example_spark.sources.jsonlines import "
            "generate_bank_accounts, produce_jsonlines; "
            "spark = get_spark(app_name='pinned-gen'); "
            "produce_jsonlines(generate_bank_accounts(spark, %d, partitions=%d), %r); "
            "spark.stop()" % (REPO, N_RECORDS, N_FILES, src)
        )
        subprocess.run(
            [sys.executable, "-c", gen], check=True, cwd=REPO, timeout=600,
            capture_output=True,
        )
        n_files = len([f for f in os.listdir(src) if f.endswith(".json")])
        assert n_files == N_FILES, f"input not pinned: {n_files} files"

        runs = []
        for run_idx in (1, 2):
            arms = []
            for p in range(PROCESSES):
                arm = _one_process(src)
                arms.append(arm)
                print(
                    f"RUN{run_idx} proc {p + 1}/{PROCESSES}: "
                    f"{arm['median_rec_per_s']} rec/s",
                    flush=True,
                )
            med = statistics.median(a["median_rec_per_s"] for a in arms)
            runs.append({"median_of_processes_rec_per_s": round(med, 1), "processes": arms})
        a, b = (r["median_of_processes_rec_per_s"] for r in runs)
        band = abs(a - b) / ((a + b) / 2)
        artifact = {
            "purpose": (
                "Pinned-load delivery bench (round-9 verdict Next #6): the "
                "fresh-process band hit 69.9k-99.4k rec/s (42%) on identical "
                "code, wide enough to hide a real 20% regression. Load shape "
                "pinned (shared deterministic input, fixed file count, fixed "
                "trigger count via maxFilesPerTrigger), estimator robust "
                f"(per-process median-of-{MEASURED_RUNS} after warm-up, "
                f"per-run median-of-{PROCESSES} sequential fresh processes). "
                "Two same-code runs; acceptance band <= 0.10."
            ),
            "config": {
                "n_records": N_RECORDS,
                "n_files": N_FILES,
                "n_triggers": N_TRIGGERS,
                "measured_runs_per_process": MEASURED_RUNS,
                "processes_per_run": PROCESSES,
            },
            "run1": runs[0],
            "run2": runs[1],
            "relative_band": round(band, 4),
            "band_ok": band <= 0.10,
        }
        with open(out_path, "w") as f:
            json.dump(artifact, f, indent=1)
        print(f"ABOUT {out_path} band={band:.4f} ok={band <= 0.10}", flush=True)
    finally:
        shutil.rmtree(src_base, ignore_errors=True)


if __name__ == "__main__":
    if "--arm" in sys.argv:
        run_arm(sys.argv[sys.argv.index("--arm") + 1])
    else:
        out = (
            sys.argv[sys.argv.index("--out") + 1]
            if "--out" in sys.argv
            else os.path.join(REPO, "BENCH_AB_r10.json")
        )
        run_pinned(out)
