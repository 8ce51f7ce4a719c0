#!/usr/bin/env python
"""Controlled A/B for the round-6 delivery-throughput drift and the
streaming-drain regressions (VERDICT r06 "What's wrong" #3 and "Next
round" #5/#6).

Round 5 -> 6 moved delivery 100,184.9 -> 84,768.6 rec/s (-15%) and the
four RocksDB-backed micro-batch drains (q50/q73/q83/q91) +8-35%, with
no controlled evidence for either. Protocol (same as BENCH_AB_r06):
two FRESH processes on the same machine — default RocksDB state store
vs SPARK_GRAFT_STATE_STORE=hdfs — each measuring

  - delivery throughput: best-of-3 end-to-end runs (bench.py's
    estimator: first run pays streaming codegen/startup), and
  - the four drains: min-of-3 each at sf0.1.

Usage:
  python scripts/ab_delivery.py            # run BOTH arms, write out
  python scripts/ab_delivery.py --arm      # run ONE arm (this process)
  python scripts/ab_delivery.py --out F    # artifact path (with both)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

DRAINS = (
    "q50_streaming_tumbling",
    "q73_streaming_interval_join",
    "q83_streaming_curation",
    "q91_streaming_stateful_totals",
)
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPEATS = 3


def run_arm() -> None:
    """One arm, one fresh process: emits ABJSON {...} on stdout."""
    from aws_dla_kinesis_delivery_stream_example_spark.operators.staging import (
        release_staging,
    )
    from aws_dla_kinesis_delivery_stream_example_spark.plans import all_specs
    from aws_dla_kinesis_delivery_stream_example_spark.session import get_spark

    import bench

    spark = get_spark(app_name="ab-delivery")
    specs = all_specs()
    # warm-up: touch the event table the drains read
    from aws_dla_kinesis_delivery_stream_example_spark.sources.tables import load_table

    load_table(spark, SF_DIR, "events").count()

    drains: dict[str, float] = {}
    for name in DRAINS:
        best = None
        for _ in range(REPEATS):
            t0 = time.perf_counter()
            specs[name].spark(spark, SF_DIR).collect()
            took = time.perf_counter() - t0
            best = took if best is None else min(best, took)
            release_staging()
            spark.catalog.clearCache()
            spark._jvm.System.gc()
        drains[name] = round(best, 3)

    tps = max(bench.bench_delivery(spark) for _ in range(REPEATS))
    print(
        "ABJSON "
        + json.dumps(
            {
                "state_store": bench._state_store_label(),
                "delivery_rec_per_s": tps,
                "drains": drains,
                "sf": SF_DIR,
                "repeats": REPEATS,
            }
        ),
        flush=True,
    )


def run_both(out_path: str) -> None:
    arms = {}
    for store, env_val in (("rocksdb", None), ("hdfs", "hdfs")):
        env = dict(os.environ)
        env.pop("SPARK_GRAFT_STATE_STORE", None)
        if env_val:
            env["SPARK_GRAFT_STATE_STORE"] = env_val
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--arm"],
            env=env,
            capture_output=True,
            text=True,
            cwd=REPO,
            timeout=3600,
        )
        line = next(
            (ln for ln in proc.stdout.splitlines() if ln.startswith("ABJSON ")), None
        )
        if line is None:
            raise RuntimeError(
                f"arm {store} produced no ABJSON; stderr tail: {proc.stderr[-2000:]}"
            )
        arm = json.loads(line[len("ABJSON "):])
        assert arm["state_store"] == store, (arm["state_store"], store)
        arms[store] = arm
        print(f"ARM {store} done: {arm['delivery_rec_per_s']} rec/s", flush=True)

    artifact = {
        "purpose": (
            "Controlled A/B for the round-6 delivery-throughput drift "
            "(100,184.9 -> 84,768.6 rec/s r5->r6) and the four streaming-"
            "drain regressions (q50/q73/q83/q91, +8-35%): same machine, "
            "same code, two fresh processes — default RocksDB state store "
            "vs SPARK_GRAFT_STATE_STORE=hdfs; delivery best-of-3, drains "
            "min-of-3 at sf0.1."
        ),
        "reference": {
            "delivery_rec_per_s": {"round4": 95_629.0, "round5": 100_184.9, "round6": 84_768.6},
            "drains_round5": {
                "q50_streaming_tumbling": 1.21,
                "q73_streaming_interval_join": 2.72,
                "q83_streaming_curation": 0.964,
                "q91_streaming_stateful_totals": 1.72,
            },
            "drains_round6": {
                "q50_streaming_tumbling": 1.483,
                "q73_streaming_interval_join": 2.989,
                "q83_streaming_curation": 1.298,
                "q91_streaming_stateful_totals": 1.866,
            },
        },
        "rocksdb": arms["rocksdb"],
        "hdfs": arms["hdfs"],
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
            else os.path.join(REPO, "BENCH_AB_r07.json")
        )
        run_both(out)
