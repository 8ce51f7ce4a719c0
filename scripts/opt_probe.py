#!/usr/bin/env python
"""Round-17 optimization probe: time, explain, and oracle-check
individual catalog queries without paying for a full sweep.

Usage:
  python scripts/opt_probe.py time q107 q95 [--repeats 3] [--sf /root/testdata/sf0.1]
  python scripts/opt_probe.py plan q107 --out plans/r17/q107_before.txt
  python scripts/opt_probe.py check q107 [--sf /root/testdata/sf0.01]

`time` mirrors bench.py's methodology exactly (min-of-N collect on
get_spark's session, release_staging + clearCache + System.gc between
repeats) so numbers are comparable with bench_full.json. `plan` writes
`df.explain("formatted")` output. `check` runs the DuckDB oracle
comparison from tests/oracle_utils.compare.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from aws_dla_kinesis_delivery_stream_example_spark.operators.staging import (  # noqa: E402
    release_staging,
)
from aws_dla_kinesis_delivery_stream_example_spark.plans import all_specs  # noqa: E402
from aws_dla_kinesis_delivery_stream_example_spark.session import get_spark  # noqa: E402


def _resolve(names: list[str]) -> list[str]:
    """Exact catalog names or ``qNN`` prefixes only (round-17 advisor:
    the old bare-prefix fallback expanded 'q1' to every q1xx query and
    attributed the ledger numbers to the wrong selector)."""
    specs = all_specs()
    out = []
    for n in names:
        hits = sorted(k for k in specs if k == n or k.startswith(n + "_"))
        if not hits:
            raise SystemExit(
                f"no catalog query matches {n!r} (use the exact name or its qNN prefix)"
            )
        if len(hits) > 1:
            raise SystemExit(f"ambiguous selector {n!r}: {hits}")
        out.extend(hits)
    return out


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("mode", choices=["time", "plan", "check", "profile"])
    p.add_argument("names", nargs="+")
    p.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    p.add_argument("--repeats", type=int, default=3)
    p.add_argument("--out", default=None)
    args = p.parse_args()

    specs = all_specs()
    names = _resolve(args.names)
    spark = get_spark(app_name=f"opt_probe_{args.mode}")

    if args.mode == "time":
        # warm tables like bench.py does
        from aws_dla_kinesis_delivery_stream_example_spark.sources.tables import (
            TABLES,
            load_table,
        )

        for t in TABLES:
            load_table(spark, args.sf, t).count()
        for name in names:
            best = None
            for _ in range(args.repeats):
                t0 = time.perf_counter()
                specs[name].spark(spark, args.sf).collect()
                took = time.perf_counter() - t0
                best = took if best is None else min(best, took)
                release_staging()
                spark.catalog.clearCache()
                spark._jvm.System.gc()
            print(f"TIME {name} {best:.3f}", flush=True)
    elif args.mode == "profile":
        # Job/stage/task census for one warm run: where the fixed
        # costs are (how many jobs a query launches, how many stages
        # and tasks each runs) — the local-mode proxy for the UI's
        # Jobs page, since spark.ui is disabled in this sandbox.
        from aws_dla_kinesis_delivery_stream_example_spark.sources.tables import (
            TABLES,
            load_table,
        )

        for t in TABLES:
            load_table(spark, args.sf, t).count()
        sc = spark.sparkContext
        for name in names:
            # warm run (codegen/caches), then the measured run
            specs[name].spark(spark, args.sf).collect()
            release_staging()
            spark.catalog.clearCache()
            group = f"prof_{name}"
            sc.setJobGroup(group, name)
            t0 = time.perf_counter()
            specs[name].spark(spark, args.sf).collect()
            took = time.perf_counter() - t0
            sc.setJobGroup(None, None)
            st = sc.statusTracker()
            jobs = st.getJobIdsForGroup(group)
            n_stages = 0
            n_tasks = 0
            for j in jobs:
                ji = st.getJobInfo(j)
                if ji is None:
                    continue
                for s in ji.stageIds:
                    si = st.getStageInfo(s)
                    if si is not None:
                        n_stages += 1
                        n_tasks += si.numTasks
            print(
                f"PROFILE {name} {took:.3f}s jobs={len(jobs)} "
                f"stages={n_stages} tasks={n_tasks}",
                flush=True,
            )
            release_staging()
            spark.catalog.clearCache()
            spark._jvm.System.gc()
    elif args.mode == "plan":
        for name in names:
            df = specs[name].spark(spark, args.sf)
            txt = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            release_staging()
            spark.catalog.clearCache()
            if args.out:
                with open(args.out, "w") as f:
                    f.write(txt)
                print(f"PLAN {name} -> {args.out} ({txt.count('Exchange')} Exchange refs)")
            else:
                print(f"===== {name} =====\n{txt}")
    else:
        from tests.oracle_utils import compare

        for name in names:
            df = specs[name].spark(spark, args.sf)
            oracle = specs[name].oracle
            if not oracle:
                print(f"CHECK {name} no_oracle rows={df.count()}")
            else:
                ok, msg = compare(df, oracle, args.sf)
                print(f"CHECK {name} {'OK' if ok else 'FAIL ' + str(msg)[:300]}")
            release_staging()
            spark.catalog.clearCache()


if __name__ == "__main__":
    main()
