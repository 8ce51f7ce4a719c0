#!/usr/bin/env python
"""Full-catalog driver-contract rehearsal (the local mirror of the
external driver's t2 correctness gate).

Loads `__spark_entry__.py` exactly the way the driver does (fresh
module, DRIVER-BUILT SparkSession — none of get_spark's configs), runs
`entry()` (t1 smoke) and then EVERY `queries()` entry at sf0.01,
comparing against the DuckDB `oracle_sql()` where one exists. Entries
without an oracle record rows-only. Writes one JSON file compatible
with the driver's CORRECTNESS_r{N}.json shape.

Usage: python scripts/t2_rehearsal.py [out.json] [sf_dir]
"""

from __future__ import annotations

import importlib.util
import json
import os
import sys
import time
import traceback

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(REPO, "CORRECTNESS_local.json")
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"

    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", os.path.join(REPO, "__spark_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )

    # t1 smoke: entry() must run and return >= 0 rows on a driver session
    t0 = time.perf_counter()
    n = len(mod.entry(spark).collect())
    print(f"RESULT t1_smoke rows={n} sec={time.perf_counter() - t0:.2f}", flush=True)

    from tests.oracle_utils import compare

    qs, osql = mod.queries(), mod.oracle_sql()
    report: dict[str, dict] = {}
    n_pass = n_rows_only = n_fail = 0
    for name, fn in qs.items():
        t0 = time.perf_counter()
        entry: dict = {
            "rows_match": None, "schema_match": None, "hash_match": None,
            "spark_rows": None, "oracle_rows": None, "err": None,
        }
        try:
            df = fn(spark, sf_dir)
            if name in osql:
                ok, msg = compare(df, osql[name], sf_dir)
                entry["spark_rows"] = df.count()
                entry["rows_match"] = entry["schema_match"] = entry["hash_match"] = ok
                if ok:
                    entry["oracle_rows"] = entry["spark_rows"]
                    n_pass += 1
                else:
                    entry["err"] = msg
                    n_fail += 1
            else:
                entry["spark_rows"] = df.count()
                entry["err"] = "no_oracle"
                n_rows_only += 1
        except Exception:
            entry["err"] = traceback.format_exc(limit=3)
            n_fail += 1
        finally:
            # operator-internal persists (staging tables) are per-query
            # scratch; don't let 80 queries' worth accumulate
            from aws_dla_kinesis_delivery_stream_example_spark.operators.staging import (
                release_staging,
                staged_elsewhere,
            )

            release_staging()
            # single-threaded loop: a frame still counted as staged on
            # another thread is a cross-thread staging leak — fail the
            # artifact run loudly instead of accruing cache. Checked
            # BEFORE clearCache(): the advisory counter over-reports
            # after a clearCache (staging.py), so asserting after
            # would fire only post-remediation and then poison every
            # later query in the sweep.
            leaked = staged_elsewhere()
            assert leaked == 0, (
                f"{name}: {leaked} staged frame(s) leaked across threads"
            )
            spark.catalog.clearCache()
        status = "FAIL" if entry["err"] and entry["err"] != "no_oracle" else (
            "rows-only" if entry["err"] == "no_oracle" else "ok")
        print(
            f"RESULT {name} {status} rows={entry['spark_rows']} "
            f"sec={time.perf_counter() - t0:.2f}",
            flush=True,
        )
        report[name] = entry

    # Provenance (VERDICT r03 #5): local evidence silently went stale
    # when the driver regenerated events.parquet mid-round. Stamp the
    # artifact with the data it actually ran against so staleness is
    # detectable: events schema + mtime + run time.
    # provenance must never cost the report itself: if the schema read
    # fails (testdata regenerating mid-run — the very scenario _meta
    # detects), record the error and still write every query result
    try:
        import pyarrow.parquet as _pq

        ev_path = os.path.join(sf_dir, "events.parquet")
        # ADVICE r05: the alias->catalog map must live in the artifact
        # itself, not only in README prose — record every exposed name
        # that differs from its catalog name.
        from aws_dla_kinesis_delivery_stream_example_spark.plans import all_specs

        # Rotation retired in round 7: exposed names ARE catalog names.
        # Assert that invariant (fails into _meta.err if it regresses)
        # and record an empty map so the artifact states it explicitly.
        exposed = set(mod.queries())
        assert exposed == set(all_specs()), (
            "exposed names diverge from catalog names: "
            f"{sorted(exposed ^ set(all_specs()))[:5]}"
        )
        alias_map: dict[str, str] = {}
        # Round-8 window shift: record the driver-visible window (the
        # first 50 exposed names) so the artifact states which catalog
        # queries carry driver rows this round without README archaeology.
        window_first_50 = list(mod.queries())[:50]
        # Round-13 freeze guard: the artifact must declare the catalog
        # extent it ran against; tests/test_catalog_extent.py pins the
        # newest committed artifact's extent to plans.CATALOG_EXTENT,
        # so a post-freeze catalog addition fails pytest mechanically.
        from aws_dla_kinesis_delivery_stream_example_spark.plans import (
            CATALOG_EXTENT,
        )

        assert len(all_specs()) == CATALOG_EXTENT
        report["_meta"] = {
            "sf_dir": sf_dir,
            "catalog_extent": CATALOG_EXTENT,
            "alias_to_catalog": alias_map,
            "driver_window_first_50": window_first_50,
            "generated_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
            "events_mtime": time.strftime(
                "%Y-%m-%dT%H:%M:%SZ", time.gmtime(os.path.getmtime(ev_path))
            ),
            "events_schema": {
                f.name: str(f.type) for f in _pq.read_schema(ev_path)
            },
        }
    except Exception as exc:  # noqa: BLE001
        report["_meta"] = {"sf_dir": sf_dir, "err": f"{type(exc).__name__}: {exc}"[:300]}
    with open(out_path, "w") as f:
        json.dump(report, f, indent=2)
    print(
        f"RESULT summary total={len(qs)} pass={n_pass} rows_only={n_rows_only} "
        f"fail={n_fail} -> {out_path}",
        flush=True,
    )
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
