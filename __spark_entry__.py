"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  : flagship query (TPC-H Q1 pricing summary) on sf0.001.
queries()     : every declared operator from SURVEY.md §2 — one
                callable per QuerySpec in the engine's plan catalog.
oracle_sql()  : matching DuckDB SQL for every SQL-expressible query.

Naming: canonical catalog names (``q01..q92``), catalog order.  The
rounds-5/6 evidence rotation (``aNN`` aliases reordered to fill the
driver's 50-entry correctness window) is retired: after round 6 every
catalog query carries at least one driver-verified hash row, so the
exposed names are the catalog names again.  Historical ``aNN`` rows in
CORRECTNESS_r0{5,6}.json map back to catalog ``qNN`` by stripping the
prefix letter; the per-round ledger lives in README §Rotation and the
full-catalog artifact is CORRECTNESS_local_r{N}.json every round.
"""

from __future__ import annotations

import re
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from aws_dla_kinesis_delivery_stream_example_spark.plans import all_specs


def _catalog_order(name: str) -> tuple[int, str]:
    """NUMERIC query order (q2 < q10 < q100), not lexicographic — a
    plain sorted() would slot a future q100 between q10 and q11 and
    silently push q50 out of the driver's 50-entry window."""
    m = re.match(r"q(\d+)", name)
    return (int(m.group(1)) if m else 10**9, name)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    specs = all_specs()
    return specs["q01_pricing_summary"].spark(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.

    Sorted by canonical query NUMBER so insertion order is q01..qNN —
    the driver's correctness window records the first 50 dict entries,
    which this ordering pins to exactly q01..q50 every round, even
    once the catalog passes q99.
    """
    specs = all_specs()
    return {
        name: specs[name].spark for name in sorted(specs, key=_catalog_order)
    }


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL per query (omitted => rows-only check)."""
    specs = all_specs()
    return {
        name: specs[name].oracle
        for name in sorted(specs, key=_catalog_order)
        if specs[name].oracle is not None
    }
