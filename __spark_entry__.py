"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  : flagship query (TPC-H Q1 pricing summary) on sf0.001.
queries()     : every declared operator from SURVEY.md §2 — one
                callable per QuerySpec in the engine's plan catalog.
oracle_sql()  : matching DuckDB SQL for every SQL-expressible query.

Naming: canonical catalog names (``q01..q108`` as of round-8 end; new
queries append past that), in a round-9 WINDOW order: the driver's
correctness artifact records only the FIRST 50 dict entries, so this
round exposes ``q59..q108`` first (then ``q01..q58``, then anything
past q108) to earn FIRST-EVER driver hash rows for q101-q108 — the
round-8 additions that landed after the round-8 window was fixed and
therefore have local/pytest oracle evidence only.  Names are NOT
aliased — same canonical ``qNN``, same QuerySpec, same oracle; only
dict insertion order moves.  q51-q58 keep fresh round-8 driver rows
and q01-q50 fresh round-7 rows, so nothing loses hard coverage.
Round 10 returns to canonical numeric order (q01 first — refreshing
q36's recalibrated threshold row).  Queries added DURING round 9
(q109+) sort after q108 and are driver-uncovered this round
(CORRECTNESS_local-only), slated for a later window.  The per-round
ledger lives in README §Rotation and the full-catalog artifact is
CORRECTNESS_local_r{N}.json every round.
"""

from __future__ import annotations

import re
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from aws_dla_kinesis_delivery_stream_example_spark.plans import all_specs

# First catalog number of the driver's 50-entry window this round.
# Round 9: 59 (window q59..q108, first driver rows for q101-q108).
# Round 10: set back to 1 (canonical order, q36 row refresh).
_WINDOW_START = 59
_WINDOW_END = _WINDOW_START + 49  # inclusive: exactly 50 entries


def _catalog_order(name: str) -> tuple[int, int, str]:
    """Round-9 window order: q59..q108 first, then q01..q58, then
    q109+ — each block in NUMERIC query order (q2 < q10 < q100, not
    lexicographic; a plain sorted() would slot q100 between q10 and
    q11 and silently evict the window's tail)."""
    m = re.match(r"q(\d+)", name)
    n = int(m.group(1)) if m else 10**9
    in_window = _WINDOW_START <= n <= _WINDOW_END
    return (0 if in_window else 1, n, name)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    specs = all_specs()
    return specs["q01_pricing_summary"].spark(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.

    Insertion order is the round-9 window order (module docstring):
    q59..q108 first, so the driver's 50-entry correctness window is
    pinned to exactly q59..q108 this round, then q01..q58, then any
    round-9 additions (q109+).
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
