"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  : flagship query (TPC-H Q1 pricing summary) on sf0.001.
queries()     : every declared operator from SURVEY.md §2 — one
                callable per QuerySpec in the engine's plan catalog.
oracle_sql()  : matching DuckDB SQL for every SQL-expressible query.

Naming: canonical catalog names (``q01..q162`` as of round-17),
in a round-17 WINDOW order: the driver's correctness artifact
records only the FIRST 50 dict entries, so this round exposes the
round-17 additions ``q159..q162`` first (mid-round additions seat
FIRST when they land — the round-8 principle: never-verified beats
stale-but-verified), then ``q123..q126 + q136..q139 + q32..q35 +
q48..q58 + q77..q95 + q127..q130`` — the round-16 verdict's Next
#1 (retire the eight remaining r13 rows, refresh the oldest r14
block) minus the four tail seats the additions displaced:
``q131 + q140..q142`` keep their r14 rows and roll to round 18
per the standing precedent.  Names are NOT aliased — same
canonical ``qNN``, same QuerySpec, same oracle; only dict
insertion order moves.  Everything outside the window carries
r14/r15 rows, so nothing loses hard coverage.  The per-round
ledger lives in README §Rotation and the full-catalog artifact is
CORRECTNESS_local_r{N}.json every round.
"""

from __future__ import annotations

import re
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from aws_dla_kinesis_delivery_stream_example_spark.plans import all_specs

# The driver's 50-entry window this round, as an EXPLICIT ordered list
# of catalog numbers (round 17; round-16 verdict "Next round #1"):
# the round-17 additions q159..q162 seat FIRST (never-driver-verified
# beats stale-but-verified — the standing precedent), then
# q123..q126 (displaced from the round-16 window, the oldest r13
# rows) + q136..q139 (the other four r13 rows) + the oldest r14
# block q32..q35 + q48..q58 + q77..q95 + q127..q130.
# The displaced tail (q131, q140..q142) rolls to round 18.  Exactly
# 50 entries.
_WINDOW: list[int] = (
    list(range(159, 163))
    + list(range(123, 127))
    + list(range(136, 140))
    + list(range(32, 36))
    + list(range(48, 59))
    + list(range(77, 96))
    + list(range(127, 131))
)
assert len(_WINDOW) == 50
_WINDOW_POS = {n: i for i, n in enumerate(_WINDOW)}


def _catalog_order(name: str) -> tuple[int, int, str]:
    """Round-17 window order: the explicit ``_WINDOW`` list first (in
    list position, NOT numeric order), then everything else in
    NUMERIC query order (q2 < q10 < q100, not lexicographic; a plain
    sorted() would slot q100 between q10 and q11).  Mid-round catalog
    additions seat at the FRONT of ``_WINDOW`` explicitly when they
    land; an addition not yet seated sorts after the window."""
    m = re.match(r"q(\d+)", name)
    n = int(m.group(1)) if m else 10**9
    if n in _WINDOW_POS:
        return (0, _WINDOW_POS[n], name)
    return (1, n, name)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    specs = all_specs()
    return specs["q01_pricing_summary"].spark(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.

    Insertion order is the round-17 window order (module docstring):
    q159..q162 (the round-17 additions) + q123..q126 + q136..q139 +
    q32..q35 + q48..q58 + q77..q95 + q127..q130 first, so the
    driver's 50-entry correctness window gives the additions their
    first driver rows, retires all eight remaining r13 rows, and
    refreshes the oldest r14 block minus the displaced tail; then
    the rest of the catalog in numeric order.
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
