"""Mechanical freeze guard (round-12 verdict Next #2).

Three consecutive rounds leaked the newest catalog addition past the
artifact freeze (q131 in round 10, q135 in round 11, q138 in round 12
— the last one landed BROKEN, with two missing imports, in the
end-of-round snapshot commit). Discipline did not hold; this test
makes the freeze rule mechanical:

1. `CATALOG_EXTENT` (plans/catalog.py) must equal `len(all_specs())`
   AND the max qNN AND the contiguous range 1..N — a query added
   without bumping the constant fails collection-fast, with no Spark
   session.
2. The NEWEST committed `CORRECTNESS_local_r{N}*.json` artifacts must
   record that same extent in `_meta.catalog_extent` and carry exactly
   one row per catalog query — bumping the constant without
   regenerating the full-catalog artifacts (i.e. adding a query after
   the freeze) fails here too. This is the check that would have
   caught all three historical leaks.

No SparkSession anywhere in this module: it must run in seconds so it
is never skipped.
"""

from __future__ import annotations

import json
import os
import re

from aws_dla_kinesis_delivery_stream_example_spark.plans import (
    CATALOG_EXTENT,
    all_specs,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _qnum(name: str) -> int:
    m = re.match(r"q(\d+)_", name)
    assert m, f"non-canonical catalog name: {name!r}"
    return int(m.group(1))


def test_catalog_matches_declared_extent():
    specs = all_specs()
    nums = sorted(_qnum(n) for n in specs)
    assert len(specs) == CATALOG_EXTENT, (
        f"{len(specs)} registered specs but CATALOG_EXTENT={CATALOG_EXTENT} — "
        "a catalog change must bump the constant in the same commit"
    )
    assert nums == list(range(1, CATALOG_EXTENT + 1)), (
        "catalog numbers are not the contiguous range "
        f"1..{CATALOG_EXTENT}: {sorted(set(range(1, CATALOG_EXTENT + 1)) - set(nums))} "
        f"missing, {sorted(set(nums) - set(range(1, CATALOG_EXTENT + 1)))} extra"
    )


def _newest_local_artifacts() -> list[str]:
    """All committed CORRECTNESS_local files of the HIGHEST round
    number present (e.g. r13 + r13_sf01)."""
    pat = re.compile(r"CORRECTNESS_local_r(\d+)\w*\.json$")
    rounds: dict[int, list[str]] = {}
    for f in os.listdir(REPO):
        m = pat.match(f)
        if m:
            rounds.setdefault(int(m.group(1)), []).append(f)
    assert rounds, "no CORRECTNESS_local_r*.json artifacts committed"
    return sorted(rounds[max(rounds)])


def test_newest_local_artifacts_cover_full_extent():
    """The freeze rule itself: the newest full-catalog artifacts must
    have been regenerated AFTER the last catalog change — enforced by
    requiring them to declare the current extent and contain exactly
    one row per catalog query."""
    spec_names = set(all_specs())
    for fname in _newest_local_artifacts():
        with open(os.path.join(REPO, fname)) as fh:
            report = json.load(fh)
        meta = report.get("_meta", {})
        assert meta.get("catalog_extent") == CATALOG_EXTENT, (
            f"{fname}: _meta.catalog_extent={meta.get('catalog_extent')!r} "
            f"!= CATALOG_EXTENT={CATALOG_EXTENT} — regenerate the "
            "full-catalog local artifacts after the last catalog change"
        )
        rows = set(report) - {"_meta"}
        assert rows == spec_names, (
            f"{fname}: artifact rows diverge from the catalog — "
            f"missing {sorted(spec_names - rows)[:5]}, "
            f"extra {sorted(rows - spec_names)[:5]}"
        )
        bad = sorted(
            n for n in rows
            if not (report[n].get("hash_match") and report[n].get("rows_match"))
        )
        assert bad == [], f"{fname}: non-green rows {bad[:10]}"
