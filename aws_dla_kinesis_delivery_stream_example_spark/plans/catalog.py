"""Query catalog: every declared operator (SURVEY.md §2) is one
``QuerySpec`` — a Spark implementation plus, where SQL-expressible, an
equivalent ANSI-SQL oracle that DuckDB runs over the same parquet
tables.

Determinism contract (FIXTURES.md): every query ends with a total
ORDER BY on a unique key combination; DOUBLE aggregates are rounded to
a fixed precision; timestamps are emitted as formatted UTC strings;
integer aggregates are cast to BIGINT on both sides (DuckDB sums of
INTEGER widen to HUGEINT otherwise). Column names are aliased
identically in the Spark code and the oracle SQL.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    name: str
    description: str
    spark: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB SQL; None => rows-only check (non-SQL op)
    tags: tuple[str, ...] = field(default_factory=tuple)


REGISTRY: dict[str, QuerySpec] = {}

# Mechanical freeze guard (round-12 verdict Next #2). Three consecutive
# rounds leaked the newest catalog addition past the artifact freeze
# (q131 -> r10, q135 -> r11, q138 -> r12 — the last one BROKEN);
# discipline failed, so the rule is now a test: adding a query without
# bumping this constant fails `tests/test_catalog_extent.py` in
# seconds, and the same test requires the newest committed
# CORRECTNESS_local_r{N}*.json `_meta.catalog_extent` to equal it, so
# bumping the constant without regenerating the full-catalog artifacts
# fails too. One commit = constant bump + query + evidence.
CATALOG_EXTENT = 162


def query(name: str, oracle: str | None, description: str = "", tags: tuple[str, ...] = ()):
    """Decorator registering a (spark_fn, oracle_sql) pair under ``name``."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = QuerySpec(
            name=name,
            description=description or (fn.__doc__ or "").strip().splitlines()[0] if fn.__doc__ else description,
            spark=fn,
            oracle=oracle,
            tags=tags,
        )
        return fn

    return deco


def all_specs() -> dict[str, QuerySpec]:
    return dict(REGISTRY)
