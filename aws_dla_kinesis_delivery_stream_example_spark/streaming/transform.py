"""The per-record transform protocol (SURVEY.md §2.2 T1-T6, §2.3 F1-F2).

Reference semantics reproduced (kds_example/kds_helper.py:29-63):
- transform returns a dict        -> status "OK", payload = transformed
- transform raises DropIt         -> status "Dropped" (filtered from sink)
- transform raises anything else  -> status "ProcessingFailed", payload =
  the ORIGINAL record (error sink gets the untouched input,
  kds_example/kds_helper.py:49-51)
- recordId is echoed through unchanged (T6, kds_example/lbd/common.py:24-25)

Two execution paths:
- declarative transforms (Column -> Column): stay fully JVM-side,
  whole-stage codegen — the fast path.
- black-box dict->dict Python transforms (the reference's actual
  extension hook, kds_example/lbd/to_s3.py:6-7): Arrow-batched pandas
  UDF over the JSON string column. Row-at-a-time Python is never used.
"""

from __future__ import annotations

import json
from collections.abc import Callable

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

STATUS_OK = "OK"
STATUS_DROPPED = "Dropped"
STATUS_FAILED = "ProcessingFailed"


class DropIt(Exception):
    """Raise inside a transform to mark the record Dropped
    (reference kds_example/kds_helper.py:26)."""


class TransformRegistry:
    """Named transform registry (T5 parity: the reference registers
    Lambdas by name, lambda_app/app.py:15-22)."""

    def __init__(self) -> None:
        self._fns: dict[str, Callable[[dict], dict]] = {}

    def register(self, name: str, fn: Callable[[dict], dict] | None = None):
        if fn is not None:
            self._fns[name] = fn
            return fn

        def deco(f: Callable[[dict], dict]):
            self._fns[name] = f
            return f

        return deco

    def get(self, name: str) -> Callable[[dict], dict]:
        return self._fns[name]

    def names(self) -> list[str]:
        return sorted(self._fns)


registry = TransformRegistry()


@registry.register("identity")
def identity_transform(dct: dict) -> dict:
    """T3/T4 parity: the reference's only concrete transform is a
    passthrough (kds_example/lbd/to_s3.py:6-7)."""
    return dct


_RESULT_SCHEMA = T.StructType(
    [
        T.StructField("payload", T.StringType(), True),
        T.StructField("status", T.StringType(), False),
    ]
)


def transform_udf(fn: Callable[[dict], dict]):
    """Wrap a black-box dict->dict transform as an Arrow-batched pandas
    UDF producing struct(payload json-string, status)."""

    def run(lines: pd.Series) -> pd.DataFrame:
        import json as _json

        import pandas as _pd

        payloads, statuses = [], []
        for line in lines:
            try:
                out = fn(_json.loads(line))
                payloads.append(_json.dumps(out, ensure_ascii=False))
                statuses.append("OK")
            except Exception as exc:
                # Match DropIt by name so the worker doesn't need this
                # module importable (the closure stays self-contained).
                if type(exc).__name__ == "DropIt":
                    payloads.append(None)
                    statuses.append("Dropped")
                else:
                    # ProcessingFailed keeps the ORIGINAL payload
                    # (reference kds_example/kds_helper.py:49-51).
                    payloads.append(line)
                    statuses.append("ProcessingFailed")
        return _pd.DataFrame({"payload": payloads, "status": statuses})

    return F.pandas_udf(run, returnType=_RESULT_SCHEMA)


def apply_transform(
    df: DataFrame,
    fn: Callable[[dict], dict] | None = None,
    json_col: str = "json_line",
    declarative: dict[str, Column] | None = None,
    drop_when: Column | None = None,
    fail_when: Column | None = None,
) -> DataFrame:
    """Produce df + (payload, status) columns.

    Declarative mode (preferred): pass Column expressions; stays JVM-side.
    Black-box mode: pass ``fn`` and the transform runs as a pandas UDF
    over ``json_col``.
    """
    if fn is not None:
        res = transform_udf(fn)(F.col(json_col))
        return df.withColumn("payload", res["payload"]).withColumn("status", res["status"])
    # FAILED outranks DROPPED when both predicates hold: in the
    # reference Lambda, json.loads raises BEFORE any DropIt can be
    # evaluated, so a record that is both undecodable and drop-matched
    # must route to ProcessingFailed (original payload preserved for
    # the error sink), never silently to Dropped — a drop predicate
    # over all-null decoded fields would otherwise reclassify decode
    # failures. Hence fail_when wraps LAST (checked first).
    status = F.lit(STATUS_OK)
    if drop_when is not None:
        status = F.when(drop_when, STATUS_DROPPED).otherwise(status)
    if fail_when is not None:
        status = F.when(fail_when, STATUS_FAILED).otherwise(status)
    out = df
    for name, col in (declarative or {}).items():
        out = out.withColumn(name, col)
    return out.withColumn("status", status)
