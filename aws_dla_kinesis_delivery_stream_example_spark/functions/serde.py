"""Serde column expressions (SURVEY.md §2.6, D1/D2).

Reference behavior being reproduced (cited for parity checks):
- decode: base64 -> utf-8 -> json.loads
  (reference kds_example/lbd/common.py:14-18, kds_example/kds_helper.py:36-40)
- encode: json.dumps(ensure_ascii=False) + "\\n" -> utf-8 -> base64
  (reference kds_example/kds_helper.py:15, kds_example/lbd/common.py:27-30)

Spark's `to_json` emits raw UTF-8 (not \\uXXXX escapes), matching
``ensure_ascii=False``. Both directions are pure built-ins, codegen'd.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

# The reference's canonical payload (SURVEY.md §1.2 bank_account).
BANK_ACCOUNT_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType(), True),
        T.StructField("firstname", T.StringType(), True),
        T.StructField("lastname", T.StringType(), True),
        T.StructField("description", T.StringType(), True),
        T.StructField("balance", T.LongType(), True),
    ]
)

# Firehose transform-event envelope (FIXTURES.md §2; reference
# tests/test_lbd_to_s3.py:11-22 pins the shape).
ENVELOPE_RECORD_SCHEMA = T.StructType(
    [
        T.StructField("recordId", T.StringType(), False),
        T.StructField("approximateArrivalTimestamp", T.LongType(), True),
        T.StructField("data", T.StringType(), False),  # base64(json-line)
    ]
)


def decode_json_line(data_col, schema: T.StructType) -> Column:
    """D1: base64 -> utf-8 string -> parsed struct."""
    c = F.col(data_col) if isinstance(data_col, str) else data_col
    return F.from_json(F.unbase64(c).cast("string"), schema)


def decoded_string(data_col) -> Column:
    """The raw JSON line (pre-parse) — kept as the passthrough column so
    unknown/extra fields survive the round-trip (§1.3 schema-on-read)."""
    c = F.col(data_col) if isinstance(data_col, str) else data_col
    return F.unbase64(c).cast("string")


def encode_json_line(struct_col) -> Column:
    """D2: struct -> json + "\\n" -> base64. UTF-8 raw (ensure_ascii=False
    parity). ignoreNullFields=false: json.dumps keeps null-valued keys,
    so the engine must too (Spark's default silently drops them —
    caught by the hypothesis round-trip test). Known normalization: a
    key absent from the input becomes an explicit null on re-encode
    (schema-on-read cannot distinguish missing from null); the UDF
    transform path preserves missing-vs-null exactly."""
    c = F.col(struct_col) if isinstance(struct_col, str) else struct_col
    return F.base64(
        F.encode(F.concat(F.to_json(c, {"ignoreNullFields": "false"}), F.lit("\n")), "utf-8")
    )


def encode_raw_line(json_str_col) -> Column:
    """Re-encode an already-serialized JSON string (used to preserve the
    *original* payload on ProcessingFailed — reference
    kds_example/kds_helper.py:49-51 keeps the raw record bytes)."""
    c = F.col(json_str_col) if isinstance(json_str_col, str) else json_str_col
    line = F.when(c.endswith("\n"), c).otherwise(F.concat(c, F.lit("\n")))
    return F.base64(F.encode(line, "utf-8"))
