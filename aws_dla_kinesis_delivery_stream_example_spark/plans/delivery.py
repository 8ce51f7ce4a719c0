"""Delivery-protocol queries: the reference's serde + transform + status
routing semantics (SURVEY.md §2.2/§2.3/§2.6) expressed as a batch
round-trip with a DuckDB oracle, so the t2 gate covers the delivery
path, not just the relational surface. The live streaming form of the
same protocol runs in streaming/delivery.py and is exercised by
tests/test_delivery.py (golden round-trip + count reconciliation).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions import serde
from ..sources.tables import load_table
from .catalog import query

_REC_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType(), True),
        T.StructField("name", T.StringType(), True),
        T.StructField("segment", T.StringType(), True),
        T.StructField("balance_cents", T.LongType(), True),
    ]
)


@query(
    "q38_delivery_protocol",
    oracle="""
        WITH enc AS (
            SELECT to_base64(ENCODE(to_json(struct_pack(
                       id := CAST(c_custkey AS VARCHAR),
                       name := c_name,
                       segment := c_mktsegment,
                       balance_cents := CAST(floor(c_acctbal * 100) AS BIGINT)
                   ))::VARCHAR || chr(10))) AS data
            FROM customer
        ),
        dec AS (
            SELECT json_extract_string(DECODE(from_base64(data)), '$.id') AS id,
                   json_extract_string(DECODE(from_base64(data)), '$.segment') AS segment,
                   CAST(json_extract(DECODE(from_base64(data)), '$.balance_cents') AS BIGINT) AS balance_cents
            FROM enc
        ),
        routed AS (
            SELECT CASE WHEN balance_cents < 0 THEN 'Dropped'
                        WHEN segment = 'MACHINERY' THEN 'ProcessingFailed'
                        ELSE 'OK' END AS status,
                   id, balance_cents
            FROM dec
        )
        SELECT status, count(*) AS n, min(id) AS min_id,
               CAST(sum(balance_cents) AS BIGINT) AS sum_balance_cents
        FROM routed
        GROUP BY status
        ORDER BY status
    """,
    description="Full D1/D2 serde round-trip (base64+json-line) with T2 "
    "three-way status routing (OK / Dropped / ProcessingFailed), counted "
    "per status — the reference's transform protocol as a verifiable query",
    tags=("delivery", "serde"),
)
def q38_delivery_protocol(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    rec = F.struct(
        F.col("c_custkey").cast("string").alias("id"),
        F.col("c_name").alias("name"),
        F.col("c_mktsegment").alias("segment"),
        F.floor(F.col("c_acctbal") * 100).cast("long").alias("balance_cents"),
    )
    # D2 encode -> wire form -> D1 decode (the full envelope round-trip).
    enc = cust.select(serde.encode_json_line(rec).alias("data"))
    dec = enc.select(serde.decode_json_line("data", _REC_SCHEMA).alias("r")).select("r.*")
    routed = dec.withColumn(
        "status",
        F.when(F.col("balance_cents") < 0, "Dropped")
        .when(F.col("segment") == "MACHINERY", "ProcessingFailed")
        .otherwise("OK"),
    )
    return (
        routed.groupBy("status")
        .agg(
            F.count("*").alias("n"),
            F.min("id").alias("min_id"),
            F.sum("balance_cents").alias("sum_balance_cents"),
        )
        .orderBy("status")
    )


@query(
    "q39_sink_reconciliation",
    oracle="""
        WITH routed AS (
            SELECT CASE WHEN c_acctbal < 0 THEN 'Dropped'
                        WHEN c_mktsegment = 'MACHINERY' THEN 'ProcessingFailed'
                        ELSE 'OK' END AS status
            FROM customer
        )
        SELECT count(*) AS n_input,
               count(*) FILTER (status = 'OK') AS n_ok,
               count(*) FILTER (status = 'Dropped') AS n_dropped,
               count(*) FILTER (status = 'ProcessingFailed') AS n_failed,
               count(*) FILTER (status = 'OK')
                 + count(*) FILTER (status = 'Dropped')
                 + count(*) FILTER (status = 'ProcessingFailed') AS n_reconciled
        FROM routed
    """,
    description="Zero-loss reconciliation invariant (README.rst:113-124 "
    "parity): input == OK + Dropped + ProcessingFailed",
    tags=("delivery",),
)
def q39_sink_reconciliation(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    status = (
        F.when(F.col("c_acctbal") < 0, "Dropped")
        .when(F.col("c_mktsegment") == "MACHINERY", "ProcessingFailed")
        .otherwise("OK")
    )
    routed = cust.select(status.alias("status"))
    ok = F.sum(F.when(F.col("status") == "OK", 1).otherwise(0))
    dropped = F.sum(F.when(F.col("status") == "Dropped", 1).otherwise(0))
    failed = F.sum(F.when(F.col("status") == "ProcessingFailed", 1).otherwise(0))
    return routed.agg(
        F.count("*").alias("n_input"),
        ok.cast("long").alias("n_ok"),
        dropped.cast("long").alias("n_dropped"),
        failed.cast("long").alias("n_failed"),
        (ok + dropped + failed).cast("long").alias("n_reconciled"),
    )
