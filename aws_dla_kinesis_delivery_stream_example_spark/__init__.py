"""PySpark-native analytics engine with the query/data-processing
capabilities of the reference delivery-stream pipeline
(MacHu-GWU/aws_dla_kinesis_delivery_stream_example), re-expressed
Spark-first.

Subpackages
-----------
- ``sources``    : table/stream readers (parquet tables, JSON-lines stream)
- ``functions``  : column-expression helpers (serde, text, vectors)
- ``operators``  : LLM-pipeline operators (dedup, similarity, text analysis,
                   multimodal plumbing)
- ``streaming``  : the delivery pipeline (transform protocol, fan-out sinks,
                   event-time windows)
- ``plans``      : the declared query catalog (Spark query + DuckDB oracle
                   SQL per entry) consumed by ``__spark_entry__.py``
"""

__version__ = "0.1.0"
