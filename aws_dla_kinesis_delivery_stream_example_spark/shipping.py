"""Ship this package to Spark's Python workers at runtime.

Pandas-UDF / mapInPandas closures pickle references to this package;
workers then need it importable. When the engine builds the session
(`session.get_spark`) PYTHONPATH handles that — but the external
driver builds its OWN session, so every operator that crosses into
Python calls ``ensure_shipped(spark)``: zip the package once and
``addPyFile`` it (the runtime form of ``spark-submit --py-files``,
works identically on a real cluster).
"""

from __future__ import annotations

import os
import shutil
import tempfile

_SHIPPED: set[int] = set()
_ZIP_PATH: str | None = None


def _package_zip() -> str:
    global _ZIP_PATH
    if _ZIP_PATH is None or not os.path.exists(_ZIP_PATH):
        pkg_dir = os.path.dirname(os.path.abspath(__file__))
        parent = os.path.dirname(pkg_dir)
        base = os.path.join(tempfile.gettempdir(), "aws_dla_kinesis_delivery_stream_example_spark_pkg")
        _ZIP_PATH = shutil.make_archive(
            base, "zip", root_dir=parent, base_dir=os.path.basename(pkg_dir)
        )
    return _ZIP_PATH


def ensure_shipped(spark) -> None:
    """Idempotent per SparkContext: add the package zip to the workers'
    import path."""
    sc = spark.sparkContext
    key = id(sc)
    if key in _SHIPPED:
        return
    sc.addPyFile(_package_zip())
    _SHIPPED.add(key)
