from __future__ import annotations

import pytest

from aws_dla_kinesis_delivery_stream_example_spark.session import get_spark

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECT = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="engine-tests", extra_conf={"spark.driver.memory": "16g"})
    yield s


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_SMOKE


@pytest.fixture(autouse=True)
def _drain_staging_caches():
    """Release operator-internal staging caches after every test so
    suite health never depends on test ORDER (a staging frame leaked
    by one file used to survive until another file's tolerant drain).
    Tests that assert on staging behavior manage their own registry
    first; by the time this runs theirs is already empty."""
    yield
    from aws_dla_kinesis_delivery_stream_example_spark.operators.staging import (
        release_staging,
    )

    release_staging()
