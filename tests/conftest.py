from __future__ import annotations

import pytest


@pytest.fixture(scope="session")
def spark():
    from kiri_ocr_spark.session import get_spark

    s = get_spark(app_name="kiri-ocr-tests", master="local[8]", shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_tiny() -> str:
    return "/root/testdata/sf0.001"
