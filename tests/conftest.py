from __future__ import annotations

import pytest

from frontier_engine import synth
from frontier_engine.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(cores=8, app="frontier_engine_tests", shuffle_partitions=8, driver_memory="8g")
    yield s


@pytest.fixture(scope="session")
def pages_pdf():
    return synth.generate_pages(n_pages=300, seed=42, n_hosts=40)


@pytest.fixture(scope="session")
def pages_df(spark, pages_pdf):
    df = spark.createDataFrame(pages_pdf)
    df.persist().count()
    return df
