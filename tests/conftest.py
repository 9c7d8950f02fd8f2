"""Shared fixtures: one local SparkSession per test run, fixture corpus."""

from __future__ import annotations

import pytest

from pears_fruit_fly_spark.config import FlyConfig
from pears_fruit_fly_spark.fixtures.webtext import (
    make_vocab_file_lines,
    make_web_pages,
)
from pears_fruit_fly_spark.functions.vocab import parse_vocab_lines
from pears_fruit_fly_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("pears-tests", master="local[4]", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def pages_pdf():
    return make_web_pages(n=300, v=500)


@pytest.fixture(scope="session")
def pages_df(spark, pages_pdf):
    df = spark.createDataFrame(pages_pdf)
    df.persist()
    df.count()
    return df


@pytest.fixture(scope="session")
def vocab():
    return parse_vocab_lines(make_vocab_file_lines(500))


@pytest.fixture(scope="session")
def fly_cfg():
    return FlyConfig(pn_size=500, kc_size=64, proj_size=8, top_words=50,
                     wta_percent=10.0, seed=7)
