from __future__ import annotations

import pytest

from ftw_crawler_spark.session import get_spark


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running integration test")


@pytest.fixture(scope="session")
def spark():
    spark = get_spark(app_name="ftw-crawler-tests", master="local[4]",
                      shuffle_partitions=4)
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def tiny_world(spark, tmp_path_factory):
    """A small synthetic crawl world shared by integration tests."""
    from ftw_crawler_spark.sources.synth import generate_world
    d = str(tmp_path_factory.mktemp("tiny_world"))
    generate_world(spark, d, n_urls=150)
    return d
