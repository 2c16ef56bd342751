from __future__ import annotations

import pytest

from ftw_crawler_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    spark = get_spark(app_name="ftw-crawler-tests", master="local[4]",
                      shuffle_partitions=4)
    yield spark
    spark.stop()
