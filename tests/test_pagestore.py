"""Bucketed page store: the fetch-simulate join must read the bucketed
(big) side in place — no Exchange above its scan."""

from __future__ import annotations

import contextlib
import io

import pytest
from pyspark.sql import functions as F

from ftw_crawler_spark.sources.pagestore import (read_bucketed_pages,
                                                 write_bucketed_pages)


@pytest.fixture(scope="module")
def bucketed(spark, tiny_world, tmp_path_factory):
    # warehouse.dir is a static conf — the table lands in the session
    # default (./spark-warehouse, gitignored) and is dropped after
    pages = spark.read.parquet(f"{tiny_world}/pages.parquet")
    # self-heal a leftover from a killed run: DROP alone doesn't clear
    # an orphaned managed-table location, and saveAsTable then fails
    # with LOCATION_ALREADY_EXISTS
    import shutil
    spark.sql("DROP TABLE IF EXISTS pages_bucketed_test")
    shutil.rmtree("spark-warehouse/pages_bucketed_test",
                  ignore_errors=True)
    write_bucketed_pages(pages, "pages_bucketed_test", n_buckets=8)
    yield read_bucketed_pages(spark, "pages_bucketed_test")
    spark.sql("DROP TABLE IF EXISTS pages_bucketed_test")


def _plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain()
    return buf.getvalue()


def test_bucketed_join_no_exchange_on_pages(spark, bucketed,
                                            tiny_world):
    # AQE + auto-broadcast would hide the bucketing benefit at toy
    # scale — disable both to assert the structural property that
    # matters at 10^10 rows (where neither side broadcasts).
    old_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    old_bc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        frontier = spark.read.parquet(
            f"{tiny_world}/entries.parquet").select(
            F.col("loc").alias("url"))
        joined = bucketed.join(frontier, "url")
        plan = _plan_of(joined)
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
        # exactly ONE exchange: the frontier side; the bucketed page
        # scan feeds the join without re-partitioning
        assert plan.count("Exchange hashpartitioning") == 1, plan
        assert joined.count() > 0
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", old_aqe)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_bc)


def test_bucketed_contents_equal_plain(spark, bucketed, tiny_world):
    plain = spark.read.parquet(f"{tiny_world}/pages.parquet")
    assert bucketed.count() == plain.count()
    a = {r["url"] for r in bucketed.select("url").collect()}
    b = {r["url"] for r in plain.select("url").collect()}
    assert a == b


def test_crawl_with_bucketed_pages_identical(spark, bucketed,
                                             tiny_world, tmp_path):
    """The full pipeline over the bucketed page store produces the
    exact same index as over plain parquet."""
    from datetime import datetime

    from ftw_crawler_spark.plans.crawl import run_crawl
    t = datetime(2026, 1, 15, 12)
    r_plain = run_crawl(spark, tiny_world, str(tmp_path / "plain"),
                        crawl_time=t)
    r_buck = run_crawl(spark, tiny_world, str(tmp_path / "buck"),
                       crawl_time=t, pages_table="pages_bucketed_test")
    cols = ["UID", "url", "Title", "SearchableText", "crawl_seq"]
    a = {tuple(r) for r in r_plain.index().select(*cols).collect()}
    b = {tuple(r) for r in r_buck.index().select(*cols).collect()}
    assert a == b
