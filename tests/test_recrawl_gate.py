"""Adaptive recrawl gate (--recrawl-from): a second run fed a prior
index's change history crawls only DUE entities; urls the scheduler
has no rate evidence about are never gated; an empty/rate-free history
leaves the run bit-identical to the ungated default."""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from ftw_crawler_spark.operators.indexsink import IndexSink
from ftw_crawler_spark.plans.crawl import run_crawl

CRAWL_TIME = datetime(2026, 1, 15, 12, 0, 0)


def _crawled_urls(result) -> set:
    """Urls upserted BY this run (op_seq >= 0 excludes the base
    snapshot and purge tombstones)."""
    return {r["url"] for r in
            result.index().filter(F.col("op_seq") >= 0)
            .select("url").collect()}


def _index_rows(result) -> list:
    return sorted(map(repr, result.index().collect()))


def _mk_prior(spark, root: str, histories: dict) -> str:
    """A prior run's index whose op log carries the given per-url
    (url -> [modified timestamps]) observations: first observation in
    the base snapshot, the rest as delta generations — exactly the
    layout a real earlier crawl leaves behind."""
    sink = IndexSink(spark, root)
    base = [(f"uid-{i}", u, ts[0])
            for i, (u, ts) in enumerate(sorted(histories.items()))]
    sink.write_base(spark.createDataFrame(
        base, "UID string, url string, modified timestamp"))
    n_gen = max(len(ts) for ts in histories.values()) - 1
    for g in range(n_gen):
        rows = [(f"uid-{i}", u, ts[g + 1], g + 1)
                for i, (u, ts) in enumerate(sorted(histories.items()))
                if len(ts) > g + 1]
        sink.append_upserts(spark.createDataFrame(
            rows, "UID string, url string, modified timestamp, "
                  "op_seq long"), g)
    return root


@pytest.fixture(scope="module")
def default_run(spark, tiny_world, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("recrawl_default"))
    return run_crawl(spark, tiny_world, out, crawl_time=CRAWL_TIME)


@pytest.mark.slow
def test_second_run_crawls_only_due(spark, tiny_world, tmp_path_factory,
                                    default_run):
    crawled = sorted(_crawled_urls(default_run))
    assert len(crawled) >= 3, "world too small for the scenario"
    u_due, u_not_due, u_single = crawled[0], crawled[1], crawled[2]

    t = datetime
    prior = _mk_prior(spark, str(tmp_path_factory.mktemp("prior_idx")),
                      {
        # changes hourly, last seen 2026-01-01 → long overdue by the 15th
        u_due: [t(2026, 1, 1, 0), t(2026, 1, 1, 1)],
        # changes ~yearly, observed 2025-01-10 → 2026-01-10: next due
        # ~2027 — NOT due on 2026-01-15
        u_not_due: [t(2025, 1, 10), t(2026, 1, 10)],
        # a single observation carries no rate → never gated
        u_single: [t(2026, 1, 10)],
    })

    out = str(tmp_path_factory.mktemp("recrawl_gated"))
    gated = run_crawl(spark, tiny_world, out, crawl_time=CRAWL_TIME,
                      recrawl_from=prior)

    got = _crawled_urls(gated)
    assert u_not_due not in got, "not-due url was crawled"
    assert u_due in got, "overdue url was gated"
    assert u_single in got, "rate-free url was gated"
    # exactly the one gated url differs from the ungated run
    assert got == _crawled_urls(default_run) - {u_not_due}
    # and the skip is attributed in the plan metrics
    plan = [m for m in gated.metrics if m.get("event") == "plan"][0]
    assert plan["skips"].get("not_due") == 1


@pytest.mark.slow
def test_rate_free_history_is_bit_identical(spark, tiny_world,
                                            tmp_path_factory,
                                            default_run):
    """Gate on, but every url has a single observation (no rate):
    the index must be byte-identical to the ungated run — the
    scheduler only defers what it has evidence about."""
    crawled = sorted(_crawled_urls(default_run))
    prior = _mk_prior(spark,
                      str(tmp_path_factory.mktemp("prior_rate_free")),
                      {u: [datetime(2026, 1, 10)] for u in crawled[:5]})
    out = str(tmp_path_factory.mktemp("recrawl_ratefree"))
    gated = run_crawl(spark, tiny_world, out, crawl_time=CRAWL_TIME,
                      recrawl_from=prior)
    assert _index_rows(gated) == _index_rows(default_run)
    plan = [m for m in gated.metrics if m.get("event") == "plan"][0]
    assert "not_due" not in plan["skips"]
