"""Structured-Streaming frontier ingestion: deltas arriving as files →
micro-batches → upsert sink, with seen-filtering across batches and
byte-identical extracted text."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from ftw_crawler_spark.plans.crawl import sites_df
from ftw_crawler_spark.sources.synth import default_sites
from ftw_crawler_spark.streaming.frontier_stream import FrontierStream


@pytest.fixture(scope="module")
def frontier(spark, tiny_world):
    from ftw_crawler_spark.operators.sitemaps import build_frontier
    sm = spark.read.parquet(f"{tiny_world}/sitemaps.parquet")
    f = build_frontier(spark, default_sites(), sm)
    return f.select("site_id", "loc", "lastmod", "changefreq",
                    "priority", "target", "crawl_seq").cache()


@pytest.fixture(scope="module")
def stream_run(spark, tiny_world, frontier, tmp_path_factory):
    delta_dir = str(tmp_path_factory.mktemp("frontier_deltas"))
    out_dir = str(tmp_path_factory.mktemp("stream_out"))

    half = frontier.filter(F.col("crawl_seq") % 2 == 0)
    rest_plus_overlap = frontier  # includes ALL rows → overlap with half

    fs = FrontierStream(spark, tiny_world, out_dir)

    # first wave of deltas (file source watches the root dir)
    half.write.mode("append").parquet(delta_dir)
    fs.run_available(delta_dir)
    first_count = fs.index().count()

    # second wave: full frontier again (overlap must be seen-filtered)
    rest_plus_overlap.write.mode("append").parquet(delta_dir)
    fs.run_available(delta_dir)
    return fs, first_count


def test_stream_indexes_first_wave(stream_run, frontier, spark,
                                   tiny_world):
    fs, first_count = stream_run
    pages = spark.read.parquet(f"{tiny_world}/pages.parquet")
    half_backed = (frontier.filter(F.col("crawl_seq") % 2 == 0)
                   .join(pages.select(F.col("url").alias("loc")),
                         "loc", "left_semi").select("loc").distinct())
    assert first_count == half_backed.count()


def test_stream_no_duplicates_after_overlap(stream_run, frontier, spark,
                                            tiny_world):
    fs, _ = stream_run
    idx = fs.index()
    assert idx.groupBy("url").count().filter(F.col("count") > 1) \
        .count() == 0
    pages = spark.read.parquet(f"{tiny_world}/pages.parquet")
    all_backed = (frontier.join(pages.select(F.col("url").alias("loc")),
                                "loc", "left_semi")
                  .select("loc").distinct())
    assert idx.count() == all_backed.count()


def test_stream_custom_url_field(spark, tiny_world, frontier,
                                 tmp_path_factory):
    """A config whose url field is NOT named path_string must stream
    identically (frontier_stream once hardcoded the default name)."""
    from ftw_crawler_spark import config as cfg
    fields = cfg.default_fields()
    for f in fields:
        if f.name == "path_string":
            f.name = "doc_url"
    config = cfg.CrawlerConfig(sites=[], fields=fields,
                               url_field="doc_url")
    delta_dir = str(tmp_path_factory.mktemp("deltas_custom"))
    out_dir = str(tmp_path_factory.mktemp("stream_out_custom"))
    frontier.filter(F.col("site_id") == 4).write.mode("append") \
        .parquet(delta_dir)
    fs = FrontierStream(spark, tiny_world, out_dir, config=config)
    fs.run_available(delta_dir)
    idx = fs.index()
    assert "doc_url" in idx.columns and "path_string" not in idx.columns
    assert idx.count() > 0
    assert idx.filter(F.col("url") != F.col("doc_url")).count() == 0


def test_stream_text_byte_identical(stream_run, spark, tiny_world):
    fs, _ = stream_run
    pages = spark.read.parquet(f"{tiny_world}/pages.parquet")
    joined = (fs.index().select("url", "SearchableText")
              .join(pages.select("url", "text"), "url"))
    from ftw_crawler_spark.functions.scalars import normalize_whitespace
    rows = joined.collect()
    assert rows
    for r in rows:
        assert r["SearchableText"] == normalize_whitespace(r["text"])


def test_stream_index_has_uid_and_order(stream_run):
    fs, _ = stream_run
    idx = fs.index()
    assert idx.filter(F.col("UID").isNull()).count() == 0
    # op_seq = crawl_seq lineage survives into the sink for rows not
    # yet folded by compaction (this fixture runs 2 batches, below
    # compact_every — folded rows base-ify to -2 by sink contract,
    # pinned in test_stream_compaction_baseifies_op_seq)
    assert idx.filter(F.col("op_seq") < 0).count() == 0


def test_stream_sink_compaction(spark, tiny_world, frontier,
                                tmp_path_factory):
    """compact_every=2 folds the stream sink's MOR delta log mid-run:
    the final index is identical to the uncompacted stream's, and the
    delta log actually shrank (generations were folded into the
    base)."""
    def run(compact_every):
        delta_dir = str(tmp_path_factory.mktemp("cmp_deltas"))
        out_dir = str(tmp_path_factory.mktemp("cmp_out"))
        fs = FrontierStream(spark, tiny_world, out_dir,
                            compact_every=compact_every)
        thirds = [frontier.filter(F.col("crawl_seq") % 3 == i)
                  for i in range(3)]
        for part in thirds:
            part.write.mode("append").parquet(delta_dir)
            fs.run_available(delta_dir)
        gens = (len(os.listdir(fs.sink.delta_root))
                if os.path.isdir(fs.sink.delta_root) else 0)
        rows = sorted((r["url"], r["UID"]) for r in
                      fs.index().select("url", "UID").collect())
        return rows, gens

    rows_a, gens_a = run(compact_every=10 ** 9)
    rows_b, gens_b = run(compact_every=2)
    assert rows_a == rows_b
    assert gens_a >= 3 and gens_b < gens_a


def test_stream_compaction_baseifies_op_seq(spark, tiny_world, frontier,
                                            tmp_path_factory):
    """The sink's documented base-ification: rows folded by mid-stream
    compaction carry the base sentinel op_seq (-2) — the same contract
    as the batch planner's mid-run compaction. Lineage (op_seq =
    crawl_seq) is a property of not-yet-folded rows only (what
    test_stream_index_has_uid_and_order pins on its fold-free run)."""
    delta_dir = str(tmp_path_factory.mktemp("bs_deltas"))
    out_dir = str(tmp_path_factory.mktemp("bs_out"))
    fs = FrontierStream(spark, tiny_world, out_dir, compact_every=2)
    for i in range(3):
        (frontier.filter(F.col("crawl_seq") % 3 == i)
         .write.mode("append").parquet(delta_dir))
        fs.run_available(delta_dir)
    idx = fs.index()
    n_folded = idx.filter(F.col("op_seq") == -2).count()
    n_live = idx.filter(F.col("op_seq") >= 0).count()
    assert n_folded > 0          # the fold happened
    assert n_live > 0            # post-fold batches keep lineage
