"""Config-file loading (the reference's bin/crawl config.py surface)
and a crawl driven end-to-end by a user-declared config."""

from __future__ import annotations

import os
import textwrap

import pytest
from pyspark.sql import functions as F

from ftw_crawler_spark.config import CrawlerConfig
from ftw_crawler_spark.config_loader import load_config_file

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
EXAMPLE = os.path.join(REPO, "examples", "example_config.py")


def test_load_example_config():
    config = load_config_file(EXAMPLE)
    assert isinstance(config, CrawlerConfig)
    assert config.url_field == "url"
    assert [f.name for f in config.fields][:2] == ["UID", "url"]
    assert len(config.sites) == 2


def test_missing_config_object(tmp_path):
    p = tmp_path / "bad.py"
    p.write_text("X = 1\n")
    with pytest.raises(ValueError, match="no CONFIG"):
        load_config_file(str(p))


def test_wrong_type(tmp_path):
    p = tmp_path / "bad2.py"
    p.write_text("CONFIG = {'not': 'a config'}\n")
    with pytest.raises(ValueError, match="must be a CrawlerConfig"):
        load_config_file(str(p))


def test_crawl_with_user_config(spark, tiny_world, tmp_path):
    """A config file with its own field schema drives the full
    pipeline; the index carries exactly the declared fields."""
    p = tmp_path / "user_config.py"
    p.write_text(textwrap.dedent("""
        from ftw_crawler_spark.config import (
            CrawlerConfig, Field, PlainTextExtractor, Site,
            TitleExtractor, UIDExtractor, URLExtractor)

        CONFIG = CrawlerConfig(
            sites=[Site(1, "http://site1.example.org/", sleeptime=0.05,
                        attributes={"site_area": "One"})],
            fields=[Field("UID", UIDExtractor(), required=True),
                    Field("url", URLExtractor()),
                    Field("Title", TitleExtractor()),
                    Field("SearchableText", PlainTextExtractor())],
            url_field="url")
    """))
    config = load_config_file(str(p))

    from datetime import datetime

    from ftw_crawler_spark.plans.crawl import run_crawl
    out = str(tmp_path / "out")
    r = run_crawl(spark, tiny_world, out, sites=config.sites,
                  config=config, crawl_time=datetime(2026, 1, 15, 12))
    idx = r.index().filter(F.col("batch_id").isNotNull())
    rows = idx.collect()
    assert rows
    # only site1 urls (the config declares a single site)
    assert all(r["url"].startswith("http://site1.example.org/")
               for r in rows)
    declared = {"UID", "url", "Title", "SearchableText"}
    assert declared <= set(idx.columns)
    assert "snippetText" not in idx.columns
