"""Ported sitemap semantics (reference tests/test_sitemap.py): parse
goldens, property subsets, gz handling, discovery fallbacks, index
expansion order."""

from __future__ import annotations

import gzip

import pytest

from ftw_crawler_spark.config import Site
from ftw_crawler_spark.operators.sitemaps import (
    NoSitemapFound, _resolve_site, is_sitemap_index, parse_entries)

SITEMAP_XML = b"""<?xml version="1.0" encoding="UTF-8"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <url>
    <loc>http://example.org/foo</loc>
    <changefreq>daily</changefreq>
    <priority>1.0</priority>
    <lastmod>2014-12-31</lastmod>
  </url>
  <url>
    <loc>http://example.org/bar</loc>
    <target>http://example.org/target-bar</target>
    <changefreq>daily</changefreq>
    <priority>1.0</priority>
    <lastmod>2005-01-01</lastmod>
  </url>
</urlset>"""

REQ_ONLY_XML = b"""<?xml version="1.0" encoding="UTF-8"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <url><loc>http://example.org/only-loc</loc></url>
</urlset>"""

INDEX_XML = b"""<?xml version="1.0" encoding="UTF-8"?>
<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <sitemap><loc>http://example.org/a.xml</loc></sitemap>
  <sitemap><loc>http://example.org/b.xml</loc></sitemap>
</sitemapindex>"""


def test_parse_golden_properties():
    # reference test_sitemap.py:129-150
    entries = parse_entries(SITEMAP_XML)
    assert len(entries) == 2
    assert entries[0]["loc"] == "http://example.org/foo"
    assert entries[0]["lastmod"] == "2014-12-31"
    assert entries[0]["changefreq"] == "daily"
    assert entries[0]["priority"] == "1.0"
    assert entries[0]["target"] is None         # absent key
    assert entries[1]["target"] == "http://example.org/target-bar"


def test_parse_req_only():
    entries = parse_entries(REQ_ONLY_XML)
    assert entries == [{"loc": "http://example.org/only-loc",
                        "lastmod": None, "changefreq": None,
                        "priority": None, "target": None}]


def test_parse_gz():
    entries = parse_entries(gzip.compress(SITEMAP_XML), gz=True)
    assert len(entries) == 2


def test_index_parse_and_detection():
    assert is_sitemap_index(INDEX_XML)
    assert not is_sitemap_index(SITEMAP_XML)
    infos = parse_entries(INDEX_XML, container="sitemapindex",
                          child="sitemap")
    assert [i["loc"] for i in infos] == [
        "http://example.org/a.xml", "http://example.org/b.xml"]


def _meta(d):
    return {k: (v.get("is_index", False), v.get("gz", False))
            for k, v in d.items()}


def test_discovery_static_short_circuits():
    # sitemap.py:32-34: configured sitemap_urls skip discovery entirely
    site = Site(0, "http://x.org/", sitemap_urls=["http://x.org/s1.xml",
                                                  "http://x.org/s2.xml"])
    assert _resolve_site(site, {}, {}) == ["http://x.org/s1.xml",
                                           "http://x.org/s2.xml"]


def test_discovery_prefers_real_index():
    site = Site(0, "http://x.org/")
    meta = _meta({"http://x.org/sitemap_index.xml": {"is_index": True}})
    bodies = {"http://x.org/sitemap_index.xml": (INDEX_XML, False)}
    assert _resolve_site(site, meta, bodies) == [
        "http://example.org/a.xml", "http://example.org/b.xml"]


def test_discovery_falls_back_to_single_sitemap():
    site = Site(0, "http://x.org/")
    meta = _meta({"http://x.org/sitemap.xml": {}})
    assert _resolve_site(site, meta, {}) == ["http://x.org/sitemap.xml"]


def test_discovery_gz_fallback_order():
    # sitemap.py:160-172: sitemap.xml probed before sitemap.xml.gz
    site = Site(0, "http://x.org/")
    meta = _meta({"http://x.org/sitemap.xml.gz": {"gz": True}})
    assert _resolve_site(site, meta, {}) == ["http://x.org/sitemap.xml.gz"]


def test_discovery_index_name_present_but_not_index():
    # sitemap.py:47-48: a sitemap_index.xml that is not actually an
    # index is skipped and discovery continues
    site = Site(0, "http://x.org/")
    meta = _meta({"http://x.org/sitemap_index.xml": {},
                  "http://x.org/sitemap.xml": {}})
    assert _resolve_site(site, meta, {}) == ["http://x.org/sitemap.xml"]


def test_no_sitemap_raises():
    with pytest.raises(NoSitemapFound):
        _resolve_site(Site(0, "http://x.org/"), {}, {})


def test_distributed_discovery_matches_reference(spark):
    """The executor-side probe/min_by/parse discovery must reproduce
    _resolve_site (the driver-side reference semantics) for every
    discovery mode, and record (not raise) per-site failures."""
    import gzip as _gz

    from ftw_crawler_spark.operators.sitemaps import discover_sitemaps

    sites = [
        Site(0, "http://s0.org/", sitemap_urls=["http://s0.org/a.xml",
                                                "http://s0.org/b.xml"]),
        Site(1, "http://s1.org/"),    # real sitemap index
        Site(2, "http://s2.org/"),    # index-named file that is NOT one
        Site(3, "http://s3.org/"),    # gz single sitemap only
        Site(4, "http://s4.org/"),    # nothing → error
        Site(5, "http://s5.org/"),    # sitemap.xml that IS an index → error
    ]
    rows = [
        ("http://s1.org/sitemap_index.xml", True, False, INDEX_XML),
        ("http://s2.org/sitemap_index.xml", False, False, SITEMAP_XML),
        ("http://s2.org/sitemap.xml", False, False, SITEMAP_XML),
        ("http://s3.org/sitemap.xml.gz", False, True,
         _gz.compress(SITEMAP_XML)),
        ("http://s5.org/sitemap.xml", True, False, INDEX_XML),
    ]
    smdf = spark.createDataFrame(
        rows, "sitemap_url string, is_index boolean, gz boolean, "
              "xml binary")
    errors = []
    got = sorted((r["site_id"], r["sitemap_ord"], r["sitemap_url"])
                 for r in discover_sitemaps(spark, sites, smdf,
                                            errors=errors).collect())
    assert got == [
        (0, 0, "http://s0.org/a.xml"), (0, 1, "http://s0.org/b.xml"),
        (1, 0, "http://example.org/a.xml"),
        (1, 1, "http://example.org/b.xml"),
        (2, 0, "http://s2.org/sitemap.xml"),
        (3, 0, "http://s3.org/sitemap.xml.gz"),
    ]
    assert [e["site_id"] for e in errors] == [4, 5]
    # strict mode (no errors list) raises like the reference
    with pytest.raises(NoSitemapFound):
        discover_sitemaps(spark, sites, smdf)


def test_probe_requires_genuine_urlset(spark):
    """A 200 body at /sitemap.xml that is well-formed XML but NOT a
    urlset (ubiquitous on the open web: XML error pages, RSS feeds)
    must fall through to /sitemap.xml.gz — the reference checks
    Sitemap.is_sitemap() before accepting a probe (sitemap.py:164-175).
    A body that fails to PARSE aborts the site instead (the reference
    raises from the Sitemap constructor, sitemap.py:206-209)."""
    import gzip as _gz

    from ftw_crawler_spark.operators.sitemaps import discover_sitemaps

    sites = [
        Site(0, "http://f.org/"),     # not-a-urlset → falls to .gz
        Site(1, "http://g.org/"),     # invalid XML chosen → site error
        Site(2, "http://h.org/"),     # invalid index probe → site error
    ]
    rss = b"<?xml version='1.0'?><rss><channel/></rss>"
    rows = [
        ("http://f.org/sitemap.xml", False, False, rss),
        ("http://f.org/sitemap.xml.gz", False, True,
         _gz.compress(SITEMAP_XML)),
        ("http://g.org/sitemap.xml", False, False, b"<urlset><url><lo"),
        ("http://g.org/sitemap.xml.gz", False, True,
         _gz.compress(SITEMAP_XML)),      # valid, but never reached
        ("http://h.org/sitemap_index.xml", True, False, b"\x00garbage"),
        ("http://h.org/sitemap.xml", False, False, SITEMAP_XML),
    ]
    smdf = spark.createDataFrame(
        rows, "sitemap_url string, is_index boolean, gz boolean, "
              "xml binary")
    errors = []
    got = sorted((r["site_id"], r["sitemap_url"])
                 for r in discover_sitemaps(spark, sites, smdf,
                                            errors=errors).collect())
    assert got == [(0, "http://f.org/sitemap.xml.gz")]
    assert sorted((e["site_id"], e["error"]) for e in errors) == [
        (1, "Invalid sitemap XML at http://g.org/sitemap.xml"),
        (2, "Invalid sitemap XML at http://h.org/sitemap_index.xml")]
    with pytest.raises(ValueError):
        discover_sitemaps(spark, [sites[1]], smdf)


def test_malformed_sitemap_isolated(spark):
    """A truncated/corrupt sitemap body costs its own entries only:
    the parse UDF yields NULL (not a job-killing exception), the good
    sitemaps still expand, and expansion_errors reports both the bad
    body and an index child missing from the web."""
    from ftw_crawler_spark.operators.sitemaps import (
        expand_frontier, expansion_errors)

    smdf = spark.createDataFrame(
        [("http://a.org/sitemap.xml", False, False, SITEMAP_XML),
         ("http://b.org/sitemap.xml", False, False, b"<urlset><url><lo"),
         ("http://c.org/sitemap.xml", False, True, b"not gzip either")],
        "sitemap_url string, is_index boolean, gz boolean, xml binary")
    discovered = spark.createDataFrame(
        [(0, "http://a.org/sitemap.xml", 0),
         (1, "http://b.org/sitemap.xml", 0),
         (2, "http://c.org/sitemap.xml", 0),
         (3, "http://gone.org/sitemap.xml", 0)],   # never fetched
        "site_id int, sitemap_url string, sitemap_ord int")
    frontier = expand_frontier(discovered, smdf)
    assert [r["site_id"] for r in frontier.select("site_id")
            .distinct().collect()] == [0]
    assert frontier.count() == 2                 # the two good entries
    errs = {(r["site_id"], r["error"])
            for r in expansion_errors(discovered, smdf).collect()}
    assert errs == {(1, "sitemap XML parse error"),
                    (2, "sitemap XML parse error"),
                    (3, "listed sitemap not fetchable")}
