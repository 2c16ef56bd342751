"""CDX(J) index source: line parse, SURT keys, latest-capture plan,
malformed-line isolation, gzipped index files."""

from __future__ import annotations

import gzip
import os

import pyspark.sql.functions as F

from ftw_crawler_spark.sources import cdx

LINES = [
    'org,example)/a 20260101120000 {"url": "http://example.org/a", '
    '"mime": "text/html", "status": "200", "digest": "sha1:AA", '
    '"length": "100", "offset": "0", "filename": "f1.warc.gz"}',
    # later capture of the same url
    'org,example)/a 20260102120000 {"url": "http://example.org/a", '
    '"mime": "text/html", "status": "200", "digest": "sha1:BB", '
    '"length": "120", "offset": "999", "filename": "f2.warc.gz"}',
    # non-admissible: 404
    'org,example)/b 20260101120000 {"url": "http://example.org/b", '
    '"mime": "text/html", "status": "404", "digest": "sha1:CC", '
    '"length": "50", "offset": "10", "filename": "f1.warc.gz"}',
    # non-admissible: image mime
    'org,example)/c 20260101120000 {"url": "http://example.org/c", '
    '"mime": "image/png", "status": "200", "digest": "sha1:DD", '
    '"length": "70", "offset": "20", "filename": "f1.warc.gz"}',
    "totally-garbage-line",
]


def test_parse_and_latest_plan(spark):
    lines = spark.createDataFrame([(ln,) for ln in LINES], "value string")
    parsed = cdx.parse_cdx_lines(lines)
    rows = parsed.collect()
    assert len(rows) == 5  # garbage row kept, fields NULL
    bad = [r for r in rows if r["url"] is None]
    assert len(bad) == 1  # isolated, not fatal
    plan = {r["url"]: r for r in cdx.latest_captures(parsed).collect()}
    assert set(plan) == {"http://example.org/a"}
    a = plan["http://example.org/a"]
    assert a["warc_filename"] == "f2.warc.gz" and a["offset"] == 999
    assert a["length"] == 120


def test_latest_captures_same_second_tiebreak(spark):
    """CDX timestamps are 1-second resolution: a same-ts pair must pick
    deterministically (max over the full struct), independent of
    partitioning."""
    tmpl = ('org,example)/t 20260101120000 {{"url": "http://example.org/t", '
            '"mime": "text/html", "status": "200", "digest": "sha1:{d}", '
            '"length": "10", "offset": "{o}", "filename": "{f}"}}')
    lines = [(tmpl.format(d="AA", o="5", f="fa.warc.gz"),),
             (tmpl.format(d="BB", o="7", f="fb.warc.gz"),)]
    df = spark.createDataFrame(lines, "value string")
    a = cdx.latest_captures(cdx.parse_cdx_lines(df)).collect()[0]
    b = cdx.latest_captures(
        cdx.parse_cdx_lines(df.repartition(5))).collect()[0]
    assert (a["warc_filename"], a["offset"]) == ("fb.warc.gz", 7)
    assert (b["warc_filename"], b["offset"]) == ("fb.warc.gz", 7)


def test_read_cdx_gzip(spark, tmp_path):
    d = tmp_path / "cdx"
    os.makedirs(d)
    with gzip.open(d / "part-00000.gz", "wt") as fh:
        fh.write("\n".join(LINES[:2]) + "\n")
    got = cdx.read_cdx(spark, str(d)).collect()
    assert len(got) == 2
    assert {r["digest"] for r in got} == {"sha1:AA", "sha1:BB"}


def test_surt_key_forms(spark):
    df = spark.createDataFrame(
        [("http://sub.Example.ORG/A/b?Q=1",),
         ("https://example.org",),
         ("http://example.org/",),
         ("http://example.org:8080/a",),      # port stays after labels
         ("http://user:pw@example.org/a",),   # userinfo stripped
         ("http://example.org?x=1",)],        # query-only → '/?...'
        "url string")
    got = [r["k"] for r in
           df.select(cdx.surt_key_col(F.col("url")).alias("k")).collect()]
    assert got == ["org,example,sub)/a/b?q=1",
                   "org,example)/",
                   "org,example)/",
                   "org,example:8080)/a",
                   "org,example)/a",
                   "org,example)/?x=1"]
