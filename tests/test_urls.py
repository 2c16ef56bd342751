"""URL canonicalization goldens (RFC 3986 §6 safe equivalences)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ftw_crawler_spark.functions.urls import canonical_url_col

CASES = [
    ("HTTP://WWW.Example.COM:80/Path/1", "http://www.example.com/Path/1"),
    ("https://Host:443/a", "https://host/a"),
    ("https://host:8080/a", "https://host:8080/a"),   # non-default kept
    ("http://host:443/a", "http://host:443/a"),       # wrong scheme kept
    ("http://host/a#frag", "http://host/a"),
    ("http://host", "http://host/"),                  # empty path → /
    ("http://host?x=1", "http://host/?x=1"),
    ("http://host/p?utm_source=a&id=7&utm_campaign=b&gclid=z",
     "http://host/p?id=7"),
    ("http://host/p?utm_source=a", "http://host/p"),  # all stripped → no ?
    ("http://host/p?b=2&a=1", "http://host/p?b=2&a=1"),  # order KEPT
    ("http://host/CaseKept/Q?fbclid=x&ok=1", "http://host/CaseKept/Q?ok=1"),
]


@pytest.fixture(scope="module")
def canon(spark):
    df = spark.createDataFrame([(u,) for u, _ in CASES], "url string")
    rows = df.select("url",
                     canonical_url_col(F.col("url")).alias("c")).collect()
    return {r["url"]: r["c"] for r in rows}


@pytest.mark.parametrize("url,expected", CASES)
def test_canonical_golden(canon, url, expected):
    assert canon[url] == expected


def test_canonical_is_idempotent(spark):
    """canon(canon(u)) == canon(u) over a structured grid of ~3k URL
    shapes. The fixpoint property matters operationally: discovery
    probes the seen filter on the canonical form and resume replays
    re-canonicalize already-canonical URLs — a non-idempotent rule
    would make a replayed row miss its own seen entry."""
    import itertools
    schemes = ["http", "HTTPS", "ftp"]
    hosts = ["Host.Example.ORG", "host", "host:80", "Host:443",
             "host:8080"]
    paths = ["", "/", "/A/b", "/a/b/a/b/a", "/%7Euser/x",
             "/p//q/"]
    queries = ["", "?utm_source=a", "?id=7&utm_campaign=b",
               "?b=2&a=1&fbclid=z", "?gclid=1&utm_x=2"]
    frags = ["", "#frag", "#a/b?c=1"]
    urls = [f"{s}://{h}{p}{q}{f}"
            for s, h, p, q, f in itertools.product(
                schemes, hosts, paths, queries, frags)]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    c1 = canonical_url_col(F.col("url"))
    out = df.select("url", c1.alias("c1"),
                    canonical_url_col(c1).alias("c2")).collect()
    bad = [(r["url"], r["c1"], r["c2"]) for r in out
           if r["c1"] != r["c2"]]
    assert not bad, bad[:5]


def test_url_trap_cols_signals(spark):
    import pyspark.sql.functions as F

    from ftw_crawler_spark.functions.urls import url_trap_cols
    df = spark.createDataFrame(
        [(1, "http://h.example/a/b/a/b/a"),              # loop: 'a'×3
         (2, "http://h.example/" + "/".join(
             f"s{i}" for i in range(13))),               # depth 13
         (3, "http://h.example/q?" + "&".join(
             f"p{i}={i}" for i in range(9))),            # 9 params
         (4, "http://h.example/page/7?id=7"),            # benign
         (5, "http://h.example/")],                      # root
        "id long, url string")
    flags = url_trap_cols(F.col("url"))
    got = {r["id"]: r for r in df.select(
        "id", *[c.alias(n) for n, c in flags.items()]).collect()}
    assert got[1]["has_loop"] and got[1]["trap"]
    assert got[2]["depth"] == 13 and got[2]["trap"] \
        and not got[2]["has_loop"]
    assert got[3]["n_params"] == 9 and got[3]["trap"]
    assert not got[4]["trap"] and got[4]["n_params"] == 1
    assert got[5]["depth"] == 0 and not got[5]["trap"]
