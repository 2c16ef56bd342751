"""Link-graph family: outlink extraction, degrees, PageRank.

The extraction semantics (href resolution, scheme filtering,
``<base href>``, per-row isolation) are pinned here because a DuckDB
oracle cannot run a DOM parse; pagerank's numeric semantics are pinned
against a hand-rolled plain-Python power method (the bit-exact
cross-engine check is the driver's ``linkgraph_pagerank`` query).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ftw_crawler_spark.operators.linkgraph import (
    anchor_text_profile, build_edges, degrees, discover_frontier,
    extract_outlinks, pagerank, parse_outlinks)


PAGE = b"""<!DOCTYPE html><html><head><title>t</title></head><body>
<a href="http://other.example.org/abs">Abs  Link</a>
<a href="/rooted/path">rooted</a>
<a href="sibling.html">sib</a>
<a href="?q=1">query only</a>
<a href="../up/">up</a>
<a href="#frag-only">skip me</a>
<a href="http://x.example.com/page#frag">frag stripped</a>
<a href="mailto:a@example.com">mail</a>
<a href="javascript:void(0)">js</a>
<a href="tel:+41123">tel</a>
<a href="ftp://files.example.com/f">ftp</a>
<a name="no-href">anchor without href</a>
<a href="   ">blank</a>
<a href="/dup">one</a>
<a href="/dup">two</a>
</body></html>"""

BASE_PAGE = b"""<html><head><base href="http://cdn.example.net/assets/">
</head><body><a href="img/x.html">via base</a>
<a href="/root">rooted ignores base path but keeps its host</a>
</body></html>"""


class TestParseOutlinks:
    def test_resolution_and_filtering(self):
        got = parse_outlinks(PAGE, "http://site.example.com/a/b/page.html")
        urls = [u for u, _ in got]
        assert urls == [
            "http://other.example.org/abs",
            "http://site.example.com/rooted/path",
            "http://site.example.com/a/b/sibling.html",
            "http://site.example.com/a/b/page.html?q=1",
            "http://site.example.com/a/up/",
            "http://x.example.com/page",      # fragment stripped
            "http://site.example.com/dup",    # duplicates kept
            "http://site.example.com/dup",
        ]

    def test_anchor_text_whitespace_collapsed(self):
        got = parse_outlinks(PAGE, "http://s.example.com/")
        assert got[0][1] == "Abs Link"

    def test_base_href(self):
        got = parse_outlinks(BASE_PAGE, "http://site.example.com/page")
        assert got[0][0] == "http://cdn.example.net/assets/img/x.html"
        # a rooted href resolves against the BASE host, not the page's
        assert got[1][0] == "http://cdn.example.net/root"

    def test_garbage_and_empty_isolated(self):
        assert parse_outlinks(None, "http://x.example.com/") == []
        assert parse_outlinks(b"", "http://x.example.com/") == []
        assert parse_outlinks(b"\x00\xff\xfe garbage", None) == []


class TestExtractOutlinks:
    def test_explodes_and_isolates(self, spark):
        rows = [
            ("http://a.example.com/", PAGE),
            ("http://b.example.com/", None),          # no body: 0 rows
            ("http://c.example.com/", b"<html><body>"
             b'<a href="/only">x</a></body></html>'),
        ]
        pages = spark.createDataFrame(rows, "url string, html binary")
        links = extract_outlinks(pages).collect()
        by_src = {}
        for r in links:
            by_src.setdefault(r.src_url, []).append(r.dst_url)
        assert len(by_src["http://a.example.com/"]) == 8
        assert "http://b.example.com/" not in by_src
        assert by_src["http://c.example.com/"] == [
            "http://c.example.com/only"]


DISCOVERY_PAGE = b"""<html><body>
<a href="/new1">n1</a>
<a href="/new1#frag">n1 alias via fragment</a>
<a href="/new2?utm_source=z&q=1">n2 with tracking param</a>
<a href="/known">already crawled</a>
<a href="http://OTHER.example.org:80/x">offsite, host case + port</a>
<a href="mailto:x@example.com">skip</a>
</body></html>"""


class TestDiscoverFrontier:
    def _pages(self, spark):
        return spark.createDataFrame(
            [("http://site.example.com/a", DISCOVERY_PAGE)],
            "url string, html binary")

    def _known(self, spark):
        return spark.createDataFrame(
            [("http://site.example.com/known",),
             ("http://site.example.com/a",)], "url string")

    def test_new_canonical_candidates_with_ref_counts(self, spark):
        got = {r.loc: r.n_refs for r in discover_frontier(
            self._pages(spark), self._known(spark)).collect()}
        # fragment alias collapses onto /new1 (2 refs), the tracking
        # param is stripped from /new2, the known url and the page
        # itself are excluded, the offsite host is canonicalized
        # (lowercase, default port dropped) and kept without a scope
        assert got == {"http://site.example.com/new1": 2,
                       "http://site.example.com/new2?q=1": 1,
                       "http://other.example.org/x": 1}

    def test_scope_hosts_restricts(self, spark):
        scope = spark.createDataFrame([("site.example.com",)],
                                      "host string")
        got = {r.loc for r in discover_frontier(
            self._pages(spark), self._known(spark),
            scope_hosts=scope).collect()}
        assert got == {"http://site.example.com/new1",
                       "http://site.example.com/new2?q=1"}

    def test_known_aliases_never_requeue(self, spark):
        # the known set is given in NON-canonical form; membership is
        # still caught because both sides canonicalize
        known = spark.createDataFrame(
            [("HTTP://site.example.com:80/known",),
             ("http://site.example.com/a#top",)], "url string")
        got = {r.loc for r in discover_frontier(
            self._pages(spark), known).collect()}
        assert "http://site.example.com/known" not in got
        assert "http://site.example.com/new1" in got


def _g(spark, edges):
    return spark.createDataFrame(edges, "src string, dst string")


def _nodes(spark, names):
    return spark.createDataFrame([(x,) for x in names], "node string")


def _py_pagerank(names, edges, n_iter=3, d=0.85):
    """Plain-float reference power method with the same semantics as
    the operator (uniform dangling redistribution, out-of-universe
    landings dropped, sources outside the universe contribute
    nothing)."""
    n = len(names)
    pr = {v: 1.0 / n for v in names}
    out_deg = {}
    for s, _t in edges:
        out_deg[s] = out_deg.get(s, 0) + 1
    for _ in range(n_iter):
        dangling = sum(pr[v] for v in names if v not in out_deg)
        contrib = {v: 0.0 for v in names}
        for s, t in edges:
            if s in pr and t in contrib:
                contrib[t] += pr[s] / out_deg[s]
        pr = {v: (1.0 - d) / n + d * (contrib[v] + dangling / n)
              for v in names}
    return pr


class TestAnchorProfile:
    LINKS = [
        # normalization folds these three into one anchor "home page"
        ("s1", "d1", "Home  Page"),
        ("s2", "d1", "home page"),
        ("s3", "d1", "  HOME\tPAGE "),
        ("s4", "d1", "docs"),
        ("s5", "d1", "docs"),
        ("s6", "d1", "about"),
        ("s7", "d1", "zzz-rare"),
        ("s8", "d1", ""),            # empty anchor: dropped
        ("s9", "d1", "   "),         # whitespace-only: dropped
        ("d1", "d1", "self"),        # self-link: dropped
        ("s1", "d2", "b"),           # d2: all-tied counts — rank by
        ("s2", "d2", "a"),           # anchor asc
        ("s3", "d2", "c"),
    ]

    def _links(self, spark):
        return spark.createDataFrame(
            self.LINKS, "src_url string, dst_url string, anchor string")

    def test_profile_matches_python_oracle(self, spark):
        got = {r.dst_url: r for r in
               anchor_text_profile(self._links(spark), k=2).collect()}
        d1 = got["d1"]
        # 7 non-empty non-self anchor refs, 4 distinct after norm
        assert (d1.n_anchor_refs, d1.n_distinct_anchors) == (7, 4)
        assert [(t.anchor, t.n) for t in d1.top_anchors] == \
            [("home page", 3), ("docs", 2)]
        d2 = got["d2"]
        assert (d2.n_anchor_refs, d2.n_distinct_anchors) == (3, 3)
        # all counts tie at 1 — deterministic anchor-asc order
        assert [(t.anchor, t.n) for t in d2.top_anchors] == \
            [("a", 1), ("b", 1)]

    def test_salted_two_phase_equals_single_window(self, spark):
        links = self._links(spark)
        salted = anchor_text_profile(links, k=2, salt_buckets=16)
        plain = anchor_text_profile(links, k=2, salt_buckets=None)
        assert sorted(map(repr, salted.collect())) == \
            sorted(map(repr, plain.collect()))


class TestGraphOps:
    def test_build_edges_drops_self_loops_and_dups(self, spark):
        links = spark.createDataFrame(
            [("a", "b"), ("a", "b"), ("a", "a"), ("b", "c")],
            "src_url string, dst_url string")
        got = sorted((r.src_url, r.dst_url)
                     for r in build_edges(links).collect())
        assert got == [("a", "b"), ("b", "c")]

    def test_degrees_zero_filled_and_universe_bounded(self, spark):
        nodes = _nodes(spark, ["a", "b", "c"])
        edges = _g(spark, [("a", "b"), ("a", "c"), ("b", "c"),
                           ("a", "http://unfetched.example.com/")])
        got = {r.node: (r.out_deg, r.in_deg)
               for r in degrees(nodes, edges, "node").collect()}
        assert got == {"a": (3, 0), "b": (1, 1), "c": (0, 2)}

    def test_pagerank_matches_reference_power_method(self, spark):
        names = ["a", "b", "c", "d", "e"]
        edges = [("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"),
                 ("d", "c"), ("e", "a"), ("e", "b"), ("e", "c")]
        got = {r.node: r.pr for r in pagerank(
            _nodes(spark, names), _g(spark, edges), "node").collect()}
        want = _py_pagerank(names, edges)
        assert set(got) == set(want)
        for v in names:
            assert got[v] == pytest.approx(want[v], abs=1e-9)
        # every dst is internal and there are no dangling leaks:
        # total mass is conserved
        assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)

    def test_pagerank_dangling_redistributes(self, spark):
        # b is a sink: its mass must spread uniformly, not vanish
        names = ["a", "b", "c"]
        edges = [("a", "b"), ("c", "b")]
        got = {r.node: r.pr for r in pagerank(
            _nodes(spark, names), _g(spark, edges), "node").collect()}
        want = _py_pagerank(names, edges)
        for v in names:
            assert got[v] == pytest.approx(want[v], abs=1e-9)
        assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)
        assert got["b"] > got["a"]

    def test_pagerank_partitioning_invariant(self, spark):
        names = [f"n{i}" for i in range(40)]
        edges = [(f"n{i}", f"n{(i * 7 + 3) % 40}") for i in range(40)
                 for _ in (0,)] + \
                [(f"n{i}", f"n{(i * 11 + 5) % 40}") for i in range(0, 40, 3)]
        edges = [(s, t) for s, t in edges if s != t]
        nodes1 = _nodes(spark, names)
        e1 = _g(spark, edges)
        a = {r.node: r.pr for r in pagerank(nodes1, e1, "node").collect()}
        b = {r.node: r.pr for r in pagerank(
            nodes1.repartition(7), e1.repartition(5), "node").collect()}
        assert a == b  # bit-identical: decimal sums kill order effects
