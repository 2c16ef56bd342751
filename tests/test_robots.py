"""robots.txt gating: parser grouping, longest-prefix/tie semantics,
and the pure-column Spark evaluation against the python evaluator."""

from __future__ import annotations

from pyspark.sql import functions as F

from ftw_crawler_spark.operators.robots import (
    apply_robots, is_path_allowed, parse_robots_txt, robots_rules)

BODY = """# comment
User-agent: otherbot
Disallow: /

User-agent: googlebot
User-agent: *
Disallow: /private/
Disallow: /tmp
Allow: /private/public
Disallow:
Crawl-delay: 10
"""


def test_parse_groups_and_rules():
    rules = parse_robots_txt(BODY)
    # only the group containing '*' applies; empty Disallow dropped
    assert rules == [(False, "/private/"), (False, "/tmp"),
                     (True, "/private/public")]


def test_parse_star_only_group_ignored_for_other_agents():
    assert parse_robots_txt("User-agent: foo\nDisallow: /x\n") == []


def test_longest_prefix_wins():
    rules = parse_robots_txt(BODY)
    assert is_path_allowed("/", rules)
    assert not is_path_allowed("/private/a", rules)
    assert is_path_allowed("/private/public/x", rules)
    assert not is_path_allowed("/tmp/file", rules)
    assert is_path_allowed("/tmpx", rules) is False  # prefix, not segment
    assert is_path_allowed("/other", rules)


def test_tie_allow_wins():
    rules = [(False, "/a/"), (True, "/a/")]
    assert is_path_allowed("/a/x", rules)


def test_spark_gate_matches_python(spark):
    robots = spark.createDataFrame(
        [("h.example", BODY.encode()), ("empty.example", b"")],
        "host string, robots_txt binary")
    rules = robots_rules(robots)
    paths = ["/", "/private/a", "/private/public/x", "/tmp", "/tmpx",
             "/other", "/b\xe4r"]
    rows = ([("h.example", f"http://h.example{p}") for p in paths]
            + [("empty.example", "http://empty.example/private/a"),
               ("nobots.example", "http://nobots.example/private/a")])
    frontier = spark.createDataFrame(rows, "host string, loc string")
    out = {(r["host"], r["loc"]): r["robots_allowed"]
           for r in apply_robots(frontier, rules).collect()}
    py_rules = parse_robots_txt(BODY)
    for p in paths:
        assert out[("h.example", f"http://h.example{p}")] == \
            is_path_allowed(p, py_rules), p
    # empty body and absent host are both allow-all
    assert out[("empty.example", "http://empty.example/private/a")]
    assert out[("nobots.example", "http://nobots.example/private/a")]


WILD_BODY = """User-agent: *
Disallow: /files/*.pdf
Allow: /files/public*.pdf
Disallow: /*?session=
Disallow: /exact$
Allow: /do$lar
"""


def test_pattern_regex_translation():
    from ftw_crawler_spark.operators.robots import pattern_regex
    assert pattern_regex("/plain/prefix") is None
    assert pattern_regex("/a/*.pdf") == "^/a/.*\\.pdf"
    assert pattern_regex("/exact$") == "^/exact$"
    # a non-terminal $ is literal, and alone doesn't need a regex...
    assert pattern_regex("/do$lar") is None
    # ...unless combined with a wildcard or terminal anchor
    assert pattern_regex("/do$lar*x$") == "^/do\\$lar.*x$"


def test_wildcard_match_semantics():
    rules = parse_robots_txt(WILD_BODY)
    assert (False, "/files/*.pdf") in rules
    # * spans any run; longest raw pattern wins the precedence fight
    assert not is_path_allowed("/files/a/b/secret.pdf", rules)
    assert is_path_allowed("/files/public-2024.pdf", rules)
    assert is_path_allowed("/files/readme.txt", rules)
    # mid-path wildcard over the query-ish segment
    assert not is_path_allowed("/page?session=abc", rules)
    # terminal $ anchors; without it the rule would gate the subtree
    assert not is_path_allowed("/exact", rules)
    assert is_path_allowed("/exact/sub", rules)
    assert is_path_allowed("/exactly", rules)
    # non-terminal $ is a literal character
    assert is_path_allowed("/do$lar", rules)


def test_spark_wildcard_gate_matches_python(spark):
    robots = spark.createDataFrame(
        [("w.example", WILD_BODY.encode())],
        "host string, robots_txt binary")
    paths = ["/files/a/b/secret.pdf", "/files/public-2024.pdf",
             "/files/readme.txt", "/page?x=1", "/exact", "/exact/sub",
             "/exactly", "/do$lar", "/"]
    frontier = spark.createDataFrame(
        [("w.example", f"http://w.example{p}") for p in paths],
        "host string, loc string")
    out = {r["loc"]: r["robots_allowed"] for r in
           apply_robots(frontier, robots_rules(robots)).collect()}
    py_rules = parse_robots_txt(WILD_BODY)
    for p in paths:
        # the gate matches on the PATH component (query excluded), so
        # compare against the oracle on the same slice
        path_only = p.split("?", 1)[0]
        assert out[f"http://w.example{p}"] == \
            is_path_allowed(path_only, py_rules), p


def test_crawl_world_gates_disallowed_buckets(spark, tiny_world):
    """The synthetic world's robots (site0 /page/13/, /page/7/ minus
    doc-1*) must keep gated urls out of the index — engine side."""
    import tempfile

    from datetime import datetime

    from ftw_crawler_spark.plans.crawl import run_crawl
    out = tempfile.mkdtemp(prefix="robots_e2e_")
    result = run_crawl(spark, tiny_world, out,
                       crawl_time=datetime(2026, 1, 15, 12))
    crawled = [r["url"] for r in result.index()
               .filter(F.col("batch_id").isNotNull())
               .select("url").collect()]
    assert crawled, "crawl indexed nothing"
    site0 = "https://site0.example.ch/"
    for u in crawled:
        if u.startswith(site0):
            assert "/page/13/" not in u
            if "/page/7/" in u:
                assert u.split("/page/7/")[1].startswith("doc-1")
        assert not u.startswith("http://site4.example.net/stuff")
    # the gate actually fired: site0 has /page/13/ urls in its sitemaps
    # that must be absent from the crawl
    assert any(u.startswith(site0) for u in crawled)


def test_parse_crawl_delay_group_semantics():
    from ftw_crawler_spark.operators.robots import parse_crawl_delay
    assert parse_crawl_delay(
        "User-agent: *\nCrawl-delay: 2.5\nDisallow: /x\n") == 2.5
    # delay in a non-* group does not apply
    assert parse_crawl_delay(
        "User-agent: otherbot\nCrawl-delay: 9\n"
        "User-agent: *\nDisallow: /x\n") is None
    # first valid value in the * group wins; invalid values skipped
    assert parse_crawl_delay(
        "User-agent: *\nCrawl-delay: nope\nCrawl-delay: 3\n"
        "Crawl-delay: 7\n") == 3.0
    assert parse_crawl_delay("User-agent: *\nDisallow: /\n") is None


def test_crawl_delay_raises_politeness_sleeptime(spark):
    from ftw_crawler_spark.operators import politeness
    from ftw_crawler_spark.operators.robots import robots_crawl_delays

    frontier = spark.createDataFrame(
        [(0, f"https://slow.example.org/d{i}", "slow.example.org", i)
         for i in range(10)]
        + [(1, f"https://fast.example.org/d{i}", "fast.example.org",
            100 + i) for i in range(10)],
        "site_id int, loc string, host string, crawl_seq long")
    sites = spark.createDataFrame(
        [(0, "https://slow.example.org/", 0.1),
         (1, "https://fast.example.org/", 0.1)],
        "site_id int, url string, sleeptime double")
    robots = spark.createDataFrame(
        [("slow.example.org",
          b"User-agent: *\nCrawl-delay: 30\n")],
        "host string, robots_txt binary")

    delays = robots_crawl_delays(robots)
    hs = politeness.initial_host_state(frontier, sites,
                                       crawl_delays=delays)
    state = {r["host"]: r["sleeptime"] for r in hs.collect()}
    assert state["slow.example.org"] == 30.0   # raised by robots
    assert state["fast.example.org"] == 0.1    # site config floor

    # batch budget 60s: slow host admits floor(60/30)=2, fast all 10
    batch = politeness.select_batch(frontier, hs, 60.0)
    per_host = {r["host"]: r["n"] for r in
                batch.groupBy("host").agg(
                    F.count(F.lit(1)).alias("n")).collect()}
    assert per_host == {"slow.example.org": 2, "fast.example.org": 10}


def test_sitemap_directives_parse_and_spark(spark):
    from ftw_crawler_spark.operators.robots import (
        parse_sitemap_directives, robots_sitemap_urls)
    body = (b"User-agent: *\nDisallow: /x\n"
            b"Sitemap: https://a.example.org/sm1.xml\n"
            b"User-agent: otherbot\n"
            b"Sitemap: https://a.example.org/sm2.xml.gz\n"
            b"# Sitemap: https://a.example.org/commented.xml\n"
            b"sitemap:\n")
    # group-independent (RFC 9309 2.2.4): both directives apply,
    # commented/empty ones do not
    assert parse_sitemap_directives(body.decode()) == [
        "https://a.example.org/sm1.xml",
        "https://a.example.org/sm2.xml.gz"]
    robots = spark.createDataFrame(
        [("a.example.org", body), ("b.example.org", b"User-agent: *\n")],
        "host string, robots_txt binary")
    rows = sorted((r["host"], r["sitemap_ord"], r["sitemap_url"])
                  for r in robots_sitemap_urls(robots).collect())
    assert rows == [
        ("a.example.org", 0, "https://a.example.org/sm1.xml"),
        ("a.example.org", 1, "https://a.example.org/sm2.xml.gz")]
