"""robots.txt gating for the frontier (north-rule component: "per-host
politeness buckets with robots.txt gating").

The reference crawler never fetches robots.txt (its sites are its own —
/root/reference/ftw/crawler/fetcher.py has no robots handling), but a
Common-Crawl-scale frontier scheduler must gate fetches on the robots
exclusion protocol. Semantics implemented (the de-facto REP standard,
RFC 9309 §2.2.2 with the §2.2.3 special characters): within the
``User-agent: *`` group, the rule with the LONGEST pattern (raw octet
length, ``*``/``$`` included — the RFC's "most specific match" order)
wins; at equal length ``Allow`` beats ``Disallow``; no matching rule ⇒
allowed; no robots.txt for the host ⇒ allowed. ``*`` matches any span
(including empty); a TERMINAL ``$`` anchors the end of the path
(elsewhere ``$`` is literal — the common-crawler reading).

Scale shape: robots bodies are per-HOST (one row per host — millions of
rows at web scale, but KBs each and reusable across the host's URLs),
parsed ONCE into a rules array, and the gate itself is pure Column
expressions over the broadcast-joined rules array (whole-stage codegen,
no Python in the per-URL path). The parse is an Arrow pandas UDF over
the tiny per-host table.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

RULES_TYPE = T.ArrayType(T.StructType([
    T.StructField("allow", T.BooleanType()),
    T.StructField("prefix", T.StringType()),   # the raw rule pattern
    T.StructField("regex", T.StringType()),    # non-NULL iff wildcarded
]))


def pattern_regex(pattern: str) -> str | None:
    """Anchored regex for a rule pattern that uses RFC 9309 §2.2.3
    special characters, or None for a plain prefix rule (which the
    evaluators match with the cheaper ``startswith``). ``re.escape``
    output is valid in Python re, Java regex and RE2 alike (it only
    backslash-escapes punctuation), so ONE translation serves the
    Spark gate, the DuckDB oracle and the Python evaluator."""
    import re as _re
    anchor = pattern.endswith("$")
    core = pattern[:-1] if anchor else pattern
    if "*" not in core and not anchor:
        return None
    return ("^" + ".*".join(_re.escape(p) for p in core.split("*"))
            + ("$" if anchor else ""))


def parse_robots_txt(text: str) -> list:
    """Parse a robots.txt body into [(allow, prefix), ...] for the
    ``User-agent: *`` group. Shared by the Spark parse UDF and the
    plain-Python test oracle.

    Grouping per RFC 9309 §2.1: consecutive User-agent lines open a
    group; rules attach to the open group; only groups containing
    ``*`` apply here. Empty Disallow ("Disallow:") means allow-all and
    contributes no rule.
    """
    rules: list = []
    active = False          # current group applies to *
    in_agents = True        # currently reading a User-agent run
    agents: list = []
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line:
            continue
        key, _, value = line.partition(":")
        key = key.strip().lower()
        value = value.strip()
        if key == "user-agent":
            if not in_agents:
                agents = []
                in_agents = True
            agents.append(value)
            active = "*" in agents
        elif key in ("allow", "disallow"):
            in_agents = False
            if active and value:
                rules.append((key == "allow", value))
        else:
            in_agents = False
    return rules


def parse_crawl_delay(text: str) -> float | None:
    """``Crawl-delay`` of the ``User-agent: *`` group (the de-facto REP
    extension — not in RFC 9309 but honored by major crawlers). First
    valid value in the group wins; absent/invalid ⇒ None. Same group
    semantics as parse_robots_txt."""
    delay = None
    active = False
    in_agents = True
    agents: list = []
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line:
            continue
        key, _, value = line.partition(":")
        key = key.strip().lower()
        value = value.strip()
        if key == "user-agent":
            if not in_agents:
                agents = []
                in_agents = True
            agents.append(value)
            active = "*" in agents
        else:
            in_agents = False
            if key == "crawl-delay" and active and delay is None:
                try:
                    delay = float(value)
                except ValueError:
                    pass
    return delay


@F.pandas_udf(T.DoubleType())
def parse_crawl_delay_udf(body: pd.Series) -> pd.Series:
    return pd.Series([
        parse_crawl_delay(bytes(b).decode("utf-8", errors="replace"))
        if b is not None else None
        for b in body], dtype="float64")


def robots_crawl_delays(robots: DataFrame, host_col: str = "host",
                        body_col: str = "robots_txt") -> DataFrame:
    """(host, crawl_delay) for hosts whose robots declares one — tiny
    (per-host), broadcast into the politeness host-state seed."""
    return (robots.select(
        F.col(host_col).alias("host"),
        parse_crawl_delay_udf(F.col(body_col)).alias("crawl_delay"))
        .filter(F.col("crawl_delay").isNotNull()))


def parse_sitemap_directives(text: str) -> list:
    """``Sitemap:`` directive URLs in declaration order (RFC 9309
    §2.2.4 treats it as a group-independent record — it applies
    regardless of any User-agent group)."""
    out = []
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        key, _, value = line.partition(":")
        if key.strip().lower() == "sitemap":
            value = value.strip()
            if value:
                out.append(value)
    return out


@F.pandas_udf(T.ArrayType(T.StringType()))
def parse_sitemap_directives_udf(body: pd.Series) -> pd.Series:
    return pd.Series([
        parse_sitemap_directives(
            bytes(b).decode("utf-8", errors="replace"))
        if b is not None else []
        for b in body])


def robots_sitemap_urls(robots: DataFrame, host_col: str = "host",
                        body_col: str = "robots_txt") -> DataFrame:
    """(host, sitemap_url, sitemap_ord) from robots ``Sitemap:``
    directives — the de-facto primary sitemap discovery channel on the
    open web, complementing the reference's well-known-path probes
    (sitemaps.py discovery). Parsed executor-side; order preserved so
    a frontier built from directives keeps a deterministic crawl_seq.

    Kept out of the reference-parity discovery path by default: the
    reference's probe order (sitemap.py:32-52) is a pinned semantics
    this engine reproduces exactly; directive-based discovery is the
    web-scale extension a Common-Crawl frontier would feed from."""
    return (robots.select(
        F.col(host_col).alias("host"),
        F.posexplode(parse_sitemap_directives_udf(F.col(body_col)))
        .alias("sitemap_ord", "sitemap_url"))
        .select("host", "sitemap_url", "sitemap_ord"))


def is_path_allowed(path: str, rules: list) -> bool:
    """Longest-pattern match (wildcards included); ties → allow.
    Oracle-side evaluator — same semantics as ``allowed_col``."""
    import re as _re
    best_len = -1
    best_allow = True
    for allow, pattern in rules:
        rx = pattern_regex(pattern)
        hit = (_re.match(rx, path) is not None) if rx else \
            path.startswith(pattern)
        if hit:
            ln = len(pattern)
            if ln > best_len or (ln == best_len and allow):
                best_len = ln
                best_allow = allow
    return best_allow


@F.pandas_udf(RULES_TYPE)
def parse_robots_udf(body: pd.Series) -> pd.Series:
    return pd.Series([
        [(allow, pat, pattern_regex(pat)) for allow, pat in
         parse_robots_txt(bytes(b).decode("utf-8", errors="replace"))]
        if b is not None else []
        for b in body])


def robots_rules(robots: DataFrame, host_col: str = "host",
                 body_col: str = "robots_txt") -> DataFrame:
    """(host, rules) — parse each host's robots body once."""
    return robots.select(
        F.col(host_col).alias("host"),
        parse_robots_udf(F.col(body_col)).alias("__robots_rules"))


def allowed_col(rules: Column, path: Column) -> Column:
    """Pure-expression longest-pattern-match evaluation.

    ``array_max`` over struct(pattern_len, allow) implements "longest
    pattern wins, allow beats disallow on ties" because struct
    comparison is lexicographic and false < true. Plain prefix rules
    match with ``startswith``; wildcard rules with their precomputed
    anchored regex (``regexp_like`` on the tiny per-host rules array —
    the per-URL hot path stays pure column expressions). NULL rules
    (host absent from the robots table) ⇒ allowed.
    """
    matched = F.filter(
        rules,
        lambda r: F.when(r["regex"].isNotNull(),
                         F.regexp_like(path, r["regex"]))
        .otherwise(path.startswith(r["prefix"])))
    best = F.array_max(F.transform(
        matched, lambda r: F.struct(F.length(r["prefix"]).alias("l"),
                                    r["allow"].alias("allow"))))
    return F.coalesce(best["allow"], F.lit(True))


def apply_robots(frontier: DataFrame, rules: DataFrame,
                 url_col: str = "loc") -> DataFrame:
    """Broadcast-join per-host rules and mark each frontier row with
    ``robots_allowed``. The join key is the already-computed ``host``
    column; the path is extracted with a regex (NOT ``parse_url``,
    whose Java-URI parser yields NULL for unescaped non-ASCII urls —
    the python-side oracle uses ``urlparse``, which doesn't)."""
    path = F.regexp_extract(
        F.col(url_col), r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    out = frontier.join(F.broadcast(rules), "host", "left")
    return (out.withColumn(
        "robots_allowed",
        allowed_col(F.col("__robots_rules"), path))
        .drop("__robots_rules"))
