"""URL canonicalization as pure Column expressions (codegen, no UDF).

A 10^10-URL frontier is full of aliases of the same resource —
case-varied hosts, default ports, fragments, tracking parameters. The
reference crawls 5 configured sites and never needed this; at web
scale canonicalization runs BEFORE the seen-filter so url variants
dedup to one fetch (pairs naturally with operators/seen.py: probe on
``canonical_url_col(url)`` instead of the raw url).

Canonical form (deliberately conservative — only equivalences that are
safe per RFC 3986 §6 plus the universally-safe tracking-param strip):

1. fragment removed (never sent to the server),
2. scheme and host lowercased (RFC 3986 §6.2.2.1),
3. default port stripped (``:80`` for http, ``:443`` for https),
4. empty path → ``/`` (RFC 3986 §6.2.3),
5. ``utm_*``, ``fbclid``, ``gclid`` query params dropped, remaining
   params kept IN ORDER (param reordering is not semantics-preserving
   for every server, so we don't).

Everything is regexp/array Column algebra — whole-stage codegen, and
byte-reproducible in ANSI SQL for the oracle gate.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

TRACKING_PARAM_RE = "^(utm_[^=]*|fbclid|gclid)="
_SCHEME_RE = "^([A-Za-z][A-Za-z0-9+.-]*)://"


def canonical_url_col(url: Column) -> Column:
    no_frag = F.regexp_replace(url, "#.*", "")
    scheme = F.lower(F.regexp_extract(no_frag, _SCHEME_RE, 1))
    rest = F.regexp_replace(no_frag, _SCHEME_RE, "")
    authority = F.lower(F.regexp_extract(rest, "^([^/?]*)", 1))
    host = (F.when(scheme == "http",
                   F.regexp_replace(authority, ":80$", ""))
            .when(scheme == "https",
                  F.regexp_replace(authority, ":443$", ""))
            .otherwise(authority))
    tail = F.regexp_replace(rest, "^[^/?]*", "")
    raw_path = F.regexp_extract(tail, "^([^?]*)", 1)
    path = F.when(raw_path == "", F.lit("/")).otherwise(raw_path)
    query = F.regexp_extract(tail, r"\?(.*)$", 1)
    kept = F.filter(
        F.split(query, "&"),
        lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_RE))
    q = F.array_join(kept, "&")
    return F.concat(
        scheme, F.lit("://"), host, path,
        F.when(q != "", F.concat(F.lit("?"), q)).otherwise(F.lit("")))


def url_trap_cols(url: Column) -> dict:
    """Crawler-trap signals for a frontier URL — the guard that stops a
    10^10-URL crawl from sinking budget into auto-generated URL spaces
    (session-id mazes, calendar pages, path loops). Classic signals,
    each a pure codegen Column (no UDF, no shuffle):

    - ``depth``: number of non-empty path segments (deep machine paths)
    - ``n_params``: query parameter count (parameter-explosion traps)
    - ``has_loop``: some path segment repeats >= 3 times — the loop
      trap a relative-link cycle produces (``/a/b/a/b/a/b``)
    - ``trap``: the combined gate (loop OR depth > 12 OR params > 8)

    All integer/boolean, reproducible in SQL for the oracle gate.
    Composes with the canonical form: run on canonical_url_col(url)
    so alias variants don't dodge the gate."""
    rest = F.regexp_replace(F.regexp_replace(url, "#.*", ""),
                            _SCHEME_RE, "")
    path = F.regexp_replace(F.regexp_extract(rest, "^[^?]*", 0),
                            "^[^/]*", "")
    query = F.regexp_extract(rest, r"\?(.*)$", 1)
    segs = F.filter(F.split(path, "/"), lambda s: s != "")
    depth = F.size(segs).cast("long")
    n_params = F.when(query == "", F.lit(0)).otherwise(
        F.size(F.split(query, "&"))).cast("long")
    has_loop = F.exists(
        F.array_distinct(segs),
        lambda s: F.size(F.filter(segs, lambda x: x == s)) >= 3)
    trap = has_loop | (depth > 12) | (n_params > 8)
    return {"depth": depth, "n_params": n_params,
            "has_loop": has_loop, "trap": trap}
