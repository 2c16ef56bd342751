"""Sitemap discovery + expansion: XML blobs → the frontier DataFrame.

Reference semantics (ftw/crawler/sitemap.py):

- discovery (S1/S2): static ``site.sitemap_urls`` short-circuits
  (sitemap.py:32-34); else probe ``{site.url}/sitemap_index.xml[.gz]``
  and verify it IS an index (sitemap.py:36-48); else fall back to a
  virtual index around ``{site.url}/sitemap.xml[.gz]``
  (sitemap.py:50-52, 158-175). Here "the web" is the ``sitemaps``
  table keyed by ``sitemap_url`` — a probe is a lookup.
- parse (S4/S5): ``/urlset/url`` (and ``/sitemapindex/sitemap``) nodes
  → dicts over PROPERTIES, absent children missing (sitemap.py:105-113,
  211-219); namespaces stripped before xpath (xml_utils/__init__.py:10-19).
- gzip: body gunzipped when flagged (utils.py:69-86).

Scale notes: the sites dim is tiny (broadcast); only sitemap-INDEX
bodies are collected to the driver (an index lists child sitemaps — KBs).
The child sitemap bodies (the big payload: up to 50k URLs each) are
parsed executor-side by an Arrow-batched UDF and exploded with
``posexplode`` so document order (url_ord) is preserved exactly —
crawl ordering depends on it (main.py:107,113).
"""

from __future__ import annotations

import io
import xml.etree.ElementTree as ET
from urllib.parse import urljoin, urlparse

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ftw_crawler_spark.functions.scalars import gunzip

SITEMAP_INDEX_NAMES = ("sitemap_index.xml", "sitemap_index.xml.gz")
SITEMAP_NAMES = ("sitemap.xml", "sitemap.xml.gz")
SITEMAP_NS = "http://www.sitemaps.org/schemas/sitemap/0.9"
PROPERTIES = ("loc", "lastmod", "changefreq", "priority", "target")


class NoSitemapFound(Exception):
    """Reference: ftw/crawler/exceptions.py (sitemap.py:174-175)."""


# ---------------------------------------------------------------------------
# pure-python XML parse (shared by UDF + driver-side index handling)
# ---------------------------------------------------------------------------


def _strip_ns(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


def parse_entries(xml_bytes: bytes, gz: bool = False,
                  container: str = "urlset", child: str = "url") -> list:
    """Parse <urlset>/<url> (or <sitemapindex>/<sitemap>) into ordered
    dicts over PROPERTIES; absent properties are absent keys (None here).
    Namespace handling = the reference's strip-then-xpath."""
    if gz:
        xml_bytes = gunzip(xml_bytes)
    root = ET.parse(io.BytesIO(xml_bytes)).getroot()
    if _strip_ns(root.tag) != container:
        return []
    out = []
    for node in root:
        if _strip_ns(node.tag) != child:
            continue
        info = {p: None for p in PROPERTIES}
        for sub in node:
            name = _strip_ns(sub.tag)
            if name in PROPERTIES and info[name] is None and sub.text:
                info[name] = sub.text
        out.append(info)
    return out


def is_sitemap_index(xml_bytes: bytes, gz: bool = False) -> bool:
    """sitemap.py:67-68 — any //sitemapindex node."""
    if gz:
        xml_bytes = gunzip(xml_bytes)
    try:
        root = ET.parse(io.BytesIO(xml_bytes)).getroot()
    except ET.ParseError:
        return False
    return _strip_ns(root.tag) == "sitemapindex" or any(
        _strip_ns(e.tag) == "sitemapindex" for e in root.iter())


ENTRY_TYPE = T.ArrayType(T.StructType(
    [T.StructField(p, T.StringType(), True) for p in PROPERTIES]))


@F.pandas_udf(ENTRY_TYPE)
def parse_urlset_udf(xml: pd.Series, gz: pd.Series) -> pd.Series:
    return pd.Series([
        [tuple(e[p] for p in PROPERTIES)
         for e in parse_entries(x, bool(g))]
        for x, g in zip(xml, gz)])


# ---------------------------------------------------------------------------
# discovery
# ---------------------------------------------------------------------------


def discover_sitemaps(spark: SparkSession, sites: list,
                      sitemaps: DataFrame) -> DataFrame:
    """Resolve each site's ordered sitemap list against the sitemaps
    table, reproducing the reference's discovery order. Returns a small
    DataFrame (site_id, sitemap_url, sitemap_ord) — one row per sitemap
    a real crawl would fetch.
    """
    # metadata probe set: don't pull XML bodies for plain sitemaps
    meta = {r["sitemap_url"]: (r["is_index"], r["gz"])
            for r in sitemaps.select("sitemap_url", "is_index", "gz")
            .collect()}
    index_bodies = {r["sitemap_url"]: (r["xml"], r["gz"])
                    for r in sitemaps.filter(F.col("is_index"))
                    .select("sitemap_url", "xml", "gz").collect()}

    rows = []
    for site in sites:
        resolved = _resolve_site(site, meta, index_bodies)
        for ord_, sm_url in enumerate(resolved):
            rows.append((site.site_id, sm_url, ord_))
    return spark.createDataFrame(
        rows, "site_id int, sitemap_url string, sitemap_ord int")


def _resolve_site(site, meta, index_bodies) -> list:
    # 1. static config short-circuits discovery (sitemap.py:32-34)
    if site.sitemap_urls:
        return list(site.sitemap_urls)
    # 2. probe sitemap_index.xml[.gz]; must actually BE an index
    #    (sitemap.py:36-48)
    for name in SITEMAP_INDEX_NAMES:
        url = urljoin(site.url, name)
        if url in meta:
            if url in index_bodies:
                xml, gz = index_bodies[url]
                infos = parse_entries(bytes(xml), gz,
                                      container="sitemapindex",
                                      child="sitemap")
                return [i["loc"] for i in infos if i["loc"]]
            # present but not an index → keep probing (reference falls
            # through the loop when is_sitemap_index() is False)
    # 3. single discovered sitemap → virtual index (sitemap.py:50-52,
    #    158-175)
    for name in SITEMAP_NAMES:
        url = urljoin(site.url, name)
        if url in meta and not meta[url][0]:
            return [url]
    raise NoSitemapFound(f"No sitemap found for {site.url}!")


# ---------------------------------------------------------------------------
# expansion → frontier
# ---------------------------------------------------------------------------


def expand_frontier(discovered: DataFrame, sitemaps: DataFrame) -> DataFrame:
    """Join the discovery result to sitemap bodies, parse executor-side,
    posexplode into the frontier with exact document order.

    Output: (site_id, sitemap_url, sitemap_ord, url_ord, loc, lastmod,
    changefreq, priority, target, host). The tiny discovery side is
    broadcast; the parse runs where the XML partition lives — no
    shuffle of bodies.
    """
    joined = sitemaps.join(F.broadcast(discovered), ["sitemap_url"],
                           "inner")
    parsed = joined.select(
        discovered["site_id"], "sitemap_url", "sitemap_ord",
        parse_urlset_udf(F.col("xml"), F.col("gz")).alias("entries"))
    exploded = parsed.select(
        "site_id", "sitemap_url", "sitemap_ord",
        F.posexplode("entries").alias("url_ord", "entry"))
    return exploded.select(
        "site_id", "sitemap_url", "sitemap_ord", "url_ord",
        F.col("entry.loc").alias("loc"),
        F.col("entry.lastmod").alias("lastmod"),
        F.col("entry.changefreq").alias("changefreq"),
        F.col("entry.priority").alias("priority"),
        F.col("entry.target").alias("target"),
        F.lower(F.parse_url(F.col("entry.loc"), F.lit("HOST")))
        .alias("host"),
    ).filter(F.col("loc").isNotNull())


def build_frontier(spark: SparkSession, sites: list,
                   sitemaps: DataFrame) -> DataFrame:
    """Discovery + expansion + the deterministic global crawl order key.

    ``crawl_seq`` reproduces the reference's nested-loop total order:
    config-declaration site order × index sitemap order × document url
    order (main.py:75,107,113). Computed from the ordinal triple (no
    window over the full frontier needed — the triple IS the order)."""
    discovered = discover_sitemaps(spark, sites, sitemaps)
    frontier = expand_frontier(discovered, sitemaps)
    # dense rank not required: any monotone function of the triple works
    return frontier.withColumn(
        "crawl_seq",
        (F.col("site_id").cast("long") * F.lit(1 << 40))
        + (F.col("sitemap_ord").cast("long") * F.lit(1 << 24))
        + F.col("url_ord").cast("long"))


def host_of(url: str) -> str:
    return (urlparse(url).hostname or "").lower()
