"""Sequential plain-Python oracle of the reference crawl semantics.

Re-executes the reference's nested single-threaded loop
(main.py:69-162) directly over the synthetic world parquet — no Spark —
producing the expected crawl order, URL-seen set, purge set and final
index contents. The distributed engine must match these exactly.

Scalar extraction reuses the per-row extractor classes from
ftw_crawler_spark.config (whose byte-identity against the reference is
pinned independently by the ported goldens in test_scalars.py); what
this oracle independently exercises is everything the Spark plan
distributes: discovery order, frontier expansion order, last-indexed
lookup, is_modified gates, redirect/error skips, purge membership, and
upsert-by-UID last-write-wins.
"""

from __future__ import annotations

import os
from datetime import timezone

import pyarrow.parquet as pq

from ftw_crawler_spark import config as cfg
from ftw_crawler_spark.functions import scalars
from ftw_crawler_spark.operators.robots import (is_path_allowed,
                                                parse_robots_txt)
from ftw_crawler_spark.operators.sitemaps import (
    SITEMAP_INDEX_NAMES, SITEMAP_NAMES, parse_entries)
from urllib.parse import urljoin, urlparse


def _read(path):
    return pq.read_table(path).to_pylist()


def run_oracle(world_dir: str, sites, config, crawl_time,
               url_filter=None, force=False):
    """Returns dict with keys: crawl_order (list of loc in crawl order),
    purged (set of UID), skipped (dict loc → reason), index (dict UID →
    doc dict), seen (set of loc successfully indexed)."""
    sitemaps = {r["sitemap_url"]: r
                for r in _read(f"{world_dir}/sitemaps.parquet")}
    pages = {r["url"]: r for r in _read(f"{world_dir}/pages.parquet")}
    index0 = _read(f"{world_dir}/index0.parquet")
    fetch_status = {r["url"]: r
                    for r in _read(f"{world_dir}/fetch_status.parquet")}
    robots_rules = {}
    if os.path.exists(f"{world_dir}/robots.parquet"):
        robots_rules = {
            r["host"]: parse_robots_txt(
                bytes(r["robots_txt"]).decode("utf-8", errors="replace"))
            for r in _read(f"{world_dir}/robots.parquet")}

    crawl_time = crawl_time.replace(tzinfo=timezone.utc) \
        if crawl_time.tzinfo is None else crawl_time

    index = {}
    for row in index0:
        index[row["UID"]] = dict(row)

    crawl_order, skipped, purged = [], {}, set()

    for site in sites:
        if url_filter and not url_filter.startswith(site.url):
            continue  # main.py:76-78
        # --- discovery (sitemap.py:20-52,138-175)
        sm_urls = _resolve(site, sitemaps)
        site_sitemaps = []
        for sm_url in sm_urls:
            r = sitemaps[sm_url]
            site_sitemaps.append(parse_entries(bytes(r["xml"]), r["gz"]))

        # --- index scan (main.py:49-58)
        indexed_docs = [
            d for d in index.values()
            if (site.crawler_site_id is not None
                and d.get("crawler_site_id") == site.crawler_site_id)
            or (site.crawler_site_id is None
                and d["url"].startswith(site.url))]

        # --- purge (purging.py:8-30)
        all_locs_lower = {e["loc"].lower()
                          for sm in site_sitemaps for e in sm}
        for d in list(indexed_docs):
            if d["url"].startswith(site.url) \
                    and d["url"].lower() not in all_locs_lower:
                purged.add(d["UID"])
                index.pop(d["UID"], None)

        # --- crawl loop (main.py:107-159)
        for entries in site_sitemaps:
            for e in entries:
                loc = e["loc"]
                if url_filter and loc != url_filter:
                    continue  # main.py:117-119
                # robots gate (engine: plans/crawl.py skip classifier) —
                # checked before any fetch-dependent logic
                host = (urlparse(loc).hostname or "").lower()
                if host in robots_rules:
                    path = urlparse(loc).path or "/"
                    if not is_path_allowed(path, robots_rules[host]):
                        skipped[loc] = "robots_disallowed"
                        continue
                last_indexed = None  # main.py:61-66 (pre-purge list ok:
                # purged docs are never in the sitemap)
                for d in indexed_docs:
                    if d["url"] == loc:
                        last_indexed = d["modified"]
                        break
                page = pages.get(loc)
                fs = fetch_status.get(loc)
                status = fs["status"] if fs else 200

                # is_modified (fetcher.py:26-43)
                if not force and last_indexed is not None:
                    li = last_indexed.replace(tzinfo=timezone.utc)
                    if e["lastmod"] is not None:
                        lm = scalars.from_iso_datetime(e["lastmod"])
                        modified = lm > li
                    elif page is not None:
                        wt = page["warc_ts"].replace(tzinfo=timezone.utc)
                        modified = wt > li
                    else:
                        modified = True
                    if not modified:
                        skipped[loc] = "not_modified"
                        continue
                if 300 <= status < 400:
                    skipped[loc] = "redirect"      # fetcher.py:54-58
                    continue
                if status != 200 or page is None:
                    skipped[loc] = "fetch_error"   # fetcher.py:68-70
                    continue

                doc = _extract(e, page, fs, site, config, crawl_time)
                if site.crawler_site_id:
                    doc["crawler_site_id"] = site.crawler_site_id
                index[doc["UID"]] = doc            # upsert (solr.py:29-50)
                crawl_order.append(loc)

    return {"crawl_order": crawl_order, "purged": purged,
            "skipped": skipped, "index": index,
            "seen": set(crawl_order)}


def _resolve(site, sitemaps):
    if site.sitemap_urls:
        return list(site.sitemap_urls)
    for name in SITEMAP_INDEX_NAMES:
        u = urljoin(site.url, name)
        if u in sitemaps and sitemaps[u]["is_index"]:
            infos = parse_entries(bytes(sitemaps[u]["xml"]),
                                  sitemaps[u]["gz"],
                                  container="sitemapindex",
                                  child="sitemap")
            return [i["loc"] for i in infos if i["loc"]]
    for name in SITEMAP_NAMES:
        u = urljoin(site.url, name)
        if u in sitemaps and not sitemaps[u]["is_index"]:
            return [u]
    raise AssertionError(f"no sitemap for {site.url}")


def _extract(entry, page, fs, site, config, crawl_time):
    headers = {"content-type": "text/html; charset=utf-8",
               "last-modified":
               page["warc_ts"].strftime("%Y-%m-%dT%H:%M:%S") + "Z"}
    if fs and fs.get("headers"):
        headers.update(fs["headers"])
    content_type = scalars.get_content_type(headers["content-type"])
    row = cfg._RowCtx(
        entry["loc"], entry["lastmod"], entry["target"],
        bytes(page["html"]) if page["html"] is not None else None,
        page["text"], content_type, headers, site.attributes, crawl_time)
    doc = {}
    for f in config.fields:
        value = f.extractor.eval_row(row)
        if value is cfg.NO_VALUE:
            if f.required:
                value = f.default_value()
            else:
                continue  # field omitted (extractors.py:137-140)
        doc[f.name] = value
    doc["url"] = doc[config.url_field]
    return doc
