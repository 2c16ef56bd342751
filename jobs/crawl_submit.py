#!/usr/bin/env python
"""spark-submit entrypoint for the crawl pipeline (north rule: "run via
spark-submit --py-files on a multi-executor cluster").

Packaging:
    python tools/make_pyfiles.py            # → dist/ftw_crawler_spark.zip
    spark-submit --master <master> \\
        --py-files dist/ftw_crawler_spark.zip \\
        jobs/crawl_submit.py --world <world_dir> --out <out_dir>

The job carries NO hard-coded master/parallelism — spark-submit owns
cluster sizing, which is how the N vs 4N scaling runs are driven
(tools/bench_scaling.py uses local[8] / local[32] in this sandbox).

Exit: prints one JSON line with batches, per-batch metrics and the
final index row count. Re-running with the same --out resumes from the
last committed checkpoint (idempotent upsert sink).
"""

from __future__ import annotations

import argparse
import json
import sys
from datetime import datetime


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(description="ftw-crawler-spark crawl job")
    p.add_argument("--world", required=True,
                   help="synthetic-world dir (pages/sitemaps/index0/...)")
    p.add_argument("--out", required=True,
                   help="output dir (index sink + checkpoints)")
    p.add_argument("--config", default=None,
                   help="python config file declaring CONFIG = "
                        "CrawlerConfig(...) (reference bin/crawl "
                        "config.py surface); default: the canonical "
                        "20-field schema + the synthetic world's sites")
    p.add_argument("--url", default=None,
                   help="single-URL mode (reference bin/crawl <URL>)")
    p.add_argument("--force", action="store_true",
                   help="bypass is_modified gate (reference -f/--force)")
    p.add_argument("--batch-seconds", type=float, default=600.0)
    p.add_argument("--max-batches", type=int, default=None)
    p.add_argument("--crawl-time", default="2026-01-15T12:00:00",
                   help="injected crawl timestamp (determinism/resume)")
    p.add_argument("--no-resume", action="store_true")
    p.add_argument("--order-mode", default="reference",
                   choices=("reference", "priority"),
                   help="frontier order: reference nested-loop order, "
                        "or sitemap-priority queue")
    p.add_argument("--pages-table", default=None,
                   help="bucketed catalog table to use as the page "
                        "store (sources/pagestore.py) instead of the "
                        "world's parquet")
    p.add_argument("--ckpt-full-every", type=int, default=8,
                   help="full remaining-frontier snapshot every K "
                        "batches (delta checkpoints in between)")
    p.add_argument("--compact-every", type=int, default=16,
                   help="fold the index MOR delta log into the base "
                        "when it exceeds K generations (0 = never)")
    p.add_argument("--follow-links", action="store_true",
                   help="link-following frontier discovery: extraction "
                        "emits each page's outlinks (shared DOM parse), "
                        "which are canonicalized, trap-gated, scoped to "
                        "the configured hosts, seen-filtered, and "
                        "enqueued with n_refs as the priority signal")
    p.add_argument("--recrawl-from", default=None, metavar="INDEX_DIR",
                   help="adaptive recrawl gate: a PRIOR run's index "
                        "root whose op log (CDC change history) feeds "
                        "recrawl_schedule; frontier urls not yet due "
                        "(next_due_epoch > crawl-time) skip with "
                        "'not_due' before any fetch. Urls without an "
                        "observed change rate are never gated")
    p.add_argument("--warc-dir", default=None,
                   help="ingest WARC archives (Common Crawl layout) "
                        "from this path into the world's page store "
                        "before crawling (sources/warc.py)")
    p.add_argument("--export-as-of", type=int, default=None,
                   metavar="BATCH",
                   help="read-only: export the index as it stood after "
                        "generation BATCH (time travel; no crawl runs)")
    p.add_argument("--export-changes-since", type=int, default=None,
                   metavar="BATCH",
                   help="read-only: export the net per-UID changes in "
                        "generations after BATCH (CDC; the re-embed-"
                        "only-what-changed input; no crawl runs)")
    p.add_argument("--export-changes-until", type=int, default=None,
                   metavar="BATCH",
                   help="upper generation bound for "
                        "--export-changes-since (default: latest)")
    p.add_argument("--export-path", default=None,
                   help="parquet destination for the export modes "
                        "(omit to just print the row count)")
    args = p.parse_args(argv)
    if args.export_as_of is not None and \
            args.export_changes_since is not None:
        p.error("--export-as-of and --export-changes-since are "
                "mutually exclusive")
    if args.export_changes_until is not None and \
            args.export_changes_since is None:
        p.error("--export-changes-until requires "
                "--export-changes-since")

    from pyspark.sql import SparkSession

    from ftw_crawler_spark.plans.crawl import run_crawl

    config = sites = None
    if args.config:
        from ftw_crawler_spark.config_loader import load_config_file
        config = load_config_file(args.config)
        if config.sites:
            sites = config.sites

    spark = (SparkSession.builder.appName("ftw-crawler-spark")
             .config("spark.sql.session.timeZone", "UTC")
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.sql.mapKeyDedupPolicy", "LAST_WIN")
             .getOrCreate())
    if args.export_as_of is not None or \
            args.export_changes_since is not None:
        # consumer modes over an existing sink — the downstream job's
        # input materialization, never a crawl. read_only: this sink
        # may belong to a LIVE writer; crash recovery (which mutates
        # compact-tmp dirs) is the writer's job, not ours
        import os as _os

        from ftw_crawler_spark.operators.indexsink import IndexSink
        from ftw_crawler_spark.plans.crawl import _parquet_rows
        sink = IndexSink(spark, _os.path.join(args.out, "index"),
                         read_only=True)
        if args.export_as_of is not None:
            mode = "as_of"
            df = sink.as_of(args.export_as_of)
        else:
            mode = "changes"
            df = sink.changes(args.export_changes_since,
                              args.export_changes_until)
        if df is None:
            rows = 0
        elif args.export_path:
            # write once, count from the written footers — a count()
            # before the write would run the log-union + LWW window
            # shuffle twice (same reasoning as the crawl loop's
            # _parquet_rows over its delta appends)
            df.write.mode("overwrite").parquet(args.export_path)
            rows = _parquet_rows(args.export_path)
        else:
            rows = df.count()
        print(json.dumps({"mode": mode, "rows": rows,
                          "history": sink.history(),
                          "export_path": args.export_path}))
        return 0

    if args.warc_dir:
        # land WARC responses into the world's page store: the crawl
        # then fetch-simulates from real archived pages
        from ftw_crawler_spark.sources.warc import read_warc, warc_to_pages
        pages = warc_to_pages(read_warc(spark, args.warc_dir))
        pages.write.mode("overwrite").parquet(
            f"{args.world}/pages.parquet")

    result = run_crawl(
        spark, args.world, args.out, sites=sites, config=config,
        crawl_time=datetime.fromisoformat(args.crawl_time),
        batch_seconds=args.batch_seconds, url=args.url,
        force=args.force, max_batches=args.max_batches,
        resume=not args.no_resume, order_mode=args.order_mode,
        pages_table=args.pages_table,
        ckpt_full_every=args.ckpt_full_every,
        compact_every=args.compact_every or None,
        follow_links=args.follow_links,
        recrawl_from=args.recrawl_from)
    n_indexed = result.index().count()
    print(json.dumps({"batches": result.batches,
                      "indexed_rows": n_indexed,
                      "metrics": result.metrics}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
