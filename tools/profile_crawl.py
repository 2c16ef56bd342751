#!/usr/bin/env python
"""Phase-level profile of the headline crawl (diagnostic, not a gate).

Runs ``run_crawl`` once over the cached bench world and prints the
per-phase timings recorded in ``CrawlResult.metrics`` plus wall total —
the tool for attributing headline-bench movement to a phase before
touching any code. Usage::

    python tools/profile_crawl.py [n_urls] [repeats]
"""

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import bench  # noqa: E402


def main() -> int:
    n_urls = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    repeats = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    from ftw_crawler_spark.plans.crawl import run_crawl
    from ftw_crawler_spark.session import get_spark
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("ftw-profile", master=f"local[{cpus}]",
                      shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(10_000).groupBy().sum().collect()
    world = bench._ensure_world(spark, n_urls)
    batch_seconds = max(600.0, n_urls * 0.025)
    for rep in range(repeats):
        out = tempfile.mkdtemp(prefix="ftw_profile_crawl_")
        try:
            t0 = time.perf_counter()
            result = run_crawl(spark, world, out,
                               crawl_time=bench.CRAWL_TIME,
                               batch_seconds=batch_seconds)
            wall = time.perf_counter() - t0
        finally:
            shutil.rmtree(out, ignore_errors=True)
        phases = {}
        for m in result.metrics:
            for k, v in m.items():
                if k.startswith("sec_"):
                    phases[k] = round(phases.get(k, 0.0) + v, 3)
        accounted = round(sum(phases.values()), 3)
        print(json.dumps({"rep": rep, "wall": round(wall, 3),
                          "phases": phases, "accounted": accounted,
                          "unaccounted": round(wall - accounted, 3),
                          "batches": result.batches}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
