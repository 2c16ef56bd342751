#!/usr/bin/env python
"""Scaling-efficiency evidence for the north rule (BASELINE.json):
"throughput scaling efficiency >= 0.8 from N to 4N executors".

No real cluster exists in this sandbox, so the evidence is the same
job on the same input at two parallelism levels: local[8] vs
local[32] (N=8 cores, 4N=32 cores), each in a FRESH JVM so no warm
caches leak between levels. The crawl world is generated once (cached
under /tmp) before either timed run.

Usage: python tools/bench_scaling.py [n_urls]
Prints one JSON line:
  {"n8": {...}, "n32": {...}, "speedup": s, "efficiency": e}
where efficiency = (urls_per_sec@32 / urls_per_sec@8) / (32/8).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_level(cpus: int, n_urls: int) -> dict:
    env = dict(os.environ)
    env.update({
        "SPARK_GRAFT_CPUS": str(cpus),
        "SPARK_SHUFFLE_PARTITIONS": str(cpus),
        "SPARK_GRAFT_BENCH_ONLY": "crawl",
        "SPARK_GRAFT_N_URLS": str(n_urls),
    })
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env, cwd=REPO, capture_output=True, text=True, check=True)
    line = out.stdout.strip().splitlines()[-1]
    return json.loads(line)


def main() -> int:
    n_urls = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    # generate the world once so neither timed run pays for it
    env = dict(os.environ)
    env.update({"SPARK_GRAFT_CPUS": "32",
                "SPARK_SHUFFLE_PARTITIONS": "32"})
    subprocess.run(
        [sys.executable, "-c",
         "import sys; sys.path.insert(0, '.');"
         "from ftw_crawler_spark.session import get_spark;"
         "import bench;"
         f"bench._ensure_world(get_spark('worldgen'), {n_urls})"],
        env=env, cwd=REPO, check=True, capture_output=True)

    r8 = run_level(8, n_urls)
    r32 = run_level(32, n_urls)
    ups8 = r8["crawl"]["urls_per_sec"]
    ups32 = r32["crawl"]["urls_per_sec"]
    speedup = ups32 / ups8 if ups8 else 0.0
    result = {
        "n_urls": n_urls,
        "n8": r8["crawl"],
        "n32": r32["crawl"],
        "speedup_8_to_32": round(speedup, 3),
        "efficiency": round(speedup / 4.0, 3),
        "note": ("efficiency = (ups@local[32]/ups@local[8]) / (32/8); "
                 "north rule target >= 0.8"),
    }
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
