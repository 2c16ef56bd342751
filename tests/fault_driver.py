"""Subprocess driver for the task-retry determinism probe
(test_fault_tolerance.py): runs the REAL crawl plan at ``local[4, 2]``
— Spark's task-retry machinery enabled (maxFailures=2) — with an
optional pluggable probe extractor that kills the FIRST attempt of
partition 0 of every extraction stage.

Why this exists: on a 1000-executor cluster task attempts fail
routinely (spot preemption, executor loss, shuffle-fetch failures) and
Spark re-runs them; the crawl's output must be a pure function of its
input regardless of which attempts died. The plan relies on that in
two places this probe exercises end-to-end:

- ``repartition(n)`` before the extraction UDF is round-robin, which
  Spark makes retry-safe by local-sorting first (SPARK-23207) — a
  retried task re-produces the exact same partition;
- the extraction stage runs INSIDE the sink's parquet write job, so a
  mid-write task failure also exercises the file-commit protocol (the
  failed attempt's output files are never committed).

The probe extractor is a plain pluggable ``config.Extractor`` (the
reference's custom-extractor surface, ftw/crawler/extractors.py:79-143
→ config.py here) — production code paths are exercised unmodified.
"""

from __future__ import annotations

import argparse
import json

from pyspark import TaskContext
from pyspark.sql import SparkSession

from ftw_crawler_spark import config as cfg
from ftw_crawler_spark.plans.crawl import run_crawl


class FaultProbeExtractor(cfg.Extractor):
    """Emits a constant field value (so the clean and the faulty run
    share ONE config and one output schema); when ``log_path`` is set,
    raises once per (stage, partition 0) first attempt — the retry
    (attempt 1) then succeeds. The log file records every injected
    failure so the test can assert faults actually fired."""

    def __init__(self, log_path: str | None = None):
        self.log_path = log_path

    def eval_row(self, row):
        tc = TaskContext.get()
        if (self.log_path and tc is not None
                and tc.partitionId() == 0 and tc.attemptNumber() == 0):
            with open(self.log_path, "a") as fh:
                fh.write(f"stage={tc.stageId()}\n")
            raise RuntimeError("injected transient task fault")
        return "retry-deterministic"


def main(argv: list | None = None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--world", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--fault-log", default=None,
                    help="enable fault injection; failures append here")
    args = ap.parse_args(argv)

    spark = (SparkSession.builder
             .master("local[4, 2]")      # 4 threads, task maxFailures=2
             .appName("fault-tolerance-probe")
             .config("spark.sql.shuffle.partitions", "4")
             .config("spark.ui.enabled", "false")
             .getOrCreate())
    try:
        config = cfg.default_config()
        config.fields.append(
            cfg.Field("faultProbe", FaultProbeExtractor(args.fault_log)))
        res = run_crawl(spark, args.world, args.out, config=config)
        idx = res.index()
        print(json.dumps({
            "batches": res.batches,
            "indexed_rows": idx.count(),
            "indexed_sum": sum(m["indexed"] for m in res.metrics
                               if "indexed" in m),
        }))
    finally:
        spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
