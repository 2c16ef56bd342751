"""Task-retry determinism: the crawl's output is a pure function of
its input even when task attempts fail and Spark re-runs them.

At cluster scale (the 10^10-URL design point) task failures are
routine — spot preemption, executor loss, fetch failures — and the
scheduler's answer is re-attempting the task. Everything the plan
computes must therefore be attempt-invariant: the round-robin
``repartition`` before extraction (retry-safe via Spark's local sort,
SPARK-23207), the Arrow extraction UDF (a pure function of its
partition), and the sink's parquet job (failed attempts' files are
never committed). This test is the sandbox's honest end-to-end
evidence: two subprocess runs at ``local[4, 2]`` — one clean, one
with a probe extractor (tests/fault_driver.py) that kills partition
0's first attempt of every extraction stage — must produce
byte-identical final indexes.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(world: str, out: str, cwd: str, fault_log: str | None = None):
    cmd = [sys.executable, os.path.join(REPO, "tests", "fault_driver.py"),
           "--world", world, "--out", out]
    if fault_log:
        cmd += ["--fault-log", fault_log]
    env = dict(os.environ, PYTHONPATH=REPO)
    os.makedirs(cwd, exist_ok=True)   # isolate derby.log / metastore_db
    res = subprocess.run(cmd, env=env, capture_output=True, text=True,
                         timeout=600, cwd=cwd)
    assert res.returncode == 0, res.stderr[-4000:]
    line = [ln for ln in res.stdout.splitlines() if ln.startswith("{")][-1]
    return json.loads(line)


@pytest.mark.slow
def test_crawl_output_invariant_under_task_retries(spark, tiny_world,
                                                   tmp_path):
    clean_out = str(tmp_path / "clean")
    fault_out = str(tmp_path / "faulty")
    fault_log = str(tmp_path / "faults.log")

    clean = _run(tiny_world, clean_out, str(tmp_path / "wd1"))
    faulty = _run(tiny_world, fault_out, str(tmp_path / "wd2"),
                  fault_log=fault_log)

    # faults really fired: every extraction stage lost partition 0's
    # first attempt — one DISTINCT stage id per batch's extraction
    # stage, so injection silently ceasing after batch 1 would fail
    # here rather than degrade into a clean-vs-clean comparison
    with open(fault_log) as fh:
        injected = {ln.strip() for ln in fh if ln.startswith("stage=")}
    assert len(injected) >= faulty["batches"], (
        f"expected a fault in every batch's extraction stage "
        f"({faulty['batches']} batches), got {sorted(injected)}")

    # identical run shape despite the retries
    assert faulty["batches"] == clean["batches"]
    assert faulty["indexed_rows"] == clean["indexed_rows"]
    assert faulty["indexed_sum"] == clean["indexed_sum"]

    # byte-identical final index: every column of every row, including
    # the probe field, timestamps, op_seq lineage and crawl ordering
    from ftw_crawler_spark.operators.indexsink import IndexSink
    a = IndexSink(spark, os.path.join(clean_out, "index"),
                  read_only=True).current()
    b = IndexSink(spark, os.path.join(fault_out, "index"),
                  read_only=True).current()
    assert a.schema == b.schema
    rows_a = sorted(map(repr, a.collect()))
    rows_b = sorted(map(repr, b.collect()))
    assert rows_a == rows_b
