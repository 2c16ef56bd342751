"""M5: spark-submit --py-files packaging actually runs the crawl job.

North rule: "submitted via spark-submit --py-files". This test builds
the real zip, launches the real spark-submit binary at local[4] on a
tiny world, and checks the job's JSON output and resume behavior.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sysconfig

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _spark_submit() -> str | None:
    cand = shutil.which("spark-submit")
    if cand:
        return cand
    scripts = sysconfig.get_path("scripts")
    cand = os.path.join(scripts, "spark-submit")
    return cand if os.path.exists(cand) else None


@pytest.mark.slow
def test_spark_submit_pyfiles_runs_crawl(tmp_path, tiny_world):
    submit = _spark_submit()
    if submit is None:
        pytest.skip("spark-submit binary not found")

    import sys
    sys.path.insert(0, REPO)
    from tools.make_pyfiles import build
    zip_path = build(str(tmp_path / "pkg.zip"))

    out_dir = str(tmp_path / "out")
    env = dict(os.environ)
    env.pop("PYSPARK_DRIVER_PYTHON", None)
    cmd = [submit, "--master", "local[4]",
           "--conf", "spark.ui.enabled=false",
           "--conf", "spark.sql.shuffle.partitions=4",
           "--py-files", zip_path,
           os.path.join(REPO, "jobs", "crawl_submit.py"),
           "--world", tiny_world, "--out", out_dir]
    res = subprocess.run(cmd, env=env, capture_output=True, text=True,
                         timeout=600, cwd=str(tmp_path))
    assert res.returncode == 0, res.stderr[-4000:]
    line = [ln for ln in res.stdout.splitlines()
            if ln.startswith("{")][-1]
    report = json.loads(line)
    assert report["batches"] >= 1
    assert report["indexed_rows"] > 0

    # resume on a completed run: no new batches, same index rows
    res2 = subprocess.run(cmd, env=env, capture_output=True, text=True,
                          timeout=600, cwd=str(tmp_path))
    assert res2.returncode == 0, res2.stderr[-4000:]
    line2 = [ln for ln in res2.stdout.splitlines()
             if ln.startswith("{")][-1]
    report2 = json.loads(line2)
    assert report2["indexed_rows"] == report["indexed_rows"]


def test_export_modes_read_only(spark, tmp_path, capsys):
    """--export-as-of / --export-changes-since are read-only consumer
    modes: they open the existing sink, never run a crawl, and print
    one JSON line with rows + the generation history."""
    from ftw_crawler_spark.operators.indexsink import IndexSink
    from jobs.crawl_submit import main

    out = tmp_path / "out"
    sink = IndexSink(spark, str(out / "index"))
    sink.write_base(spark.createDataFrame(
        [("u1", "http://a/1", "t1")],
        "UID string, url string, Title string"))
    sink.append_upserts(spark.createDataFrame(
        [("u2", "http://a/2", "t2", 5)],
        "UID string, url string, Title string, op_seq long"), 0)

    exp = str(tmp_path / "asof.parquet")
    assert main(["--world", "unused", "--out", str(out),
                 "--export-as-of", "-1", "--export-path", exp]) == 0
    rep = json.loads([ln for ln in capsys.readouterr().out.splitlines()
                      if ln.startswith("{")][-1])
    assert rep == {"mode": "as_of", "rows": 1, "export_path": exp,
                   "history": [{"batch_id": None, "kind": "base"},
                               {"batch_id": 0, "kind": "upserts"}]}
    assert {r["UID"] for r in spark.read.parquet(exp).collect()} == {"u1"}

    assert main(["--world", "unused", "--out", str(out),
                 "--export-changes-since", "-1"]) == 0
    rep = json.loads([ln for ln in capsys.readouterr().out.splitlines()
                      if ln.startswith("{")][-1])
    assert (rep["mode"], rep["rows"]) == ("changes", 1)
    # empty window prints zero rows, still valid JSON
    assert main(["--world", "unused", "--out", str(out),
                 "--export-changes-since", "7"]) == 0
    rep = json.loads([ln for ln in capsys.readouterr().out.splitlines()
                      if ln.startswith("{")][-1])
    assert rep["rows"] == 0


def test_export_flag_validation(tmp_path, capsys):
    import pytest

    from jobs.crawl_submit import main
    with pytest.raises(SystemExit) as e:
        main(["--world", "w", "--out", str(tmp_path),
              "--export-as-of", "1", "--export-changes-since", "0"])
    assert e.value.code == 2
    with pytest.raises(SystemExit) as e:
        main(["--world", "w", "--out", str(tmp_path),
              "--export-changes-until", "5"])
    assert e.value.code == 2
    capsys.readouterr()
