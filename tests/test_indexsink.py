"""IndexSink: upsert-by-UID log semantics, tombstones, compaction."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from ftw_crawler_spark.operators.indexsink import IndexSink


def _sink(spark, tmp_path):
    sink = IndexSink(spark, str(tmp_path / "index"))
    base = spark.createDataFrame(
        [("u1", "http://a/1", "old-1"),
         ("u2", "http://a/2", "old-2"),
         ("u3", "http://a/3", "old-3")],
        "UID string, url string, Title string")
    sink.write_base(base)
    deletes = spark.createDataFrame([("u2",)], "UID string")
    sink.append_deletes(deletes, batch_id=0)
    ups = spark.createDataFrame(
        [("u1", "http://a/1", "new-1", 10),
         ("u4", "http://a/4", "new-4", 11)],
        "UID string, url string, Title string, op_seq long")
    sink.append_upserts(ups, batch_id=1)
    return sink


def test_merge_resolution(spark, tmp_path):
    sink = _sink(spark, tmp_path)
    rows = {r["UID"]: r["Title"] for r in sink.current().collect()}
    assert rows == {"u1": "new-1", "u3": "old-3", "u4": "new-4"}


def test_upsert_beats_earlier_tombstone(spark, tmp_path):
    """A UID deleted in the purge phase (op_seq -1) and re-crawled
    (op_seq >= 0) survives with the new version."""
    sink = _sink(spark, tmp_path)
    sink.append_deletes(
        spark.createDataFrame([("u4",)], "UID string"), batch_id=2)
    # op_seq -1 tombstone loses to u4's op_seq 11 upsert
    assert "u4" in {r["UID"] for r in sink.current().collect()}


def test_compaction_preserves_state_and_folds_log(spark, tmp_path):
    sink = _sink(spark, tmp_path)
    before = sorted((r["UID"], r["Title"])
                    for r in sink.current().collect())
    n_deltas = len(os.listdir(sink.delta_root))
    assert n_deltas >= 2
    sink.compact()
    assert not os.path.isdir(sink.delta_root)
    after = sorted((r["UID"], r["Title"])
                   for r in sink.current().collect())
    assert after == before
    # post-compaction writes still resolve on top of the new base
    sink.append_upserts(
        spark.createDataFrame([("u3", "http://a/3", "newer-3", 20)],
                              "UID string, url string, Title string, "
                              "op_seq long"), batch_id=5)
    rows = {r["UID"]: r["Title"] for r in sink.current().collect()}
    assert rows["u3"] == "newer-3"
    assert rows["u1"] == "new-1"
