"""Streaming CDC feed over the index delta log (index_stream.py):
exactly-once op delivery across restarts, tombstone tagging, and the
LWW-merge application contract reproducing current()."""

from __future__ import annotations

from ftw_crawler_spark.operators.indexsink import IndexSink
from ftw_crawler_spark.streaming.index_stream import (change_schema,
                                                      stream_index_changes)


def _drain(spark, index_root, ckpt, got):
    q = (stream_index_changes(spark, index_root)
         .writeStream
         .foreachBatch(lambda df, _bid: got.extend(df.collect()))
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True)
         .start())
    q.awaitTermination(120)


def test_cdc_stream_exactly_once_and_merge(spark, tmp_path):
    root = str(tmp_path / "index")
    ckpt = str(tmp_path / "ckpt")
    sink = IndexSink(spark, root)
    sink.write_base(spark.createDataFrame(
        [("u1", "http://a/1", "old-1"), ("u2", "http://a/2", "old-2")],
        "UID string, url string, Title string"))
    sink.append_deletes(
        spark.createDataFrame([("u2",)], "UID string"), batch_id=0)
    sink.append_upserts(spark.createDataFrame(
        [("u1", "http://a/1", "new-1", 10),
         ("u3", "http://a/3", "new-3", 11)],
        "UID string, url string, Title string, op_seq long"), batch_id=1)

    got: list = []
    _drain(spark, root, ckpt, got)
    # every committed op once, tagged; the base snapshot is NOT an op
    ops = {(r["UID"], r["_change_type"], r["_generation"]) for r in got}
    assert ops == {("u2", "delete", 0),
                   ("u1", "upsert", 1), ("u3", "upsert", 1)}
    # tombstones carry only the key — document columns are NULL
    dels = [r for r in got if r["_change_type"] == "delete"]
    assert dels[0]["Title"] is None and dels[0]["op_seq"] == -1

    # restart with the same checkpoint: only NEW generations arrive
    sink.append_upserts(spark.createDataFrame(
        [("u1", "http://a/1", "newer-1", 20)],
        "UID string, url string, Title string, op_seq long"), batch_id=2)
    got2: list = []
    _drain(spark, root, ckpt, got2)
    assert {(r["UID"], r["_generation"]) for r in got2} == {("u1", 2)}

    # LWW-merge application of the full op stream == current()
    held: dict = {r["UID"]: r["op_seq"] for r in
                  spark.read.parquet(sink.base_path)
                  .select("UID", "op_seq").collect()}
    for r in sorted(got + got2, key=lambda r: r["op_seq"]):
        if r["UID"] in held and held[r["UID"]] >= r["op_seq"]:
            continue
        if r["_change_type"] == "delete":
            held.pop(r["UID"], None)
        else:
            held[r["UID"]] = r["op_seq"]
    cur = {r["UID"]: r["op_seq"] for r in
           sink.current().select("UID", "op_seq").collect()}
    assert held == cur


def test_change_schema_unifies_generation_kinds(spark, tmp_path):
    root = str(tmp_path / "index")
    sink = IndexSink(spark, root)
    sink.append_upserts(spark.createDataFrame(
        [("u1", "http://a/1", "t1", 1)],
        "UID string, url string, Title string, op_seq long"), batch_id=0)
    sink.append_deletes(
        spark.createDataFrame([("u9",)], "UID string"), batch_id=1)
    names = set(change_schema(spark, root).fieldNames())
    # doc columns, tombstone columns, and the partition-dir column
    assert {"UID", "url", "Title", "op_seq", "is_delete",
            "batch"} <= names
