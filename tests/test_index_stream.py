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


def test_stream_starts_on_fresh_or_compacted_sink(spark, tmp_path):
    """A consumer (re)starting its tail right after compaction — or on
    a base-only sink — must get an (initially empty) stream, not a
    path-not-found: change_schema falls back to the base snapshot's
    footer and the source's log dir is (re)created."""
    root = str(tmp_path / "index")
    sink = IndexSink(spark, root)
    sink.write_base(spark.createDataFrame(
        [("u1", "http://a/1", "t1")],
        "UID string, url string, Title string"))
    sink.append_upserts(spark.createDataFrame(
        [("u2", "http://a/2", "t2", 5)],
        "UID string, url string, Title string, op_seq long"), 0)
    sink.compact()                     # delta dir folded away
    got: list = []
    _drain(spark, root, str(tmp_path / "ckpt"), got)
    assert got == []                   # the base snapshot is not an op
    # ops landing after the (re)start are picked up by the same tail
    sink.append_upserts(spark.createDataFrame(
        [("u3", "http://a/3", "t3", 9)],
        "UID string, url string, Title string, op_seq long"), 1)
    _drain(spark, root, str(tmp_path / "ckpt"), got)
    assert [(r["UID"], r["_generation"]) for r in got] == [("u3", 1)]


def test_tail_survives_midstream_compaction(spark, tmp_path):
    """The retention contract from the consumer's side: a tail that
    already processed generations 0..K keeps working when compaction
    folds those dirs away — the source's offset log remembers files,
    not dirs, so the next drain neither re-reads the deleted files nor
    errors, and delivers exactly the post-compaction generations."""
    root = str(tmp_path / "index")
    ckpt = str(tmp_path / "ckpt")
    sink = IndexSink(spark, root)
    sink.append_upserts(spark.createDataFrame(
        [("u1", "http://a/1", "t1", 1)],
        "UID string, url string, Title string, op_seq long"), batch_id=0)
    sink.append_deletes(
        spark.createDataFrame([("u9",)], "UID string"), batch_id=1)
    # pin the consumer schema BEFORE compaction: the post-compaction
    # log starts empty and change_schema would re-derive from the base
    schema = change_schema(spark, root)
    got: list = []
    q = (stream_index_changes(spark, root, schema=schema)
         .writeStream
         .foreachBatch(lambda df, _bid: got.extend(df.collect()))
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    assert {(r["UID"], r["_generation"]) for r in got} == {("u1", 0),
                                                           ("u9", 1)}
    sink.compact()                     # gens 0-1 folded into the base
    sink.append_upserts(spark.createDataFrame(
        [("u2", "http://a/2", "t2", 7)],
        "UID string, url string, Title string, op_seq long"), batch_id=2)
    got2: list = []
    q = (stream_index_changes(spark, root, schema=schema)
         .writeStream
         .foreachBatch(lambda df, _bid: got2.extend(df.collect()))
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    assert [(r["UID"], r["_change_type"], r["_generation"])
            for r in got2] == [("u2", "upsert", 2)]


def test_change_schema_batch_is_string_without_deletes(spark, tmp_path):
    """With only numeric upsert dirs, partition inference would type
    ``batch`` integer — and the first batch=K_deletes or
    batch=stream_NNN dir would then stream a NULL generation tag.
    change_schema must force it to string."""
    root = str(tmp_path / "index")
    sink = IndexSink(spark, root)
    sink.append_upserts(spark.createDataFrame(
        [("u1", "http://a/1", "t1", 1)],
        "UID string, url string, Title string, op_seq long"), 0)
    sch = change_schema(spark, root)
    assert sch["batch"].dataType.simpleString() == "string"
    got: list = []
    _drain(spark, root, str(tmp_path / "ckpt"), got)
    # a later tombstone dir streams with its generation intact
    sink.append_deletes(
        spark.createDataFrame([("u1",)], "UID string"), batch_id=1)
    _drain(spark, root, str(tmp_path / "ckpt"), got)
    assert ("u1", "delete", 1) in {(r["UID"], r["_change_type"],
                                    r["_generation"]) for r in got}


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
