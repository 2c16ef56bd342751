"""Repetition gate + length histogram unit behavior (the driver
queries pin oracle equality; these pin the gate semantics on crafted
inputs where the signal actually fires)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ftw_crawler_spark.operators import textstats as ts


def test_repetitive_doc_flagged(spark):
    df = spark.createDataFrame(
        [(1, "buy now " * 50),                      # one bigram, repeated
         (2, " ".join(f"w{i}" for i in range(100))),  # all distinct
         (3, "a")],                                 # no bigrams → dropped
        "doc_id long, text string")
    got = {r["doc_id"]: r for r in ts.repetition_stats(df).collect()}
    assert set(got) == {1, 2}
    assert got[1]["repetitive"] and got[1]["dup_ngrams"] > 0
    assert not got[2]["repetitive"] and got[2]["dup_ngrams"] == 0


def test_length_histogram_buckets(spark):
    df = spark.createDataFrame(
        [(1, " ".join(["x"] * 10)),     # bucket 0
         (2, " ".join(["x"] * 70)),     # bucket 64
         (3, " ".join(["x"] * 100))],   # bucket 64
        "doc_id long, text string")
    got = {r["bucket_lo"]: (r["n_docs"], r["sum_tokens"])
           for r in ts.length_histogram(df).collect()}
    assert got == {0: (1, 10), 64: (2, 170)}
