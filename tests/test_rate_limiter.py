"""Stateful streaming politeness (applyInPandasWithState): per-host
capacity per micro-batch, cumulative slots, sleeptime doubling carried
in group state across batches."""

from __future__ import annotations

import os

import pandas as pd
import pytest
from pyspark.sql import functions as F

from ftw_crawler_spark.streaming.rate_limiter import (
    OUTPUT_SCHEMA, make_rate_limit_fn, rate_limited_stream)


class FakeState:
    def __init__(self):
        self._v = None

    @property
    def exists(self):
        return self._v is not None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v = v


def test_fn_caps_orders_and_doubles():
    fn = make_rate_limit_fn(batch_seconds=0.35, default_sleeptime=0.1)
    st = FakeState()
    pdf = pd.DataFrame({"crawl_seq": [5, 1, 3, 9, 7],
                        "n_429": [0, 2, 0, 0, 0]})
    (out,) = fn(("h",), iter([pdf]), st)
    # cap = floor(0.35/0.1) = 3, lowest crawl_seq first
    assert list(out["crawl_seq"]) == [1, 3, 5]
    assert list(out["slot"]) == [1, 2, 3]
    # crawl_seq 1 had a repeat-429 → sleeptime doubled in state
    assert st.get == (0.2, 3)
    # next batch: cap = 1 under the doubled sleeptime, slots continue
    (out2,) = fn(("h",), iter([pd.DataFrame(
        {"crawl_seq": [9, 7], "n_429": [0, 0]})]), st)
    assert list(out2["crawl_seq"]) == [7]
    assert list(out2["slot"]) == [4]
    assert st.get == (0.2, 4)


@pytest.fixture(scope="module")
def streamed(spark, tmp_path_factory):
    delta = str(tmp_path_factory.mktemp("rl_deltas"))
    out = str(tmp_path_factory.mktemp("rl_out"))
    ckpt = str(tmp_path_factory.mktemp("rl_ckpt"))

    rows1 = [("a", i, 0) for i in range(5)] + [("b", 10, 2)]
    rows2 = [("a", i, 0) for i in range(5, 8)] + [("b", 11, 0),
                                                  ("b", 12, 0)]
    schema = "host string, crawl_seq long, n_429 int"
    spark.createDataFrame(rows1, schema).coalesce(1) \
        .write.mode("append").parquet(delta)
    spark.createDataFrame(rows2, schema).coalesce(1) \
        .write.mode("append").parquet(delta)

    stream = (spark.readStream.schema(
        "host string, crawl_seq long, n_429 int")
        .option("maxFilesPerTrigger", 1).parquet(delta))
    admitted = rate_limited_stream(stream, batch_seconds=0.35)
    q = (admitted.writeStream.outputMode("append")
         .format("parquet").option("path", out)
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    q.awaitTermination(300)
    return spark.read.schema(OUTPUT_SCHEMA).parquet(out)


def test_stream_caps_per_batch(streamed):
    a = (streamed.filter(F.col("host") == "a")
         .orderBy("slot").collect())
    # batch 1 admits 3 of 5 (cap = 3); batch 2 admits 3 more
    assert [r["crawl_seq"] for r in a] == [0, 1, 2, 5, 6, 7]
    assert [r["slot"] for r in a] == [1, 2, 3, 4, 5, 6]


def test_stream_state_doubles_across_batches(streamed):
    b = (streamed.filter(F.col("host") == "b")
         .orderBy("slot").collect())
    # batch 1: crawl_seq 10 with repeat-429 → sleeptime 0.1 this batch,
    # doubled to 0.2 in state; batch 2 cap = 1 → only crawl_seq 11
    assert [r["crawl_seq"] for r in b] == [10, 11]
    assert [round(r["sleeptime"], 3) for r in b] == [0.1, 0.2]
