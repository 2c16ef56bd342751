"""Stateful per-host politeness over an unbounded frontier stream.

The batch planner (plans/crawl.py) carries per-host sleeptime in a
checkpoint TABLE because its loop lives on the driver. On a true
unbounded stream the idiomatic Spark home for that state is
``applyInPandasWithState``: the stream is grouped by host and each
micro-batch the group's function admits up to
``capacity = max(1, floor(batch_seconds / sleeptime))`` rows (lowest
``crawl_seq`` first — politeness delays, never reorders), doubles the
host's sleeptime for every repeat-429 admitted (reference
fetcher.py:60-66 semantics, P1 in SURVEY §2.3), and persists
``(sleeptime, total_admitted)`` in group state across batches via the
streaming checkpoint.

Rows over capacity are NOT emitted this batch — the upstream frontier
source re-delivers them (the batch planner's ``remaining`` anti-join
plays that role there); at-least-once delivery composes with the
idempotent upsert sink.

Scale: state is two scalars per host; the shuffle is the groupBy(host)
hash partition — the same key the batch planner salts, and the
Zipf-head concern is bounded here because each group processes only
the rows that arrived THIS batch, not the whole frontier.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = T.StructType([
    T.StructField("host", T.StringType()),
    T.StructField("crawl_seq", T.LongType()),
    T.StructField("slot", T.LongType()),        # cumulative per host
    T.StructField("sleeptime", T.DoubleType()),  # in effect this batch
])

STATE_SCHEMA = T.StructType([
    T.StructField("sleeptime", T.DoubleType()),
    T.StructField("total_admitted", T.LongType()),
])


def make_rate_limit_fn(batch_seconds: float,
                       default_sleeptime: float = 0.1):
    """The applyInPandasWithState group function (exposed for direct
    unit-testing with a fake GroupState)."""

    def fn(key: Any, pdfs: Iterator[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        (host,) = key
        if state.exists:
            sleeptime, total = state.get
        else:
            sleeptime, total = default_sleeptime, 0

        rows = pd.concat(list(pdfs), ignore_index=True)
        rows = rows.sort_values("crawl_seq")
        cap = max(1, int(batch_seconds / sleeptime))
        admitted = rows.head(cap)

        # 429 doubling: ×2 per repeat among ADMITTED rows (the ones
        # actually "fetched" this batch)
        if "n_429" in admitted.columns:
            reps = int((admitted["n_429"].fillna(0) - 1)
                       .clip(lower=0).sum())
            new_sleeptime = sleeptime * (2.0 ** reps)
        else:
            new_sleeptime = sleeptime

        n = len(admitted)
        out = pd.DataFrame({
            "host": [host] * n,
            "crawl_seq": admitted["crawl_seq"].astype("int64"),
            "slot": range(total + 1, total + n + 1),
            "sleeptime": [sleeptime] * n,
        })
        state.update((float(new_sleeptime), int(total + n)))
        yield out

    return fn


def rate_limited_stream(stream: DataFrame, batch_seconds: float,
                        default_sleeptime: float = 0.1) -> DataFrame:
    """Wire the stateful limiter into a streaming DataFrame that has
    (host, crawl_seq [, n_429]) columns. Returns the admitted-rows
    stream; pair with ``writeStream.outputMode("append")``."""
    return (stream.groupBy("host").applyInPandasWithState(
        make_rate_limit_fn(batch_seconds, default_sleeptime),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout))
