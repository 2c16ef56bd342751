"""URL-seen filtering: partitioned bloom filter + exact anti-join backstop.

North-rule component (M4): at 10^10-URL frontier scale the
frontier⋈index equi-join for the incremental check
(operators/incremental.py) would shuffle every frontier row. Instead a
bloom filter is built over indexed urls — per partition, as a numpy bit
array over ``xxhash64(url)`` double-hashes (Kirsch-Mitzenmacher:
h1 + i*h2), OR-merged on the driver, and broadcast to the frontier
scan. Never-indexed urls (the common case on a growing crawl) skip the
join entirely; candidate positives are verified by the EXACT join — a
false positive can only cost a lookup, never drop or misclassify a URL
(SURVEY.md §4.2).

The build is one pass, map-side only (no shuffle of urls): each task
emits its partition's filter bytes; the driver ORs ~num_partitions
small arrays. The probe is an Arrow-vectorized pandas UDF over the
broadcast bytes — numpy gather, no per-row Python.

(Spark's internal BloomFilter aggregate is not SQL-exposed in this
build, and rolling our own keeps the filter format stable for the
checkpoint state table.)
"""

from __future__ import annotations

import math
import struct

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_MAGIC = b"BLM1"


def _params(expected_items: int, fpp: float) -> tuple:
    n_bits = max(1 << 10, int(-expected_items * math.log(fpp)
                              / (math.log(2) ** 2)))
    n_bits = 1 << (n_bits - 1).bit_length()          # power of two
    k = max(1, round(n_bits / expected_items * math.log(2)))
    return n_bits, min(k, 8)


def _positions(h1: np.ndarray, h2: np.ndarray, k: int,
               n_bits: int) -> np.ndarray:
    """(len, k) bit positions via double hashing; n_bits is 2^m so the
    modulo is a mask."""
    mask = n_bits - 1
    idx = np.empty((len(h1), k), dtype=np.int64)
    for i in range(k):
        idx[:, i] = (h1 + i * h2) & mask
    return idx


def bloom_shape(bloom_bytes: bytes) -> tuple:
    """(n_bits, k) of a serialized filter."""
    assert bloom_bytes[:4] == _MAGIC
    return struct.unpack("<QI", bloom_bytes[4:16])


def build_url_bloom(df: DataFrame, url_col: str = "url",
                    expected_items: int | None = None,
                    fpp: float = 0.03,
                    shape: tuple | None = None) -> bytes | None:
    """One-pass distributed build. Returns serialized filter
    (header: magic, n_bits, k) or None for an empty relation.

    ``shape=(n_bits, k)`` pins the geometry so the result is OR-merge
    compatible with an existing filter (incremental per-batch deltas)."""
    if shape is not None:
        n_bits, k = shape
    else:
        if expected_items is None:
            expected_items = max(1024, df.count())
        n_bits, k = _params(expected_items, fpp)
    hashes = df.select(
        F.xxhash64(F.col(url_col)).alias("h1"),
        F.xxhash64(F.col(url_col), F.lit(0x5EED)).alias("h2"))

    n_bytes = n_bits // 8

    def partition_filter(pdfs):
        bits = np.zeros(n_bytes, dtype=np.uint8)
        seen_any = False
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            seen_any = True
            h1 = pdf["h1"].to_numpy(dtype=np.int64)
            h2 = pdf["h2"].to_numpy(dtype=np.int64)
            idx = _positions(h1, h2, k, n_bits).ravel()
            np.bitwise_or.at(bits, idx >> 3,
                             np.uint8(1) << (idx & 7).astype(np.uint8))
        if seen_any:
            yield pd.DataFrame({"bits": [bits.tobytes()]})

    parts = hashes.mapInPandas(partition_filter,
                               "bits binary").collect()
    if not parts:
        return None
    merged = np.zeros(n_bytes, dtype=np.uint8)
    for row in parts:
        merged |= np.frombuffer(row["bits"], dtype=np.uint8)
    return _MAGIC + struct.pack("<QI", n_bits, k) + merged.tobytes()


def merge_blooms(a: bytes | None, b: bytes | None) -> bytes | None:
    """OR-merge two same-shape filters (per-batch broadcast merge)."""
    if a is None:
        return b
    if b is None:
        return a
    assert a[:16] == b[:16], "bloom shape mismatch"
    header = a[:16]
    merged = (np.frombuffer(a[16:], dtype=np.uint8)
              | np.frombuffer(b[16:], dtype=np.uint8))
    return header + merged.tobytes()


def might_contain_col(bloom_bytes: bytes, url_col: str = "loc"):
    """Vectorized membership probe over the broadcast filter bytes."""
    assert bloom_bytes[:4] == _MAGIC
    n_bits, k = struct.unpack("<QI", bloom_bytes[4:16])
    bits = np.frombuffer(bloom_bytes[16:], dtype=np.uint8)

    @F.pandas_udf("boolean")
    def probe(h1: pd.Series, h2: pd.Series) -> pd.Series:
        if len(h1) == 0:
            return pd.Series([], dtype=bool)
        idx = _positions(h1.to_numpy(dtype=np.int64),
                         h2.to_numpy(dtype=np.int64), k, n_bits)
        hit = (bits[idx >> 3] >> (idx & 7).astype(np.uint8)) & 1
        return pd.Series(hit.all(axis=1))

    return probe(F.xxhash64(F.col(url_col)),
                 F.xxhash64(F.col(url_col), F.lit(0x5EED)))


def split_by_bloom(frontier: DataFrame, bloom_bytes: bytes | None,
                   url_col: str = "loc"):
    """(definitely_new, candidates) — definitely_new rows skip the exact
    index join; candidates go through it. With no filter everything is
    a candidate."""
    if bloom_bytes is None:
        return frontier.limit(0), frontier
    probe = might_contain_col(bloom_bytes, url_col)
    marked = frontier.withColumn("__maybe_seen", probe)
    new = marked.filter(~F.col("__maybe_seen")).drop("__maybe_seen")
    cand = marked.filter(F.col("__maybe_seen")).drop("__maybe_seen")
    return new, cand
