"""URL-seen filtering: PARTITIONED bloom filter + exact anti-join backstop.

North-rule component (M4): at 10^10-URL frontier scale the
frontier⋈index equi-join for the incremental check
(operators/incremental.py) would shuffle every frontier row. Instead a
bloom filter is built over indexed urls and broadcast to the frontier
scan: never-indexed urls (the common case on a growing crawl) skip the
join entirely; candidate positives are verified by the EXACT join — a
false positive can only cost a lookup, never drop or misclassify a URL
(SURVEY.md §4.2).

The filter is SHARDED by ``pmod(xxhash64(url, seed), n_shards)``:

- **build**: url hashes are repartitioned by shard, and each task
  materializes only the ≤8 MiB bit arrays of the shards in its
  partition — never the whole filter. At the 10^10-URL / fpp 0.03
  design point the monolithic array is ~9 GB per task; a shard is
  ``n_bits/n_shards`` (2^26 bits → 2048 shards of 8 MiB).
- **merge**: because all rows of a shard land in one partition, the
  driver receives exactly one (shard, bits) row per non-empty shard
  and ORs it into place — O(total bytes) once, not
  O(num_partitions × total).
- **probe**: each url routes to its shard (same hash) and tests k
  double-hashed positions (Kirsch-Mitzenmacher: h1 + i·h2) inside that
  shard only. TWO serving modes (``split_by_bloom(mode=...)``):

  * ``broadcast`` — the concatenated array closes over an Arrow
    pandas UDF (numpy gather, no shuffle). Right while the filter is
    small enough to ship whole (≤ ``BROADCAST_MAX_BYTES``).
  * ``sharded`` — the filter stays a (shard, bits) RELATION; probe
    rows are routed to their shard by the same hash and membership is
    evaluated in a cogrouped Arrow UDF that sees ONE shard's bits per
    group. Task memory is O(shard + group rows), never O(filter) —
    at the 10^10-URL / fpp 0.03 design point the monolithic array is
    ~9 GB, a shard 8 MiB. Cost: one shuffle of the probe side on the
    shard key (O(batch)) plus a shuffle of the filter bytes
    (O(filter) — amortized: on a real cluster the shard table is the
    persisted checkpoint state table, already partitioned by shard).
  * ``auto`` (default) — broadcast below ``BROADCAST_MAX_BYTES``,
    sharded above. Both modes are bit-identical (same shard routing,
    same k positions); the exact anti-join backstop downstream makes
    either safe.

(Spark's internal BloomFilter aggregate is not SQL-exposed in this
build, and rolling our own keeps the filter format stable for the
checkpoint state table and gives the shard layout the north rule asks
for.)
"""

from __future__ import annotations

import math
import struct

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_MAGIC = b"BLS2"
_HEADER = struct.Struct("<QII")       # n_bits (per shard), k, n_shards
_SHARD_SEED = 0x5A4D
_H2_SEED = 0x5EED
_SHARD_MAX_BITS = 1 << 26             # 8 MiB bit array per shard
BROADCAST_MAX_BYTES = 64 << 20        # auto mode: shard-serve above this


def _params(expected_items: int, fpp: float) -> tuple:
    n_bits = max(1 << 10, int(-expected_items * math.log(fpp)
                              / (math.log(2) ** 2)))
    n_bits = 1 << (n_bits - 1).bit_length()          # power of two
    k = max(1, round(n_bits / expected_items * math.log(2)))
    return n_bits, min(k, 8)


def _positions(h1: np.ndarray, h2: np.ndarray, k: int,
               n_bits: int) -> np.ndarray:
    """(len, k) within-shard bit positions via double hashing; n_bits is
    2^m so the modulo is a mask."""
    mask = n_bits - 1
    idx = np.empty((len(h1), k), dtype=np.int64)
    for i in range(k):
        idx[:, i] = (h1 + i * h2) & mask
    return idx


def bloom_shape(bloom_bytes: bytes) -> tuple:
    """(n_bits_per_shard, k, n_shards) of a serialized filter."""
    assert bloom_bytes[:4] == _MAGIC
    return _HEADER.unpack(bloom_bytes[4:4 + _HEADER.size])


def _hash_cols(url_col: str, n_shards: int) -> list:
    return [
        F.pmod(F.xxhash64(F.col(url_col), F.lit(_SHARD_SEED)),
               F.lit(n_shards)).cast("int").alias("s"),
        F.xxhash64(F.col(url_col)).alias("h1"),
        F.xxhash64(F.col(url_col), F.lit(_H2_SEED)).alias("h2"),
    ]


def build_url_bloom(df: DataFrame, url_col: str = "url",
                    expected_items: int | None = None,
                    fpp: float = 0.03,
                    shape: tuple | None = None,
                    n_shards: int | None = None) -> bytes | None:
    """One-pass distributed sharded build. Returns the serialized filter
    (header: magic, per-shard n_bits, k, n_shards) or None for an empty
    relation.

    ``shape=(n_bits, k, n_shards)`` pins the geometry so the result is
    OR-merge compatible with an existing filter (incremental per-batch
    deltas, streaming/frontier_stream.py)."""
    if shape is not None:
        n_bits, k, n_shards = shape
    else:
        if expected_items is None:
            expected_items = max(1024, df.count())
        total_bits, k = _params(expected_items, fpp)
        if n_shards is None:
            n_shards = max(1, total_bits // _SHARD_MAX_BITS)
        n_bits = total_bits // n_shards       # both powers of two
    shard_bytes = n_bits // 8

    hashes = df.select(*_hash_cols(url_col, n_shards))
    if n_shards > 1:
        # co-locate each shard's rows: a task then builds ONLY the
        # shards in its partition (≈1 in expectation), and the driver
        # sees exactly one row per non-empty shard
        hashes = hashes.repartition(n_shards, "s")

    def partition_filter(pdfs):
        shards: dict[int, np.ndarray] = {}
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            for s_val, grp in pdf.groupby("s"):
                bits = shards.setdefault(
                    int(s_val), np.zeros(shard_bytes, dtype=np.uint8))
                idx = _positions(grp["h1"].to_numpy(dtype=np.int64),
                                 grp["h2"].to_numpy(dtype=np.int64),
                                 k, n_bits).ravel()
                np.bitwise_or.at(bits, idx >> 3,
                                 np.uint8(1) << (idx & 7).astype(np.uint8))
        for s_val, bits in shards.items():
            yield pd.DataFrame({"s": [s_val], "bits": [bits.tobytes()]})

    parts = hashes.mapInPandas(partition_filter,
                               "s int, bits binary").collect()
    if not parts:
        return None
    merged = np.zeros(shard_bytes * n_shards, dtype=np.uint8)
    for row in parts:
        off = row["s"] * shard_bytes
        merged[off:off + shard_bytes] |= np.frombuffer(row["bits"],
                                                       dtype=np.uint8)
    return _MAGIC + _HEADER.pack(n_bits, k, n_shards) + merged.tobytes()


def merge_blooms(a: bytes | None, b: bytes | None) -> bytes | None:
    """OR-merge two same-shape filters (per-batch broadcast merge)."""
    if a is None:
        return b
    if b is None:
        return a
    hdr = 4 + _HEADER.size
    assert a[:hdr] == b[:hdr], "bloom shape mismatch"
    merged = (np.frombuffer(a[hdr:], dtype=np.uint8)
              | np.frombuffer(b[hdr:], dtype=np.uint8))
    return a[:hdr] + merged.tobytes()


def might_contain_col(bloom_bytes: bytes, url_col: str = "loc"):
    """Vectorized shard-routed membership probe over the broadcast
    filter bytes (the small-filter serving mode — the whole array
    ships to each worker; use the sharded mode above
    BROADCAST_MAX_BYTES)."""
    n_bits, k, n_shards = bloom_shape(bloom_bytes)
    bits = np.frombuffer(bloom_bytes[4 + _HEADER.size:], dtype=np.uint8)

    @F.pandas_udf("boolean")
    def probe(s: pd.Series, h1: pd.Series, h2: pd.Series) -> pd.Series:
        if len(h1) == 0:
            return pd.Series([], dtype=bool)
        idx = _positions(h1.to_numpy(dtype=np.int64),
                         h2.to_numpy(dtype=np.int64), k, n_bits)
        g = idx + (s.to_numpy(dtype=np.int64) * n_bits)[:, None]
        hit = (bits[g >> 3] >> (g & 7).astype(np.uint8)) & 1
        return pd.Series(hit.all(axis=1))

    return probe(*_hash_cols(url_col, n_shards))


def shard_rows(bloom_bytes: bytes) -> list:
    """Serialized filter → [(shard_id, shard_bits)] for the NON-EMPTY
    shards — the relation form of the filter. On a real cluster this
    is the persisted (shard, bits) checkpoint state table, partitioned
    by shard_id; in-process it is derived from the merged bytes."""
    n_bits, _, n_shards = bloom_shape(bloom_bytes)
    shard_bytes = n_bits // 8
    raw = bloom_bytes[4 + _HEADER.size:]
    out = []
    for s in range(n_shards):
        chunk = raw[s * shard_bytes:(s + 1) * shard_bytes]
        if any(chunk):
            out.append((s, chunk))
    return out


def _split_sharded(frontier: DataFrame, bloom_bytes: bytes,
                   url_col: str):
    """Shard-served probe: route each row to its shard, cogroup with
    the (shard, bits) relation, evaluate membership against ONLY that
    shard's bytes. No task ever materializes the whole filter — the
    scale path for filters too big to broadcast."""
    from pyspark.sql import types as T

    n_bits, k, n_shards = bloom_shape(bloom_bytes)
    spark = frontier.sparkSession
    shards = spark.createDataFrame(shard_rows(bloom_bytes),
                                   "__bs int, bits binary")
    out_cols = frontier.columns
    out_schema = T.StructType(
        list(frontier.schema.fields)
        + [T.StructField("__maybe_seen", T.BooleanType())])

    def probe_group(left: pd.DataFrame, right: pd.DataFrame):
        if len(left) == 0:
            return pd.DataFrame(
                columns=out_cols + ["__maybe_seen"])
        out = left[out_cols].copy()
        if len(right) == 0:
            out["__maybe_seen"] = False
            return out
        bits = np.frombuffer(right["bits"].iloc[0], dtype=np.uint8)
        idx = _positions(left["__bh1"].to_numpy(dtype=np.int64),
                         left["__bh2"].to_numpy(dtype=np.int64),
                         k, n_bits)
        hit = (bits[idx >> 3] >> (idx & 7).astype(np.uint8)) & 1
        out["__maybe_seen"] = hit.all(axis=1)
        return out

    s, h1, h2 = _hash_cols(url_col, n_shards)
    hashed = frontier.select(
        "*", s.alias("__bs"), h1.alias("__bh1"), h2.alias("__bh2"))
    return (hashed.groupBy("__bs")
            .cogroup(shards.groupBy("__bs"))
            .applyInPandas(probe_group, out_schema))


def split_by_bloom(frontier: DataFrame, bloom_bytes: bytes | None,
                   url_col: str = "loc", mode: str = "auto"):
    """(definitely_new, candidates) — definitely_new rows skip the exact
    index join; candidates go through it. With no filter everything is
    a candidate.

    ``mode``: 'broadcast' ships the whole filter to each worker (fast,
    no extra shuffle — small filters); 'sharded' serves the filter as
    a (shard, bits) relation with a cogrouped probe (task memory
    O(shard) — the 10^10-URL path); 'auto' picks by filter size."""
    if bloom_bytes is None:
        return frontier.limit(0), frontier
    if mode == "auto":
        mode = ("sharded" if len(bloom_bytes) > BROADCAST_MAX_BYTES
                else "broadcast")
    if mode == "sharded":
        marked = _split_sharded(frontier, bloom_bytes, url_col)
    else:
        marked = frontier.withColumn(
            "__maybe_seen", might_contain_col(bloom_bytes, url_col))
    new = marked.filter(~F.col("__maybe_seen")).drop("__maybe_seen")
    cand = marked.filter(F.col("__maybe_seen")).drop("__maybe_seen")
    return new, cand
