"""Sharded URL-seen bloom filter: shard geometry, no-false-negative
guarantee, OR-merge exactness (the streaming incremental path), and a
loose false-positive sanity bound."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ftw_crawler_spark.operators import seen


@pytest.fixture(scope="module")
def urls(spark):
    return spark.range(2000).select(
        F.concat(F.lit("https://h"), (F.col("id") % 10).cast("string"),
                 F.lit(".example/p/"), F.col("id").cast("string"))
        .alias("url")).cache()


def test_sharded_build_shape(spark, urls):
    blm = seen.build_url_bloom(urls, "url", expected_items=2000,
                               n_shards=8)
    n_bits, k, n_shards = seen.bloom_shape(blm)
    assert n_shards == 8
    total_bytes = len(blm) - 4 - seen._HEADER.size
    # per-shard build/merge unit is exactly total/K — the task-memory
    # bound the partitioned design exists for
    assert n_bits // 8 == total_bytes // n_shards
    assert n_bits * n_shards == total_bytes * 8


def test_no_false_negatives(spark, urls):
    blm = seen.build_url_bloom(urls, "url", expected_items=2000,
                               n_shards=8)
    new, cand = seen.split_by_bloom(
        urls.withColumnRenamed("url", "loc"), blm, "loc")
    assert new.count() == 0          # every inserted url is maybe-seen
    assert cand.count() == 2000


def test_false_positive_rate_sane(spark, urls):
    blm = seen.build_url_bloom(urls, "url", expected_items=2000,
                               fpp=0.03, n_shards=8)
    other = spark.range(2000, 6000).select(
        F.concat(F.lit("https://other.example/"),
                 F.col("id").cast("string")).alias("loc"))
    _, cand = seen.split_by_bloom(other, blm, "loc")
    assert cand.count() / 4000 < 0.1


def test_merge_equals_union_build(spark, urls):
    even = urls.filter(F.xxhash64("url") % 2 == 0)
    odd = urls.filter(F.xxhash64("url") % 2 != 0)
    blm_a = seen.build_url_bloom(even, "url", expected_items=2000,
                                 n_shards=8)
    shape = seen.bloom_shape(blm_a)
    blm_b = seen.build_url_bloom(odd, "url", shape=shape)
    merged = seen.merge_blooms(blm_a, blm_b)
    union_blm = seen.build_url_bloom(urls, "url", shape=shape)
    assert merged == union_blm       # OR-merge is byte-exact


def test_empty_relation_builds_none(spark, urls):
    assert seen.build_url_bloom(urls.limit(0), "url",
                                expected_items=16) is None
    new, cand = seen.split_by_bloom(urls, None, "url")
    assert new.count() == 0 and cand.count() == 2000


def test_sharded_probe_matches_broadcast(spark, urls):
    """The shard-served probe (cogrouped (shard, bits) relation) must
    be bit-identical to the broadcast probe — same shard routing, same
    k positions — on both inserted urls and fresh urls (so false
    positives/negatives agree exactly, not just statistically)."""
    blm = seen.build_url_bloom(urls, "url", expected_items=2000,
                               n_shards=8)
    probed = urls.withColumnRenamed("url", "loc").unionByName(
        spark.range(2000, 6000).select(
            F.concat(F.lit("https://other.example/"),
                     F.col("id").cast("string")).alias("loc")))
    new_b, cand_b = seen.split_by_bloom(probed, blm, "loc",
                                        mode="broadcast")
    new_s, cand_s = seen.split_by_bloom(probed, blm, "loc",
                                        mode="sharded")
    assert sorted(r["loc"] for r in new_s.collect()) == \
        sorted(r["loc"] for r in new_b.collect())
    assert sorted(r["loc"] for r in cand_s.collect()) == \
        sorted(r["loc"] for r in cand_b.collect())
    # no false negatives through the sharded path either
    assert cand_s.join(urls, cand_s.loc == urls.url, "left_semi") \
        .count() == 2000


def test_sharded_probe_task_memory_is_o_shard(spark, urls):
    """Scale invariant of the serving mode: the probe relation holds
    the filter as per-shard rows of EXACTLY total/K bytes, and the
    cogrouped probe evaluates each group against one such row — no
    task ever materializes the concatenated array (at the 10^10-URL
    design point: 8 MiB shard vs ~9 GB whole filter)."""
    blm = seen.build_url_bloom(urls, "url", expected_items=2000,
                               n_shards=8)
    n_bits, _, n_shards = seen.bloom_shape(blm)
    total_bytes = len(blm) - 4 - seen._HEADER.size
    rows = seen.shard_rows(blm)
    assert 0 < len(rows) <= n_shards
    assert all(len(bits) == total_bytes // n_shards
               for _, bits in rows)
    assert all(len(bits) == n_bits // 8 for _, bits in rows)
    # auto mode routes big filters to the sharded server
    assert seen.BROADCAST_MAX_BYTES < 9 * (1 << 30)


def _reassemble(rel_rows, shape) -> bytes:
    """(s, bits) rows → serialized filter, for byte-identity checks."""
    n_bits, k, n_shards = shape
    shard_bytes = n_bits // 8
    merged = bytearray(shard_bytes * n_shards)
    for r in rel_rows:
        merged[r["s"] * shard_bytes:(r["s"] + 1) * shard_bytes] = \
            bytes(r["bits"])
    return seen._MAGIC + seen._HEADER.pack(n_bits, k, n_shards) + \
        bytes(merged)


def test_relation_build_bit_identical_to_bytes_build(spark, urls):
    """The end-to-end relation form (driver never holds the filter)
    must produce byte-for-byte the same filter as the collect-and-merge
    build — multi-shard and the 1-shard partial-reduce special case."""
    for n_shards in (8, 1):
        blm = seen.build_url_bloom(urls, "url", expected_items=2000,
                                   n_shards=n_shards)
        rel, shape = seen.build_url_bloom_relation(
            urls, "url", expected_items=2000, n_shards=n_shards)
        rows = rel.collect()
        assert len(rows) == len({r["s"] for r in rows})  # one row/shard
        assert _reassemble(rows, shape) == blm


def test_merge_relations_matches_bytes_merge(spark, urls):
    even = urls.filter(F.xxhash64("url") % 2 == 0)
    odd = urls.filter(F.xxhash64("url") % 2 != 0)
    blm_a = seen.build_url_bloom(even, "url", expected_items=2000,
                                 n_shards=8)
    shape = seen.bloom_shape(blm_a)
    rel_a, _ = seen.build_url_bloom_relation(even, "url", shape=shape)
    rel_b, _ = seen.build_url_bloom_relation(odd, "url", shape=shape)
    merged_rel = seen.merge_bloom_relations(rel_a, rel_b)
    blm_b = seen.build_url_bloom(odd, "url", shape=shape)
    assert _reassemble(merged_rel.collect(), shape) == \
        seen.merge_blooms(blm_a, blm_b)


def test_split_by_index_relation_path_matches_broadcast(
        spark, urls, monkeypatch):
    """Force the size dispatch down the relation path and check the
    split agrees row-for-row with the broadcast path (same routing,
    same k positions — identical false positives too)."""
    probed = urls.withColumnRenamed("url", "loc").unionByName(
        spark.range(2000, 6000).select(
            F.concat(F.lit("https://other.example/"),
                     F.col("id").cast("string")).alias("loc")))
    new_b, cand_b = seen.split_by_index(probed, urls, "loc", "url",
                                        expected_items=2000)
    monkeypatch.setattr(seen, "BROADCAST_MAX_BYTES", 0)
    new_r, cand_r = seen.split_by_index(probed, urls, "loc", "url",
                                        expected_items=2000)
    assert sorted(r["loc"] for r in new_r.collect()) == \
        sorted(r["loc"] for r in new_b.collect())
    assert sorted(r["loc"] for r in cand_r.collect()) == \
        sorted(r["loc"] for r in cand_b.collect())
    # the relation path exposes no concatenated array anywhere: its
    # inputs stay (s, bits) rows of exactly one shard each
    rel, shape = seen.build_url_bloom_relation(urls, "url",
                                               expected_items=2000)
    assert all(len(r["bits"]) == shape[0] // 8 for r in rel.collect())


def test_auto_shard_count_scales_with_size(spark, urls):
    # small filter → 1 shard; the 10^10-design point → n_bits/2^26
    blm = seen.build_url_bloom(urls, "url", expected_items=2000)
    assert seen.bloom_shape(blm)[2] == 1
    total_bits, _ = seen._params(10_000_000_000, 0.03)
    assert total_bits // max(1, total_bits // seen._SHARD_MAX_BITS) \
        == seen._SHARD_MAX_BITS


def test_incremental_url_filter_both_forms(spark, urls, monkeypatch):
    """IncrementalUrlFilter: build-once + O(batch) add, identical
    splits in both serving forms (bytes vs sharded relation), and a
    fresh url never false-negatives after add()."""
    base = urls.filter(F.col("url").endswith("0"))
    extra = urls.filter(~F.col("url").endswith("0"))
    probe = urls.withColumnRenamed("url", "loc").unionByName(
        spark.range(9000, 9400).select(
            F.concat(F.lit("https://fresh.example/"),
                     F.col("id").cast("string")).alias("loc")))

    def run():
        # compact_every=2 with three adds exercises the relation path's
        # full block lifecycle: persist -> checkpoint-compact -> persist
        flt = seen.IncrementalUrlFilter(base, "url",
                                        expected_items=4000,
                                        compact_every=2)
        for third in (0, 1, 2):
            flt.add(extra.filter(
                F.crc32(F.col("url")) % 3 == third), "url")
        new, cand = flt.split(probe, "loc")
        return (sorted(r["loc"] for r in new.collect()),
                sorted(r["loc"] for r in cand.collect()))

    new_b, cand_b = run()
    monkeypatch.setattr(seen, "BROADCAST_MAX_BYTES", 0)
    new_r, cand_r = run()
    # bit-identical across serving forms (same geometry, same hashes)
    assert new_b == new_r and cand_b == cand_r
    # no false negatives: every added url is a candidate
    added = {r["url"] for r in urls.collect()}
    assert added <= set(cand_b)
    # the filter actually filters: fresh urls are overwhelmingly
    # definitely-new (the 4000-sized geometry holds 2000 urls, so the
    # fp rate is well under the 3% design point — budget 3% of 400)
    fresh = {r["loc"] for r in probe.collect()} - added
    fresh_in_new = len(set(new_b) & fresh)
    assert fresh_in_new >= len(fresh) - 12, (fresh_in_new, len(fresh))
    assert len(new_b) + len(cand_b) == probe.count()


def test_fused_delta_counts_matches_direct_build(spark, urls):
    """fused_delta_counts_plan + assemble_bloom_bytes must be
    byte-identical to build_url_bloom at the same shape, and its
    counts row must equal the separate aggregation — the contract the
    crawl's fused link-discovery admission job relies on."""
    flagged = urls.withColumn(
        "skip_reason",
        F.when(F.col("url").endswith("7"), F.lit("x")))
    shape = seen._resolve_shape(urls, 4000, 0.03, None, None)
    rows = seen.fused_delta_counts_plan(
        flagged, "url", shape, "skip_reason").collect()
    fused_bytes = seen.assemble_bloom_bytes(
        [(r["s"], r["bits"]) for r in rows if r["s"] >= 0], shape)
    direct = seen.build_url_bloom(urls, "url", shape=shape)
    assert fused_bytes == direct
    n = sum(r["n"] for r in rows if r["s"] == -1)
    ok = sum(r["ok"] for r in rows if r["s"] == -1)
    assert n == 2000
    assert ok == flagged.filter(F.col("skip_reason").isNull()).count()
    # merging the fused delta == the incremental filter's own add()
    a = seen.IncrementalUrlFilter(urls.limit(500), "url",
                                  expected_items=4000)
    b = seen.IncrementalUrlFilter(urls.limit(500), "url",
                                  expected_items=4000)
    assert a.shape == shape and a.is_broadcastable
    a.add(urls, "url")
    b.add_bytes(fused_bytes)
    assert a._bytes == b._bytes
