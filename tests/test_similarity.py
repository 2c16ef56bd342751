"""Similarity/ANN operators: fold-vs-numpy math agreement, and the
kmeans-refined IVF wiring (recall A/B against naive seeding)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ftw_crawler_spark.operators import similarity as simi

SF001 = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF001}/embeddings.parquet").cache()


def test_fast_dot_agrees_with_fold(spark, emb):
    """use_hof=False (Arrow/numpy batch dot) must agree with the
    sequential fold to ≤1e-9 relative — the contract that lets the
    fast path serve production while the fold stays the oracle mode."""
    v = emb.limit(40).select(
        F.col("vec_id"),
        simi._as_double(F.col("embedding")).alias("v"))
    a = v.select(F.col("vec_id").alias("a"), F.col("v").alias("av"))
    b = v.select(F.col("vec_id").alias("b"), F.col("v").alias("bv"))
    pairs = a.crossJoin(b).filter(F.col("a") < F.col("b"))
    d_hof = simi._dot(F.col("av"), F.col("bv"), use_hof=True)
    d_np = simi._dot(F.col("av"), F.col("bv"), use_hof=False)
    worst = (pairs
             .select((F.abs(d_hof - d_np)
                      / (F.abs(d_hof) + F.lit(1e-30))).alias("rel"))
             .agg(F.max("rel").alias("m")).first()["m"])
    assert worst <= 1e-9, worst


def test_fast_path_same_neighbors(spark, emb):
    """End to end, the fast path returns the same neighbor SETS as the
    oracle path on the test corpus (rank flips would need exact float
    ties, which the synth embeddings don't have)."""
    slow = simi.lsh_ann(emb, query_ids=range(5), k=5, use_hof=True)
    fast = simi.lsh_ann(emb, query_ids=range(5), k=5, use_hof=False)
    s = {(r["query_id"], r["neighbor_id"]) for r in slow.collect()}
    f = {(r["query_id"], r["neighbor_id"]) for r in fast.collect()}
    assert s == f and len(s) > 0


def _recall(ann, truth):
    hit = {(r["query_id"], r["neighbor_id"]) for r in ann.collect()}
    return len(hit & truth) / len(truth)


def test_ivf_refined_centroids_improve_recall(spark, emb):
    """kmeans_centroids → ivf_ann (the production wiring) must not
    lose recall vs the naive first-n seeding at equal n_probe, and on
    the synth corpus it strictly gains (better-balanced inverted
    lists). Ground truth = exact brute-force top-k."""
    queries = emb.filter(F.col("vec_id") < 10)
    truth = {(r["query_id"], r["neighbor_id"])
             for r in simi.cosine_topk(emb, queries, k=5).collect()}
    naive = simi.ivf_ann(emb, query_ids=range(10), k=5,
                         n_centroids=8, n_probe=2)
    cents = simi.kmeans_centroids(emb, n_centroids=8, n_iter=2)
    refined = simi.ivf_ann(emb, query_ids=range(10), k=5,
                           n_probe=2, centroids=cents)
    r_naive, r_refined = _recall(naive, truth), _recall(refined, truth)
    assert r_refined >= r_naive
    assert r_refined > 0.5
