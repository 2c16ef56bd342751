"""Product quantization (train → encode → ADC search): exact
replication of the engine's fold/decimal math by a row-wise Python
oracle, recall sanity vs brute force, and partition invariance."""

from __future__ import annotations

from decimal import ROUND_HALF_UP, Decimal

import pytest
from pyspark.sql import functions as F

from ftw_crawler_spark.operators import similarity as simi

SF001 = "/root/testdata/sf0.001"
M, K_CODES, N_ITER = 4, 8, 2
N_VECS = 60


@pytest.fixture(scope="module")
def emb(spark):
    return (spark.read.parquet(f"{SF001}/embeddings.parquet")
            .filter(F.col("vec_id") < N_VECS).cache())


@pytest.fixture(scope="module")
def vecs(emb):
    """{vec_id: [float64]} — Arrow collect converts float32 exactly."""
    return {r["vec_id"]: [float(x) for x in r["embedding"]]
            for r in emb.collect()}


@pytest.fixture(scope="module")
def codebooks(emb):
    cb = simi.pq_train(emb, m=M, k_codes=K_CODES, n_iter=N_ITER)
    return {(r["sub"], r["cid"]): list(r["c"]) for r in cb.collect()}


def _fold_dot(a, b):
    """Sequential left-to-right fold — bit-identical to the engine's
    aggregate(zip_with(...)) (same IEEE binary64 mul/add sequence)."""
    acc = 0.0
    for x, y in zip(a, b):
        acc += x * y
    return acc


def _d2(vs, c):
    """||vs − c||² exactly as the engine computes it:
    (dot(vs,vs) − 2·dot(vs,c)) + dot(c,c), sequential folds."""
    return (_fold_dot(vs, vs) - 2.0 * _fold_dot(vs, c)) + _fold_dot(c, c)


def _slices(v, m=M):
    d_sub = len(v) // m
    return [v[i * d_sub:(i + 1) * d_sub] for i in range(m)]


def _expected_codes(vecs, codebooks, m=M):
    out = {}
    for vid, v in vecs.items():
        codes = []
        for sub, vs in enumerate(_slices(v, m)):
            best = min((cid for (s, cid) in codebooks if s == sub),
                       key=lambda cid: (_d2(vs, codebooks[(sub, cid)]),
                                        cid))
            codes.append(best)
        out[vid] = codes
    return out


def test_pq_train_shape_and_subspace_consistency(codebooks):
    subs = {s for s, _ in codebooks}
    assert subs == set(range(M))
    # Lloyd can drop emptied centroids but never exceeds k per subspace
    for s in range(M):
        cids = [cid for (sub, cid) in codebooks if sub == s]
        assert 0 < len(cids) <= K_CODES
        assert all(len(codebooks[(s, cid)]) == simi.DIM // M
                   for cid in cids)


def test_pq_train_matches_per_subspace_kmeans(spark, emb):
    """pq_train's per-subspace codebook IS the deterministic Lloyd's
    codebook of the sliced corpus (same init, folds, decimal means) —
    checked against kmeans_centroids run independently on slice 0."""
    d_sub = simi.DIM // M
    sliced = emb.select(
        "vec_id",
        F.slice(simi._as_double(F.col("embedding")), 1, d_sub)
        .alias("sv"))
    want = {r["cid"]: list(r["c"]) for r in
            simi.kmeans_centroids(sliced, n_centroids=K_CODES,
                                  n_iter=N_ITER, vec_col="sv").collect()}
    cb = simi.pq_train(emb, m=M, k_codes=K_CODES, n_iter=N_ITER)
    got = {r["cid"]: list(r["c"]) for r in
           cb.filter(F.col("sub") == 0).collect()}
    assert got == want


def test_pq_encode_matches_argmin_oracle(spark, emb, vecs, codebooks):
    cb_df = simi.pq_train(emb, m=M, k_codes=K_CODES, n_iter=N_ITER)
    got = {r["vec_id"]: list(r["codes"]) for r in
           simi.pq_encode(emb, cb_df, m=M).collect()}
    assert got == _expected_codes(vecs, codebooks)
    # the exploded form carries the same assignments, one row per sub
    expl = simi.pq_encode(emb, cb_df, m=M, exploded=True)
    got_e = {(r["vid"], r["sub"]): r["cid"] for r in expl.collect()}
    assert got_e == {(vid, s): c for vid, cs in got.items()
                     for s, c in enumerate(cs)}


def _expected_adc(vecs, codebooks, query_ids, k):
    codes = _expected_codes(vecs, codebooks)
    rows = []
    for qid in query_ids:
        qs = _slices(vecs[qid])
        scored = []
        for vid, cs in codes.items():
            if vid == qid:
                continue
            total = Decimal(0)
            for sub, cid in enumerate(cs):
                d2p = _d2(qs[sub], codebooks[(sub, cid)])
                # the engine sums decimal(28,12)-cast partials: Spark's
                # double→decimal goes through the shortest string repr
                total += Decimal(repr(d2p)).quantize(
                    Decimal("1e-12"), ROUND_HALF_UP)
            scored.append((float(total), vid))
        scored.sort()
        for rank, (adist, vid) in enumerate(scored[:k], start=1):
            rows.append((qid, vid, rank, round(adist, 6)))
    return set(rows)


def test_pq_adc_topk_matches_oracle(spark, emb, vecs, codebooks):
    got = {(r["query_id"], r["neighbor_id"], r["rank"], r["adist_r6"])
           for r in simi.pq_adc_topk(emb, query_ids=range(5), k=4,
                                     m=M, k_codes=K_CODES,
                                     n_iter=N_ITER).collect()}
    assert got == _expected_adc(vecs, codebooks, range(5), 4)


def test_pq_adc_partition_invariance(spark, emb):
    """DECIMAL partial-distance sums make the ranking independent of
    physical partitioning."""
    a = simi.pq_adc_topk(emb.repartition(7), query_ids=range(3), k=3,
                         m=M, k_codes=K_CODES, n_iter=N_ITER)
    b = simi.pq_adc_topk(emb.coalesce(1), query_ids=range(3), k=3,
                         m=M, k_codes=K_CODES, n_iter=N_ITER)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple,
                                                         b.collect()))


def test_pq_adc_recall_vs_brute_force(spark, emb):
    """Lossy-compression sanity: on the synth corpus the exact
    L2-nearest neighbor appears in ADC top-5 for most queries."""
    v = emb.select("vec_id",
                   simi._as_double(F.col("embedding")).alias("v"))
    a = v.select(F.col("vec_id").alias("qid"), F.col("v").alias("qv"))
    b = v.select(F.col("vec_id").alias("vid"), F.col("v").alias("nv"))
    d2 = (simi._dot(F.col("qv"), F.col("qv"))
          - 2.0 * simi._dot(F.col("qv"), F.col("nv"))
          + simi._dot(F.col("nv"), F.col("nv")))
    truth = {r["qid"]: r["b"]["vid"] for r in
             (a.filter(F.col("qid") < 10).crossJoin(b)
              .filter(F.col("qid") != F.col("vid"))
              .groupBy("qid")
              .agg(F.min(F.struct(d2.alias("d"),
                                  F.col("vid"))).alias("b"))
              .collect())}
    ann = simi.pq_adc_topk(emb, query_ids=range(10), k=5, m=M,
                           k_codes=K_CODES, n_iter=N_ITER)
    hits = {(r["query_id"], r["neighbor_id"]) for r in ann.collect()}
    recall = sum((q, n) in hits for q, n in truth.items()) / len(truth)
    assert recall >= 0.6, recall


def test_pq_rejects_indivisible_dim(spark, emb):
    with pytest.raises(ValueError, match="not divisible"):
        simi.pq_train(emb, m=7, k_codes=4, n_iter=1)
