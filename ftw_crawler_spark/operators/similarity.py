"""Similarity search over embedding columns (array<float>).

Training-data-pipeline operators beyond the reference crawler: a
100 TB corpus needs embedding-level near-dup detection and ANN
retrieval. Two paths:

- ``cosine_topk``: brute-force exact top-k — the correctness baseline.
  The query side is tiny and **broadcast**; the corpus side streams.
  Two math paths (``use_hof``): the default sequential fold
  (``zip_with`` + ``aggregate`` — deterministic summation order,
  bit-reproduced by DuckDB's list_dot_product: the ORACLE mode) and
  an Arrow/numpy batch dot (``use_hof=False`` — the production fast
  path; same plan shape, ~10-50× cheaper per pair, not bit-stable
  across engines).
- ``lsh_ann``: random-hyperplane (sign) LSH — the scale path. Plane
  sign matrices are derived deterministically from md5 so the whole
  pipeline (codes, buckets, re-rank) has an exact ANSI-SQL oracle.
  At 10^10 rows the bucket join replaces the O(N·Q) cross product
  with a shuffle on the code key; skewed buckets are handled by
  increasing ``n_planes`` (bucket size halves per plane).

- ``pq_train`` / ``pq_encode`` / ``pq_adc_topk``: product quantization
  (Jégou et al. 2011) — the compressed-vector path. Vectors become
  ``m`` small integer codes (dim·8 bytes → m ints); search is the
  asymmetric-distance LUT sum over the codes relation, so a scan at
  retrieval time never touches a corpus float. The same deterministic
  Lloyd's machinery trains the per-subspace codebooks.

Scale notes: brute-force is O(N·Q·d) but shuffle-free (broadcast
join); LSH is one shuffle on (code) + a narrow re-rank. For IVF-style
partitioning, cluster centroids would play the role of ``code`` —
same bucket-join shape. PQ is what keeps a 10^10-vector corpus
memory-resident: codes are ~64× smaller than the float vectors, the
LUT is broadcast, and the scoring aggregation shuffles only narrow
(query, vid, decimal) partials with map-side combine.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

DEFAULT_PLANES = 6
DIM = 64


def _md5_long(s: str) -> int:
    """60-bit md5-prefix int — same value as dedup.md5_long / DuckDB
    ``('0x'||substr(md5(s),1,15))::BIGINT``."""
    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:15], 16)


def plane_signs(n_planes: int = DEFAULT_PLANES, dim: int = DIM) -> list:
    """Deterministic ±1 hyperplane matrix: sign(p,j) = +1 iff
    md5_long(f"{p}:{j}") is odd. Reproducible in any engine with md5."""
    return [[1.0 if _md5_long(f"{p}:{j}") % 2 == 1 else -1.0
             for j in range(dim)]
            for p in range(n_planes)]


@F.pandas_udf(T.DoubleType())
def _dot_vectorized(a: pd.Series, b: pd.Series) -> pd.Series:
    """Arrow-batched numpy dot — the production fast path (~10-50×
    the interpreted HOF fold on wide candidate joins). NOT bit-equal
    to a sequential fold (numpy uses SIMD/pairwise summation), so the
    oracle-checked queries keep ``use_hof=True``; both paths agree to
    ≤1e-9 relative (pinned by test_similarity)."""
    if len(a) == 0:
        return pd.Series([], dtype=float)
    av = np.stack(a.to_numpy())
    bv = np.stack(b.to_numpy())
    return pd.Series(np.einsum("ij,ij->i", av, bv))


def _dot(a, b, use_hof: bool = True):
    """Dot product of two array<double> columns. ``use_hof=True`` is
    the sequential fold (deterministic order — matches DuckDB
    ``list_dot_product`` bit-for-bit: the cross-engine ORACLE mode);
    ``use_hof=False`` is the Arrow/numpy fast path for production
    scale (same pattern as dedup's ``use_md5=False``)."""
    if not use_hof:
        return _dot_vectorized(a, b)
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, x: acc + x)


def _as_double(col):
    return F.transform(col, lambda x: x.cast("double"))


def with_norm(df: DataFrame, vec_col: str = "embedding",
              use_hof: bool = True) -> DataFrame:
    v = _as_double(F.col(vec_col))
    return (df.withColumn("__v", v)
            .withColumn("__norm",
                        F.sqrt(_dot(F.col("__v"), F.col("__v"),
                                    use_hof))))


def cosine_topk(corpus: DataFrame, queries: DataFrame, k: int = 5,
                id_col: str = "vec_id",
                vec_col: str = "embedding",
                use_hof: bool = True) -> DataFrame:
    """Exact top-k cosine neighbors of each query over the corpus.

    queries is broadcast (small side); sim = dot/(|a|·|b|) with
    deterministic fold order (``use_hof=False`` swaps in the numpy
    fast path); ties broken by neighbor id. Returns
    (query_id, neighbor_id, rank, sim_r4).
    """
    c = with_norm(corpus, vec_col, use_hof).select(
        F.col(id_col).alias("neighbor_id"),
        F.col("__v").alias("nv"), F.col("__norm").alias("nn"))
    q = with_norm(queries, vec_col, use_hof).select(
        F.col(id_col).alias("query_id"),
        F.col("__v").alias("qv"), F.col("__norm").alias("qn"))
    sim = _dot(F.col("qv"), F.col("nv"), use_hof) / (F.col("qn")
                                                     * F.col("nn"))
    pairs = (c.join(F.broadcast(q),
                    F.col("neighbor_id") != F.col("query_id"))
             .withColumn("sim", sim))
    w = Window.partitionBy("query_id").orderBy(
        F.desc("sim"), F.asc("neighbor_id"))
    return (pairs.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "neighbor_id",
                    F.col("rank").cast("long").alias("rank"),
                    F.round("sim", 4).alias("sim_r4")))


def lsh_codes(df: DataFrame, n_planes: int = DEFAULT_PLANES,
              id_col: str = "vec_id",
              vec_col: str = "embedding") -> DataFrame:
    """(id, code): sign-LSH bucket code as an n_planes-char '0'/'1'
    string. Pure column expressions (codegen)."""
    signs = plane_signs(n_planes)
    v = _as_double(F.col(vec_col))
    bits = []
    for p in range(n_planes):
        plane = F.array(*[F.lit(s) for s in signs[p]])
        proj = _dot(v, plane)
        bits.append(F.when(proj > 0, F.lit("1")).otherwise(F.lit("0")))
    return df.select(F.col(id_col).alias("vid"),
                     v.alias("__v"),
                     F.concat(*bits).alias("code"))


def _lloyd(corpus: DataFrame, n_centroids: int, n_iter: int,
           id_col: str, vec_col: str):
    """Shared Lloyd's loop, fully IN-PLAN: returns (vecs, assign_fn,
    cents) where ``cents`` is the final (cid int, c array<double>)
    RELATION — the whole n_iter chain evaluates inside the caller's
    single action, with the tiny per-iteration centroid relations
    riding broadcast exchanges (the same in-plan-iteration shape as
    linkgraph.pagerank's rounds). The previous form collected K·dim
    doubles to the driver per iteration, which made every Lloyd
    consumer pay n_iter+1 serial driver round-trips — measured as the
    dominant cost of the kmeans/ivf queries at sandbox job latency
    (BENCH_r04 audit; values bit-identical either way because the
    collect round-tripped exact IEEE doubles)."""
    # lazy-checkpoint once: the chain references this relation in
    # every iteration plus the final assignment — without it each
    # occurrence re-reads the corpus and re-runs the interpreted
    # norm fold
    vecs = (corpus.select(F.col(id_col).alias("vid"),
                          _as_double(F.col(vec_col)).alias("v"))
            .withColumn("n2", _dot(F.col("v"), F.col("v")))
            .localCheckpoint(eager=False))

    def assign(cents_df):
        cdf = cents_df.withColumn("c2", _dot(F.col("c"), F.col("c")))
        d2 = (F.col("n2") - 2.0 * _dot(F.col("v"), F.col("c"))
              + F.col("c2"))
        # argmin as a map-side-combinable min-struct aggregation — a
        # row_number window over the N·K crossJoin would sort every
        # vid's K rows; (d2, cid) is unique per group (one row per
        # cid), so the struct min IS the (d2 asc, cid asc) argmin and
        # the trailing v field never decides the comparison
        return (vecs.crossJoin(F.broadcast(cdf))
                .withColumn("__d2", d2)
                .groupBy("vid")
                .agg(F.min(F.struct(F.col("__d2"), F.col("cid"),
                                    F.col("v"))).alias("__b"))
                .select("vid", F.col("__b.cid").alias("cid"),
                        F.col("__b.v").alias("v"),
                        F.col("__b.__d2").alias("__d2")))

    cents = vecs.filter(F.col("vid") < n_centroids).select(
        F.col("vid").cast("int").alias("cid"), F.col("v").alias("c"))
    for _ in range(n_iter):
        assigned = assign(cents)
        comp = assigned.select(
            "cid", F.posexplode("v").alias("j", "x"))
        # centroids that lost every member drop out of the groupBy
        # naturally (same policy as the SQL oracle's empty groups)
        cents = (comp.groupBy("cid", "j")
                 .agg((F.sum(F.col("x").cast("decimal(28,12)"))
                       .cast("double")
                       / F.count(F.lit(1))).alias("m"))
                 .groupBy("cid")
                 .agg(F.array_sort(F.collect_list(
                     F.struct("j", "m"))).alias("jm"))
                 .select("cid", F.col("jm.m").alias("c")))
    if n_iter:
        # the final centroid relation is consumed more than once
        # (ivf_ann broadcasts it for lists AND probes) — checkpoint so
        # the Lloyd chain is never re-run per consumer (the
        # multi-consumer-sketch invariant)
        cents = cents.localCheckpoint(eager=False)
    return vecs, assign, cents


def kmeans_refine(corpus: DataFrame, n_centroids: int = 4,
                  n_iter: int = 2, id_col: str = "vec_id",
                  vec_col: str = "embedding") -> DataFrame:
    """Lloyd's k-means for IVF centroid refinement — the iterative
    DataFrame algorithm, made CROSS-ENGINE DETERMINISTIC:

    - distances use sequential-fold dot products (``aggregate`` over
      ``zip_with`` — same fold order as DuckDB's list_dot_product), so
      ||v-c||² = |v|² − 2·v·c + |c|² is bit-stable;
    - centroid means are computed per component with DECIMAL(28,12)
      sums (exact, order-independent — a double sum's value depends on
      reduction order, which no distributed engine guarantees) cast
      back to double;
    - init = first ``n_centroids`` vectors; ties break on lower cid.

    Each iteration: broadcast centroids → assign (argmin L2) → exact
    per-component mean → new centroid table (tiny, driver-collected:
    K·dim doubles — the classic Lloyd's-on-Spark shape). Returns the
    final assignment (vec_id, cid, dist_r6).
    """
    _, assign, cents = _lloyd(corpus, n_centroids, n_iter, id_col,
                              vec_col)
    final = assign(cents)
    return final.select(F.col("vid").alias("vec_id"), "cid",
                        F.round(F.sqrt(F.col("__d2")), 6)
                        .alias("dist_r6"))


def kmeans_centroids(corpus: DataFrame, n_centroids: int = 4,
                     n_iter: int = 2, id_col: str = "vec_id",
                     vec_col: str = "embedding") -> DataFrame:
    """The refined centroid TABLE (cid, c) — the piece ``ivf_ann``
    consumes (``centroids=``); same deterministic Lloyd's loop as
    ``kmeans_refine``. Returned LAZY (checkpointed relation): nothing
    runs until the consumer's action, so kmeans→ivf composes into one
    job."""
    _, _, cents = _lloyd(corpus, n_centroids, n_iter, id_col, vec_col)
    return cents


def ivf_ann(corpus: DataFrame, query_ids, k: int = 5,
            n_centroids: int = 8, n_probe: int = 2,
            id_col: str = "vec_id", vec_col: str = "embedding",
            centroids: DataFrame | None = None,
            use_hof: bool = True) -> DataFrame:
    """IVF-style ANN: corpus rows are assigned to their nearest centroid
    (inverted lists); each query probes its ``n_probe`` nearest lists
    and re-ranks candidates by exact cosine.

    ``centroids`` — a (cid, c array<double>) table, normally the
    output of ``kmeans_centroids`` (refined seeding: better-balanced
    inverted lists → higher recall at the same n_probe). Defaults to
    the first ``n_centroids`` corpus vectors (deterministic naive
    seeding — kept as the fallback and for A/B recall tests). Either
    way the centroid table is tiny and broadcast twice (assignment +
    probe); the only shuffle is the candidate equi-join on
    ``centroid_id`` — same bucket-join shape as LSH, with list sizes
    ~N/n_centroids instead of N/2^planes.

    Returns (query_id, neighbor_id, rank).
    """
    if centroids is not None:
        cents = (centroids.select(F.col("cid").alias("centroid_id"),
                                  F.col("c").alias("cv"))
                 .withColumn("cn", F.sqrt(_dot(F.col("cv"),
                                               F.col("cv"), use_hof))))
    else:
        cents = (with_norm(corpus.filter(F.col(id_col) < n_centroids),
                           vec_col, use_hof)
                 .select(F.col(id_col).alias("centroid_id"),
                         F.col("__v").alias("cv"),
                         F.col("__norm").alias("cn")))

    def assign(df: DataFrame, topn: int, out: str) -> DataFrame:
        """nearest-centroid ids by cosine; ties break on centroid_id."""
        sim = _dot(F.col("__v"), F.col("cv"), use_hof) / (F.col("__norm")
                                                          * F.col("cn"))
        scored = (df.crossJoin(F.broadcast(cents))
                  .withColumn("__csim", sim))
        if topn == 1:
            # the corpus-wide list assignment: argmax as a map-side-
            # combinable min-struct agg (negated sim is exact), not a
            # row_number sort of every row's K centroid candidates
            return (scored
                    .groupBy(id_col)
                    .agg(F.min(F.struct(-F.col("__csim"),
                                        F.col("centroid_id"),
                                        F.col("__v"),
                                        F.col("__norm"))).alias("__b"))
                    .select(F.col(id_col),
                            F.col("__b.__v").alias("__v"),
                            F.col("__b.__norm").alias("__norm"),
                            F.col("__b.centroid_id").alias(out)))
        w = Window.partitionBy(id_col).orderBy(
            F.desc("__csim"), F.asc("centroid_id"))
        return (scored
                .withColumn("__crank", F.row_number().over(w))
                .filter(F.col("__crank") <= topn)
                .select(F.col(id_col), F.col("__v"), F.col("__norm"),
                        F.col("centroid_id").alias(out)))

    normed = with_norm(corpus, vec_col, use_hof).select(
        id_col, "__v", "__norm")
    lists = assign(normed, 1, "centroid_id")
    probes = assign(normed.filter(F.col(id_col).isin(list(query_ids))),
                    n_probe, "centroid_id")

    q = probes.select(F.col(id_col).alias("query_id"), "centroid_id",
                      F.col("__v").alias("qv"), F.col("__norm").alias("qn"))
    c = lists.select(F.col(id_col).alias("neighbor_id"), "centroid_id",
                     F.col("__v").alias("nv"), F.col("__norm").alias("nn"))
    sim = _dot(F.col("qv"), F.col("nv"), use_hof) / (F.col("qn")
                                                     * F.col("nn"))
    w = Window.partitionBy("query_id").orderBy(
        F.desc("sim"), F.asc("neighbor_id"))
    # each corpus row lives in exactly one inverted list, so a
    # (query, neighbor) pair joins at most once — no dedup needed
    return (c.join(F.broadcast(q), "centroid_id")
            .filter(F.col("neighbor_id") != F.col("query_id"))
            .withColumn("sim", sim)
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "neighbor_id",
                    F.col("rank").cast("long").alias("rank")))


def _pq_slices(df: DataFrame, m: int, id_col: str, vec_col: str,
               out_id: str = "vid", dim: int = DIM) -> DataFrame:
    """(id, sub, vs): each vector split into ``m`` contiguous
    subvectors. Raises if the dimension doesn't divide evenly (PQ's
    standard precondition)."""
    if dim % m:
        raise ValueError(f"pq: dim {dim} not divisible by m {m}")
    v = _as_double(F.col(vec_col))
    d_sub = dim // m
    return df.select(
        F.col(id_col).alias(out_id),
        F.posexplode(F.array(*[
            F.slice(v, i * d_sub + 1, d_sub)
            for i in range(m)])).alias("sub", "vs"))


def pq_train(corpus: DataFrame, m: int = 4, k_codes: int = 16,
             n_iter: int = 2, id_col: str = "vec_id",
             vec_col: str = "embedding", dim: int = DIM) -> DataFrame:
    """Product-quantization codebooks (Jégou et al. 2011): the vector
    space is split into ``m`` orthogonal subspaces of dim/m and each
    gets its own ``k_codes``-centroid Lloyd's codebook — the SAME
    deterministic loop as ``kmeans_centroids`` (sequential-fold
    distances, DECIMAL component means, first-k init), run per
    subspace on the sliced corpus. Returns the (sub, cid, c) relation,
    lazy like ``kmeans_centroids`` so train → encode composes into one
    job.

    Memory at scale: the codebook is m·k_codes·(dim/m) doubles = one
    broadcast row set; corpus vectors are read once per subspace."""
    if dim % m:
        raise ValueError(f"pq: dim {dim} not divisible by m {m}")
    d_sub = dim // m
    parts = []
    for i in range(m):
        sub_corpus = corpus.select(
            F.col(id_col),
            F.slice(_as_double(F.col(vec_col)), i * d_sub + 1, d_sub)
            .alias("__sv"))
        _, _, cents = _lloyd(sub_corpus, k_codes, n_iter, id_col,
                             "__sv")
        parts.append(cents.select(F.lit(i).cast("int").alias("sub"),
                                  "cid", "c"))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def pq_encode(corpus: DataFrame, codebooks: DataFrame, m: int = 4,
              id_col: str = "vec_id", vec_col: str = "embedding",
              exploded: bool = False, dim: int = DIM) -> DataFrame:
    """PQ encoding: each vector becomes ``m`` small integer code ids —
    dim·8 bytes down to m ints; the compression that lets a 100 TB
    embedding corpus keep its searchable form in cluster memory.

    Per subspace, code = argmin-L2 codebook entry (min-struct agg on
    (d2, cid) — map-side combinable, never a per-vector sort); the
    codebook is broadcast. ``exploded=True`` returns the narrow
    (vid, sub, cid) relation (what ``pq_adc_topk`` consumes — skips
    the reassembly shuffle); default returns (vec_id, codes array)."""
    cb = (codebooks.select("sub", "cid", "c")
          .withColumn("c2", _dot(F.col("c"), F.col("c"))))
    sliced = _pq_slices(corpus, m, id_col, vec_col, dim=dim)
    d2 = (_dot(F.col("vs"), F.col("vs"))
          - 2.0 * _dot(F.col("vs"), F.col("c")) + F.col("c2"))
    assigned = (sliced.join(F.broadcast(cb), "sub")
                .withColumn("__d2", d2)
                .groupBy("vid", "sub")
                .agg(F.min(F.struct(F.col("__d2"),
                                    F.col("cid"))).alias("__b"))
                .select("vid", "sub", F.col("__b.cid").alias("cid")))
    if exploded:
        return assigned
    return (assigned.groupBy("vid")
            .agg(F.array_sort(F.collect_list(
                F.struct("sub", "cid"))).alias("sc"))
            .select(F.col("vid").alias(id_col),
                    F.col("sc.cid").alias("codes")))


def pq_adc_topk(corpus: DataFrame, query_ids, k: int = 5, m: int = 4,
                k_codes: int = 16, n_iter: int = 2,
                id_col: str = "vec_id", vec_col: str = "embedding",
                codebooks: DataFrame | None = None,
                dim: int = DIM) -> DataFrame:
    """PQ asymmetric-distance top-k (ADC): queries stay exact, corpus
    rows are their integer codes, and distance is the codebook-table
    sum ``Σ_sub LUT[sub][code]`` where LUT[sub][cid] =
    ||q_sub − c(sub,cid)||² — the scan never touches a corpus float.

    Plan shape at 10^10 rows: the LUT (queries × codebook, Q·m·k_codes
    rows) is broadcast; the scored relation is the narrow
    (vid, sub, cid) codes at m ints/vector; the one aggregation
    shuffles (query_id, vid) pairs with map-side combine. DECIMAL
    partial-distance sums make the ranking order-independent, so the
    operator is deterministic under any partitioning (pinned by
    test_pq's partition-invariance case). Returns
    (query_id, neighbor_id, rank, adist_r6)."""
    if codebooks is None:
        codebooks = pq_train(corpus, m, k_codes, n_iter, id_col,
                             vec_col, dim=dim)
    codes = pq_encode(corpus, codebooks, m, id_col, vec_col,
                      exploded=True, dim=dim)
    cb = (codebooks.select("sub", "cid", "c")
          .withColumn("c2", _dot(F.col("c"), F.col("c"))))
    q = _pq_slices(corpus.filter(F.col(id_col).isin(list(query_ids))),
                   m, id_col, vec_col, out_id="query_id", dim=dim)
    lut = (q.join(F.broadcast(cb), "sub")
           .select("query_id", "sub", "cid",
                   (_dot(F.col("vs"), F.col("vs"))
                    - 2.0 * _dot(F.col("vs"), F.col("c"))
                    + F.col("c2")).alias("d2p")))
    scored = (codes.join(F.broadcast(lut), ["sub", "cid"])
              .filter(F.col("vid") != F.col("query_id"))
              .groupBy("query_id", "vid")
              .agg(F.sum(F.col("d2p").cast("decimal(28,12)"))
                   .cast("double").alias("adist")))
    w = Window.partitionBy("query_id").orderBy(
        F.asc("adist"), F.asc("vid"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", F.col("vid").alias("neighbor_id"),
                    F.col("rank").cast("long").alias("rank"),
                    F.round("adist", 6).alias("adist_r6")))


def embedding_neardup_pairs(corpus: DataFrame, tau: float = 0.25,
                            n_planes: int = DEFAULT_PLANES,
                            id_col: str = "vec_id",
                            vec_col: str = "embedding",
                            use_hof: bool = True) -> DataFrame:
    """Embedding-cosine near-dup detection (training-data pipeline op):
    candidate pairs share a sign-LSH bucket (one shuffle on ``code``),
    then exact-cosine verify at ``round(sim, 6) >= tau`` — the rounding
    pins the threshold comparison across engines so the whole operator
    is oracle-checkable. Returns (a, b, sim_r4) with a < b.

    At 10^10 rows the bucket join bounds the pair candidates to
    intra-bucket O(Σ b_i²); raise ``n_planes`` to halve bucket sizes
    per extra plane (same knob as MinHash LSH band width)."""
    coded = lsh_codes(corpus, n_planes, id_col, vec_col)
    coded = coded.withColumn(
        "__norm", F.sqrt(_dot(F.col("__v"), F.col("__v"), use_hof)))
    left = coded.select(F.col("vid").alias("a"), "code",
                        F.col("__v").alias("av"),
                        F.col("__norm").alias("an"))
    right = coded.select(F.col("vid").alias("b"), "code",
                         F.col("__v").alias("bv"),
                         F.col("__norm").alias("bn"))
    sim = _dot(F.col("av"), F.col("bv"), use_hof) / (F.col("an")
                                                     * F.col("bn"))
    return (left.join(right, "code")
            .filter(F.col("a") < F.col("b"))
            .withColumn("sim", sim)
            .filter(F.round("sim", 6) >= tau)
            .select("a", "b", F.round("sim", 4).alias("sim_r4")))


def semdedup(corpus: DataFrame, tau: float = 0.7,
             n_centroids: int = 4, n_iter: int = 2,
             id_col: str = "vec_id", vec_col: str = "embedding",
             use_hof: bool = True) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic
    deduplication by k-means clustering then WITHIN-CLUSTER cosine
    pruning — the embedding-space analog of MinHash near-dup, catching
    paraphrases and re-renders that share no n-grams.

    Pipeline (one plan):

    1. deterministic Lloyd's k-means (the shared ``_lloyd`` loop)
       assigns every vector to a cluster — the clustering exists ONLY
       to bound comparisons: pairs are mined per cluster, never
       corpus-wide;
    2. within each cluster, pairs at ``round(cos, 6) >= tau`` are
       semantic duplicates (equi-join on ``cid`` — at 10^10 rows the
       candidate set is intra-cluster O(Σ c_i²); raise ``n_centroids``
       to shrink clusters, exactly the paper's scaling knob);
    3. duplicate pairs form groups via ``connected_components`` (the
       same clusterer every other dedup family feeds);
    4. keep policy: per group, the member FURTHEST from its centroid
       survives (tie → lower id) — Abbas et al.'s low-similarity-to-
       centroid choice, which retains the least prototypical example
       of each semantic duplicate set and drops the redundant core.

    Returns one row per corpus vector:
    (vec_id, cid, dist_r6, grp, keep) — ``grp`` the duplicate-group id
    (min member id; own id when the vector has no duplicate), ``keep``
    1 for the retained representative else 0. ``keep = 1`` rows are
    the deduplicated corpus; the kmeans assignment (vec_id, cid,
    dist_r6) is the ``kmeans_refine`` relation verbatim.

    Determinism: fold-order dot products + decimal centroid means (the
    ``_lloyd`` contract) make cluster ids, distances, similarities and
    therefore groups and keep flags bit-identical across engines — the
    whole operator has an exact SQL oracle (kmeans CTE generations +
    recursive-CTE closure over the pair relation).
    """
    from ftw_crawler_spark.operators.dedup import connected_components
    _, assign, cents = _lloyd(corpus, n_centroids, n_iter, id_col,
                              vec_col)
    # the assignment feeds three consumers (both pair-join sides + the
    # final projection) — checkpoint so the Lloyd chain runs once (the
    # multi-consumer-sketch invariant)
    asg = assign(cents).localCheckpoint(eager=False)
    withn = asg.withColumn(
        "__n", F.sqrt(_dot(F.col("v"), F.col("v"), use_hof)))
    left = withn.select(F.col("vid").alias("a"), "cid",
                        F.col("v").alias("av"), F.col("__n").alias("an"))
    right = withn.select(F.col("vid").alias("b"), "cid",
                         F.col("v").alias("bv"), F.col("__n").alias("bn"))
    sim = _dot(F.col("av"), F.col("bv"), use_hof) / (F.col("an")
                                                     * F.col("bn"))
    pairs = (left.join(right, "cid")
             .filter(F.col("a") < F.col("b"))
             .filter(F.round(sim, 6) >= tau)
             .select("a", "b"))
    comp = connected_components(pairs)
    lab = (asg.join(comp, asg["vid"] == comp["node"], "left")
           .select("vid", "cid", "__d2",
                   F.coalesce("component", "vid").alias("grp")))
    w = Window.partitionBy("grp").orderBy(F.desc("__d2"), F.asc("vid"))
    return (lab.withColumn("__rk", F.row_number().over(w))
            .select(F.col("vid").alias("vec_id"), "cid",
                    F.round(F.sqrt("__d2"), 6).alias("dist_r6"),
                    "grp",
                    F.when(F.col("__rk") == 1, F.lit(1))
                    .otherwise(F.lit(0)).cast("long").alias("keep")))


def lsh_ann(corpus: DataFrame, query_ids, k: int = 5,
            n_planes: int = DEFAULT_PLANES, id_col: str = "vec_id",
            vec_col: str = "embedding",
            use_hof: bool = True) -> DataFrame:
    """Approximate top-k: candidates share the query's LSH bucket,
    re-ranked by exact cosine. Returns (query_id, neighbor_id, rank).

    The bucket equi-join on ``code`` is the one shuffle; at corpus
    scale the query side (codes of the query set) is broadcast.
    """
    coded = lsh_codes(corpus, n_planes, id_col, vec_col)
    coded = coded.withColumn(
        "__norm", F.sqrt(_dot(F.col("__v"), F.col("__v"), use_hof)))
    q = (coded.filter(F.col("vid").isin(list(query_ids)))
         .select(F.col("vid").alias("query_id"),
                 F.col("code"),
                 F.col("__v").alias("qv"), F.col("__norm").alias("qn")))
    cand = (coded.select(F.col("vid").alias("neighbor_id"), "code",
                         F.col("__v").alias("nv"),
                         F.col("__norm").alias("nn"))
            .join(F.broadcast(q), "code")
            .filter(F.col("neighbor_id") != F.col("query_id")))
    sim = _dot(F.col("qv"), F.col("nv"), use_hof) / (F.col("qn")
                                                     * F.col("nn"))
    w = Window.partitionBy("query_id").orderBy(
        F.desc("sim"), F.asc("neighbor_id"))
    return (cand.withColumn("sim", sim)
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "neighbor_id",
                    F.col("rank").cast("long").alias("rank")))
