"""Similarity search over embedding columns (array<float>).

Training-data-pipeline operators beyond the reference crawler: a
100 TB corpus needs embedding-level near-dup detection and ANN
retrieval. Two paths:

- ``cosine_topk``: brute-force exact top-k — the correctness baseline.
  The query side is tiny and **broadcast**; the corpus side streams.
  All math is built-in higher-order functions (``zip_with`` +
  ``aggregate`` — sequential fold, so the float summation order is
  deterministic and cross-engine reproducible); no Python in the plan.
- ``lsh_ann``: random-hyperplane (sign) LSH — the scale path. Plane
  sign matrices are derived deterministically from md5 so the whole
  pipeline (codes, buckets, re-rank) has an exact ANSI-SQL oracle.
  At 10^10 rows the bucket join replaces the O(N·Q) cross product
  with a shuffle on the code key; skewed buckets are handled by
  increasing ``n_planes`` (bucket size halves per plane).

Scale notes: brute-force is O(N·Q·d) but shuffle-free (broadcast
join); LSH is one shuffle on (code) + a narrow re-rank. For IVF-style
partitioning, cluster centroids would play the role of ``code`` —
same bucket-join shape.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

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


def _dot(a, b):
    """Sequential-fold dot product of two array<double> columns."""
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, x: acc + x)


def _as_double(col):
    return F.transform(col, lambda x: x.cast("double"))


def with_norm(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    v = _as_double(F.col(vec_col))
    return (df.withColumn("__v", v)
            .withColumn("__norm", F.sqrt(_dot(F.col("__v"), F.col("__v")))))


def cosine_topk(corpus: DataFrame, queries: DataFrame, k: int = 5,
                id_col: str = "vec_id",
                vec_col: str = "embedding") -> DataFrame:
    """Exact top-k cosine neighbors of each query over the corpus.

    queries is broadcast (small side); sim = dot/(|a|·|b|) with
    deterministic fold order; ties broken by neighbor id. Returns
    (query_id, neighbor_id, rank, sim_r4).
    """
    c = with_norm(corpus, vec_col).select(
        F.col(id_col).alias("neighbor_id"),
        F.col("__v").alias("nv"), F.col("__norm").alias("nn"))
    q = with_norm(queries, vec_col).select(
        F.col(id_col).alias("query_id"),
        F.col("__v").alias("qv"), F.col("__norm").alias("qn"))
    sim = _dot(F.col("qv"), F.col("nv")) / (F.col("qn") * F.col("nn"))
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


def lsh_ann(corpus: DataFrame, query_ids, k: int = 5,
            n_planes: int = DEFAULT_PLANES, id_col: str = "vec_id",
            vec_col: str = "embedding") -> DataFrame:
    """Approximate top-k: candidates share the query's LSH bucket,
    re-ranked by exact cosine. Returns (query_id, neighbor_id, rank).

    The bucket equi-join on ``code`` is the one shuffle; at corpus
    scale the query side (codes of the query set) is broadcast.
    """
    coded = lsh_codes(corpus, n_planes, id_col, vec_col)
    coded = coded.withColumn(
        "__norm", F.sqrt(_dot(F.col("__v"), F.col("__v"))))
    q = (coded.filter(F.col("vid").isin(list(query_ids)))
         .select(F.col("vid").alias("query_id"),
                 F.col("code"),
                 F.col("__v").alias("qv"), F.col("__norm").alias("qn")))
    cand = (coded.select(F.col("vid").alias("neighbor_id"), "code",
                         F.col("__v").alias("nv"),
                         F.col("__norm").alias("nn"))
            .join(F.broadcast(q), "code")
            .filter(F.col("neighbor_id") != F.col("query_id")))
    sim = _dot(F.col("qv"), F.col("nv")) / (F.col("qn") * F.col("nn"))
    w = Window.partitionBy("query_id").orderBy(
        F.desc("sim"), F.asc("neighbor_id"))
    return (cand.withColumn("sim", sim)
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "neighbor_id",
                    F.col("rank").cast("long").alias("rank")))
