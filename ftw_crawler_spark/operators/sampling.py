"""Deterministic corpus sampling for training-data curation.

A 100-TB pipeline samples constantly — ablation subsets, per-source
quotas, held-out splits — and the samples must be REPRODUCIBLE
(re-running the job on the same snapshot yields the same rows,
independent of partitioning and task order). Both operators therefore
key on a content hash of a stable id, never on ``rand()``:

- ``hash_sample``: Bernoulli-style p-sampling via ``hash(key) mod 1e6
  < p·1e6`` — a codegen filter, no shuffle, trivially pushed down.
- ``stratified_sample``: exactly-n-per-stratum via a per-stratum
  ``row_number`` ordered by the hash (a deterministic shuffle of each
  stratum). One shuffle on the stratum key; for Zipf-head strata at
  extreme scale the same salted two-phase top-k used by the politeness
  scheduler (operators/politeness.py) applies — per-(stratum, salt)
  top-n, then per-stratum top-n over the survivors.

The md5-based hash keeps every sample decision byte-reproducible in
DuckDB/Python for the oracle gate (same trick as operators/dedup.py
``md5_long``); ``use_md5=False`` swaps in ``xxhash64`` for the cheap
production path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ftw_crawler_spark.operators.dedup import md5_long

PPM = 1_000_000


def _sample_hash(key: Column, salt: str, use_md5: bool) -> Column:
    if use_md5:
        return md5_long(F.concat(F.lit(f"{salt}:"), key.cast("string")))
    return F.xxhash64(key.cast("string"), F.lit(salt))


def hash_sample(df: DataFrame, key_col: str, rate_ppm: int,
                salt: str = "s", use_md5: bool = True) -> DataFrame:
    """Keep rows whose keyed hash lands below ``rate_ppm``/1e6 — a
    deterministic ~(rate_ppm/1e6) sample, stable across reruns and
    partitionings."""
    h = _sample_hash(F.col(key_col), salt, use_md5)
    return df.filter(F.pmod(h, F.lit(PPM)) < F.lit(rate_ppm))


def stratified_sample(df: DataFrame, strata_col: str, key_col: str,
                      n_per_stratum: int, salt: str = "t",
                      use_md5: bool = True) -> DataFrame:
    """Exactly min(n, |stratum|) rows per stratum, chosen by hash order
    (deterministic per-stratum shuffle), hash then key as tie-break."""
    if use_md5:
        order_key: Column = F.md5(
            F.concat(F.lit(f"{salt}:"), F.col(key_col).cast("string")))
    else:
        order_key = _sample_hash(F.col(key_col), salt, False)
    w = Window.partitionBy(strata_col).orderBy(order_key,
                                              F.col(key_col))
    return (df.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= n_per_stratum)
            .drop("__rn"))
