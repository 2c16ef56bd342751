"""Bucketed page-store layout: co-locate the fetch-simulate join.

The crawl's hottest join is frontier ⋈ pages on ``url`` (S6
fetch-simulate, plans/crawl.py:_batch_resources) — at 10^10 rows the
page store is the giant side, and re-shuffling it every micro-batch is
the dominant cost. Hash-BUCKETING the page store by url once at write
time removes that: Spark's bucketed scan exposes the
HashPartitioning(url) output partitioning, so only the (small,
politeness-capped) batch side shuffles and the page side is read in
place — batch after batch, crawl after crawl.

This is the parquet/catalog analog of the Iceberg north-star layout
(``bucket(N, url)`` partition transform). Bucketed tables must go
through the session catalog (``bucketBy`` requires ``saveAsTable``);
plain-path parquet cannot carry bucket metadata.

Usage:
    write_bucketed_pages(pages_df, "pages_bucketed", n_buckets=64)
    pages = read_bucketed_pages(spark, "pages_bucketed")
    # frontier.join(pages, "url") → no Exchange on the pages side
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed_pages(pages: DataFrame, table: str,
                         n_buckets: int = 64) -> None:
    """One-time layout job: hash-bucket + sort the page store by url.
    ``sortBy`` additionally enables a sort-merge read with no per-task
    sort on the bucketed side."""
    (pages.write.mode("overwrite")
     .bucketBy(n_buckets, "url").sortBy("url")
     .format("parquet")
     .saveAsTable(table))


def read_bucketed_pages(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)
