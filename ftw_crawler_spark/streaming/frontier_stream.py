"""Structured-Streaming incremental crawl: frontier deltas → index.

The batch planner (plans/crawl.py) drives bounded crawls; this module
is the unbounded variant the north star sketches ("each crawl
iteration is a Structured-Streaming-style micro-batch"): new frontier
entries arrive as parquet files in a watched directory
(``readStream``), and each micro-batch runs the same
seen-filter → fetch-simulate → extract → upsert pipeline via
``foreachBatch``.

Exactly-once story: Spark's streaming checkpoint (offset log) pins
which input files belong to batch N; the sink append for batch N is an
overwrite of ``delta/stream_N`` + upsert-by-UID on read — so a batch
replayed after a crash converges to the same index (idempotent), the
same argument as the batch planner's checkpoint commit (SURVEY.md
§4.4).

Scale notes: the per-batch bloom build is over the CURRENT index
urls — on a long-running stream you'd maintain the filter
incrementally (merge_blooms of the batch's own urls into the broadcast
state) instead of rebuilding; ``rebuild_bloom_every`` models that: the
filter is rebuilt every K batches and OR-merged with per-batch deltas
in between. Page-store join and extraction are the same
column-pruned / Arrow-vectorized paths as the batch planner.
"""

from __future__ import annotations

import os
from datetime import datetime

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ftw_crawler_spark import config as cfg
from ftw_crawler_spark.operators import seen
from ftw_crawler_spark.operators.extraction import extract_documents
from ftw_crawler_spark.operators.indexsink import IndexSink
from ftw_crawler_spark.sources.synth import default_sites

FRONTIER_DELTA_SCHEMA = T.StructType([
    T.StructField("site_id", T.IntegerType()),
    T.StructField("loc", T.StringType()),
    T.StructField("lastmod", T.StringType()),
    T.StructField("changefreq", T.StringType()),
    T.StructField("priority", T.StringType()),
    T.StructField("target", T.StringType()),
    T.StructField("crawl_seq", T.LongType()),
])


class FrontierStream:
    """Owns the running query + the incrementally-merged seen filter."""

    def __init__(self, spark: SparkSession, world_dir: str, out_dir: str,
                 config: cfg.CrawlerConfig | None = None,
                 sites: list | None = None,
                 crawl_time: datetime | None = None,
                 rebuild_bloom_every: int = 8,
                 compact_every: int = 16):
        self.spark = spark
        self.config = config or cfg.default_config()
        self.sites = sites if sites is not None else default_sites()
        self.crawl_time = crawl_time or datetime(2026, 1, 15, 12, 0, 0)
        self.sink = IndexSink(spark, os.path.join(out_dir, "index"))
        self.ckpt = os.path.join(out_dir, "stream_checkpoint")
        self.pages = spark.read.parquet(f"{world_dir}/pages.parquet")
        self.rebuild_bloom_every = rebuild_bloom_every
        self.compact_every = compact_every
        self._filter: seen.IncrementalUrlFilter | None = None
        self._batches_since_rebuild = 0
        self.query = None

    # -- per-batch pipeline --------------------------------------------------

    def _seen_filter(self, batch: DataFrame) -> DataFrame:
        """bloom prune + exact anti-join backstop against current index."""
        cur = self.sink.current()
        if cur is None:
            return batch
        if (self._filter is None
                or self._batches_since_rebuild >= self.rebuild_bloom_every):
            # periodic full rebuild re-sizes the geometry to the grown
            # index and resets delta saturation; between rebuilds the
            # filter grows by O(batch) adds (IncrementalUrlFilter owns
            # build/merge/serving-form — same helper as the batch
            # planner's link-discovery enqueued set)
            self._filter = seen.IncrementalUrlFilter(
                cur.select("url"), "url")
            self._batches_since_rebuild = 0
        new, cand = self._filter.split(batch, "loc")
        verified = cand.join(
            cur.select(F.col("url").alias("loc")).distinct(),
            "loc", "left_anti")
        return new.unionByName(verified)

    def _resources(self, fresh: DataFrame) -> DataFrame:
        pages = self.pages.select(
            F.col("url").alias("loc"), F.col("warc_ts").alias("__wts"),
            "html", "text")
        df = fresh.join(pages, "loc", "inner")
        headers = F.create_map(
            F.lit("content-type"), F.lit("text/html; charset=utf-8"),
            F.lit("last-modified"),
            F.date_format("__wts", "yyyy-MM-dd'T'HH:mm:ss'Z'"))
        attrs = {s.site_id: s.attributes or {} for s in self.sites}
        csid = {s.site_id: s.crawler_site_id for s in self.sites}
        attr_map = F.create_map(*[
            x for sid, a in attrs.items()
            for x in (F.lit(sid),
                      F.create_map(*[F.lit(v) for kv in a.items()
                                     for v in kv]))]) \
            if any(attrs.values()) else F.lit(None).cast(
                "map<int,map<string,string>>")
        csid_map = F.create_map(*[
            x for sid, c in csid.items() if c
            for x in (F.lit(sid), F.lit(c))]) \
            if any(csid.values()) else F.lit(None).cast("map<int,string>")
        return (df.withColumn("headers", headers)
                .withColumn("content_type",
                            F.split(F.col("headers")["content-type"],
                                    ";").getItem(0))
                .withColumn("site_attributes",
                            attr_map.getItem(F.col("site_id")))
                .withColumn("__csid", csid_map.getItem(F.col("site_id"))))

    def _process_batch(self, batch: DataFrame, batch_id: int) -> None:
        # MOR maintenance FIRST, before any of this batch's plans
        # reference the sink's delta files (the seen filter's anti-join
        # reads sink.current(); folding mid-batch would delete files a
        # later action still re-reads). Without it the delta log grows
        # one generation per micro-batch forever and the read-side LWW
        # window with it. Replay-safe: a replayed batch re-appends the
        # same rows post-fold and upsert-by-UID resolves them to the
        # identical document (the same argument as the batch planner's
        # mid-run compaction). Folded rows' op_seq collapses to the
        # base sentinel (-2) — the sink's documented base-ification,
        # identical to the batch planner's mid-run compaction; op_seq
        # lineage is a property of not-yet-folded rows only.
        if self.sink.should_compact(self.compact_every):
            self.sink.compact()
        fresh = self._seen_filter(batch)
        resources = self._resources(fresh)
        # spread the CPU-dense extraction across the cluster (see
        # plans/crawl.py — byte-based AQE coalescing under-partitions it)
        resources = resources.repartition(
            self.spark.sparkContext.defaultParallelism)
        docs = extract_documents(
            resources, self.config, self.crawl_time,
            passthrough=("crawl_seq", "site_id", "__csid"))
        docs = (docs.withColumn("crawler_site_id", F.col("__csid"))
                .drop("__csid")
                .withColumn("op_seq", F.col("crawl_seq"))
                .withColumn("batch_id", F.lit(batch_id))
                .withColumn("url", F.col(self.config.url_field)))
        if self.config.unique_field != "UID":
            docs = docs.withColumn("UID", F.col(self.config.unique_field))
        self.sink.append_upserts(docs, batch_id=f"stream_{batch_id:09d}")
        # fold this batch's urls into the incremental filter instead of
        # a full rebuild (the long-running-stream path): the delta is
        # built with the filter's pinned geometry so the merge is exact
        if self._filter is not None:
            self._filter.add(docs.select("url"), "url")
            self._batches_since_rebuild += 1

    # -- lifecycle -----------------------------------------------------------

    def start(self, delta_dir: str, available_now: bool = True):
        stream = (self.spark.readStream
                  .schema(FRONTIER_DELTA_SCHEMA)
                  .parquet(delta_dir))
        writer = (stream.writeStream
                  .foreachBatch(self._process_batch)
                  .option("checkpointLocation", self.ckpt))
        if available_now:
            writer = writer.trigger(availableNow=True)
        self.query = writer.start()
        return self.query

    def run_available(self, delta_dir: str, timeout: int = 300) -> None:
        """Process everything currently in delta_dir, then stop."""
        q = self.start(delta_dir, available_now=True)
        q.awaitTermination(timeout)
        if q.isActive:
            q.stop()

    def index(self) -> DataFrame:
        return self.sink.current()
