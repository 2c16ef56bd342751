"""CDX(J) index source: Common Crawl's per-capture URL index → the
engine's frontier/ingest-planning relations.

Common Crawl publishes, next to the WARC archives (sources/warc.py), a
CDXJ index: one line per capture —

    <SURT urlkey> <14-digit timestamp> <JSON blob>

where the JSON carries ``url``, ``mime``, ``status``, ``digest``,
``length``, ``offset``, ``filename`` (all values strings, numbers
included). Bulk-ingesting a CC snapshot starts HERE, not at the WARCs:
the index says which URLs exist, which capture is the latest, and at
which (file, offset, length) its record lives — so the fetch plan is a
pure DataFrame computation and only the selected byte ranges are ever
read.

Everything in this module is native Column algebra (``spark.read.text``
→ one regexp split → ``from_json`` → casts): zero Python in the parse,
so a 300-GB index shard-scan is a codegen-only stage. Malformed lines
(the regexp or the JSON fails) surface as NULL url and are filterable,
never job-fatal — the same per-row error isolation as the sitemap and
WARC readers.

``surt_key_col`` reproduces the urlkey's SURT form (scheme dropped,
host labels reversed and comma-joined, ``)/`` separator, lowercased)
for joining a url-keyed relation against the index; the documented
subset skips CC's extra canonicalization (www-stripping, query-param
sorting) which callers get from functions/urls.canonical_url_col.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

CDX_LINE_RE = r"^(\S+) (\S+) (.*)$"

CDX_JSON_SCHEMA = T.StructType([
    T.StructField("url", T.StringType()),
    T.StructField("mime", T.StringType()),
    T.StructField("status", T.StringType()),
    T.StructField("digest", T.StringType()),
    T.StructField("length", T.StringType()),
    T.StructField("offset", T.StringType()),
    T.StructField("filename", T.StringType()),
])


def parse_cdx_lines(lines: DataFrame,
                    line_col: str = "value") -> DataFrame:
    """(urlkey, ts, url, mime, status, digest, length, offset,
    warc_filename) from raw CDXJ lines — one codegen projection."""
    line = F.col(line_col)
    urlkey = F.regexp_extract(line, CDX_LINE_RE, 1)
    ts_str = F.regexp_extract(line, CDX_LINE_RE, 2)
    blob = F.regexp_extract(line, CDX_LINE_RE, 3)
    j = F.from_json(blob, CDX_JSON_SCHEMA)
    return lines.select(
        urlkey.alias("urlkey"),
        # try_: a malformed line must yield NULLs, not an ANSI error
        F.try_to_timestamp(ts_str, F.lit("yyyyMMddHHmmss")).alias("ts"),
        j.getField("url").alias("url"),
        j.getField("mime").alias("mime"),
        j.getField("status").cast("int").alias("status"),
        j.getField("digest").alias("digest"),
        j.getField("length").cast("long").alias("length"),
        j.getField("offset").cast("long").alias("offset"),
        j.getField("filename").alias("warc_filename"))


def read_cdx(spark: SparkSession, path: str) -> DataFrame:
    """CDXJ files (plain or .gz — Spark's text source gunzips) → the
    parsed capture relation. One task per split; codegen end-to-end."""
    return parse_cdx_lines(spark.read.text(path))


def surt_key_col(url: Column) -> Column:
    """SURT urlkey of a url: drop the scheme and userinfo, reverse the
    host labels and join with commas, keep the port after the reversed
    labels, append ``)`` + path-and-query, lowercase — e.g.
    ``http://u:p@sub.example.org:8080/A/b?Q=1`` →
    ``org,example,sub:8080)/a/b?q=1``, ``http://example.org?x=1`` →
    ``org,example)/?x=1``. Documented subset: no www-stripping / query
    param sorting (compose with urls.canonical_url_col for those)."""
    rest = F.regexp_replace(url, r"^[A-Za-z][A-Za-z0-9+.-]*://", "")
    # authority = up to the first '/' or '?'; path/query = the rest
    auth = F.regexp_extract(rest, r"^([^/?]*)", 1)
    path = F.lower(F.regexp_replace(rest, r"^[^/?]*", ""))
    hostport = F.lower(F.regexp_replace(auth, r"^[^@]*@", ""))
    host = F.regexp_extract(hostport, r"^([^:]*)", 1)
    port = F.regexp_extract(hostport, r"^[^:]*(:.*)?$", 1)
    rev = F.array_join(F.reverse(F.split(host, r"\.")), ",")
    # a path-less url gets the root '/'; a query-only one gets '/?...'
    norm_path = (F.when(path == "", F.lit("/"))
                 .when(path.startswith("?"), F.concat(F.lit("/"), path))
                 .otherwise(path))
    return F.concat(rev, port, F.lit(")"), norm_path)


def latest_captures(cdx: DataFrame,
                    statuses: tuple = (200,),
                    mimes: tuple = ("text/html",)) -> DataFrame:
    """The ingest plan: latest capture per url among the admissible
    statuses/mimes — (url, ts, warc_filename, offset, length), ties on
    the 1-second timestamp broken by (warc_filename, offset) so the
    plan is deterministic. ONE map-side-combined aggregate on url
    (struct max); downstream groups
    by warc_filename to read each archive's selected ranges in one
    task. The multi-capture history stays behind for recrawl-rate
    estimation (operators/incremental.recrawl_schedule)."""
    # ts must parse: a capture whose 14-digit timestamp failed
    # try_to_timestamp would otherwise emit a NULL-ts plan row (when
    # all of a url's captures are malformed) or silently lose the
    # struct max to any parseable capture regardless of recency —
    # malformed-ts rows are rejects, never fetch-plan rows
    adm = cdx.filter(F.col("status").isin(*statuses)
                     & F.col("mime").isin(*mimes)
                     & F.col("url").isNotNull()
                     & F.col("ts").isNotNull())
    pick = F.struct("ts", "warc_filename", "offset", "length")
    # max over the full struct, not max_by(ts): CDX timestamps have
    # 1-second resolution, so two captures of one url can share a ts —
    # the (warc_filename, offset) tiebreak keeps the plan a pure
    # function of the index contents (no task-order dependence)
    return (adm.groupBy("url")
            .agg(F.max(pick).alias("__c"))
            .select("url", F.col("__c.ts").alias("ts"),
                    F.col("__c.warc_filename").alias("warc_filename"),
                    F.col("__c.offset").alias("offset"),
                    F.col("__c.length").alias("length")))
