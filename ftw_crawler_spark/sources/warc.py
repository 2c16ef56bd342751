"""WARC (ISO 28500) source: Common-Crawl-style archive files → the
engine's page-store relation.

The reference crawler fetches live HTTP (fetcher.py:53); this engine
fetch-simulates from a page-store table (url, warc_ts, html, text) —
the shape Common Crawl publishes as WARC. This module turns WARC files
into that table so a real CC snapshot can feed the crawl/extraction
pipeline without a custom ETL step.

Format handled (the subset CC response archives use):
- records delimited by ``WARC/1.x`` version lines, headers terminated
  by CRLFCRLF, body of exactly ``Content-Length`` bytes, two CRLFs
  between records;
- ``WARC-Type: response`` records whose payload is an HTTP response
  (status line + headers + CRLFCRLF + body) — other record types
  (warcinfo, request, metadata) are skipped;
- whole-file gzip (.warc.gz as one stream) and per-record gzip members
  (Common Crawl's layout — concatenated gzip members are decoded by a
  single multi-member gunzip pass).

Scale shape: files are read with Spark's ``binaryFile`` source — one
task per WARC file, bytes never touch the driver; parsing runs in an
Arrow-batched ``mapInPandas``. Common Crawl ships ~1 GB files in
segments of ~100s, so per-file task granularity is the natural unit
(a splittable per-member reader only matters for pathological
single-file inputs). The emitted relation is the page-store schema, so
``write_bucketed_pages`` can land it straight into the bucketed layout
for the shuffle-free fetch join.
"""

from __future__ import annotations

import gzip
import io
import zlib
from datetime import datetime, timezone

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

WARC_SCHEMA = T.StructType([
    T.StructField("url", T.StringType()),
    T.StructField("warc_ts", T.TimestampType()),
    T.StructField("status", T.IntegerType()),
    T.StructField("content_type", T.StringType()),
    T.StructField("html", T.BinaryType()),
    T.StructField("warc_file", T.StringType()),
])


def _gunzip_members(data: bytes) -> bytes:
    """Decode a gzip stream that may be multiple concatenated members
    (Common Crawl gzips each record separately)."""
    out = []
    pos = 0
    while pos < len(data):
        d = zlib.decompressobj(wbits=zlib.MAX_WBITS | 16)
        out.append(d.decompress(data[pos:]))
        consumed = len(data) - pos - len(d.unused_data)
        if consumed <= 0:
            break
        pos += consumed
    return b"".join(out)


def _parse_headers(block: bytes, encoding: str = "latin-1") -> dict:
    """``encoding``: WARC named headers are UTF-8 (ISO 28500 §4);
    HTTP payload headers keep the latin-1 convention."""
    headers: dict = {}
    for line in block.split(b"\r\n"):
        if b":" in line:
            k, _, v = line.partition(b":")
            headers[k.strip().lower().decode("latin-1")] = \
                v.strip().decode(encoding, errors="replace")
    return headers


def _parse_http_payload(payload: bytes):
    """(status, content_type, body) from an HTTP response payload;
    None when the payload is not an HTTP response."""
    head, sep, body = payload.partition(b"\r\n\r\n")
    first, _, rest = head.partition(b"\r\n")
    parts = first.split(None, 2)
    if len(parts) < 2 or not parts[0].startswith(b"HTTP/"):
        return None
    try:
        status = int(parts[1])
    except ValueError:
        return None
    headers = _parse_headers(rest)
    ctype = headers.get("content-type")
    if ctype is not None:
        ctype = ctype.split(";")[0].strip()
    return status, ctype, body if sep else b""


def parse_warc_bytes(data: bytes, filename: str = "") -> list:
    """Pure-Python WARC parse (shared by the Spark UDF and tests):
    [(url, warc_ts, status, content_type, html)] for every
    ``WARC-Type: response`` record carrying an HTTP response.

    Malformed trailing bytes end the scan (a truncated tail costs its
    own records, never the file's parsed prefix)."""
    if data[:2] == b"\x1f\x8b":
        data = _gunzip_members(data)
    out = []
    pos = 0
    n = len(data)
    while pos < n:
        # skip inter-record CRLFs
        while pos < n and data[pos:pos + 2] == b"\r\n":
            pos += 2
        if pos >= n:
            break
        if not data[pos:pos + 5] == b"WARC/":
            break  # not a record boundary — stop at the malformed tail
        hdr_end = data.find(b"\r\n\r\n", pos)
        if hdr_end < 0:
            break
        headers = _parse_headers(data[pos:hdr_end], encoding="utf-8")
        try:
            length = int(headers.get("content-length", ""))
        except ValueError:
            break
        body_start = hdr_end + 4
        body = data[body_start:body_start + length]
        pos = body_start + length
        if len(body) < length:
            break  # truncated record
        if headers.get("warc-type") != "response":
            continue
        url = headers.get("warc-target-uri")
        if not url:
            continue
        ts = None
        raw_ts = headers.get("warc-date")
        if raw_ts:
            try:
                ts = datetime.fromisoformat(raw_ts.replace("Z", "+00:00"))
                ts = ts.astimezone(timezone.utc).replace(tzinfo=None)
            except ValueError:
                ts = None
        http = _parse_http_payload(body)
        if http is None:
            continue
        status, ctype, html = http
        out.append((url, ts, status, ctype, html))
    return out


def build_http_response(body: bytes, status: int = 200,
                        ctype: str = "text/html; charset=utf-8") -> bytes:
    """Serialize an HTTP response payload in the exact dialect
    ``_parse_http_payload`` reads back — the write half of the WARC
    round-trip (fixture synthesis, WARC re-export of a page store)."""
    head = (f"HTTP/1.1 {status} OK\r\nContent-Type: {ctype}\r\n"
            f"Content-Length: {len(body)}\r\n\r\n")
    return head.encode("latin-1") + body


def build_warc_record(rtype: str, uri: str | None, payload: bytes,
                      date: str = "2026-01-02T03:04:05Z") -> bytes:
    """One ISO 28500 record in the subset ``parse_warc_bytes`` handles:
    version line, named headers (UTF-8), CRLFCRLF, ``Content-Length``
    payload bytes, two CRLFs. ``uri=None`` omits WARC-Target-URI
    (warcinfo records)."""
    head = [b"WARC/1.0", b"WARC-Type: " + rtype.encode("utf-8"),
            b"WARC-Date: " + date.encode("utf-8"),
            b"Content-Length: " + str(len(payload)).encode()]
    if uri is not None:
        head.insert(2, b"WARC-Target-URI: " + uri.encode("utf-8"))
    return b"\r\n".join(head) + b"\r\n\r\n" + payload + b"\r\n\r\n"


def gzip_deterministic(data: bytes) -> bytes:
    """Whole-file gzip with mtime pinned to 0 and no FNAME header —
    byte-reproducible output (plain ``gzip.compress`` stamps the
    current time into the member header)."""
    buf = io.BytesIO()
    with gzip.GzipFile(filename="", mode="wb", fileobj=buf,
                       mtime=0) as gz:
        gz.write(data)
    return buf.getvalue()


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """WARC files at ``path`` (glob ok) → (url, warc_ts, status,
    content_type, html, warc_file). One task per file via binaryFile;
    record parsing executor-side in Arrow batches."""
    files = spark.read.format("binaryFile").load(path)

    def parse(batches):
        for pdf in batches:
            rows = []
            for fname, content in zip(pdf["path"], pdf["content"]):
                # per-FILE error isolation: a corrupt (not merely
                # truncated) gzip stream raises from zlib mid-member;
                # one undecodable archive costs its own records, never
                # the ingest job (same posture as the sitemaps parser's
                # _entries_or_none)
                try:
                    recs = parse_warc_bytes(bytes(content), fname)
                except Exception:
                    recs = []
                for (url, ts, status, ctype, html) in recs:
                    rows.append((url, ts, status, ctype, html, fname))
            yield pd.DataFrame(
                rows, columns=[f.name for f in WARC_SCHEMA.fields])

    return (files.select("path", "content")
            .mapInPandas(parse, schema=WARC_SCHEMA))


@F.pandas_udf(T.StringType())
def _html_to_text_udf(html: pd.Series, ctype: pd.Series) -> pd.Series:
    from ftw_crawler_spark.functions.html import html_to_text
    return pd.Series([
        html_to_text(bytes(h) if h is not None else None, c)
        for h, c in zip(html, ctype)])


def warc_to_pages(warc_df: DataFrame) -> DataFrame:
    """Adapt WARC records to the crawl page-store schema (url, warc_ts,
    html, text): successful responses only, with ``text`` derived as
    ``html_to_text(html)`` — the page store's contract (the extraction
    engine reads the ``text`` column as the Tika ``/tika`` analog
    output, synth.py:7-9, so it must be materialized here, not left
    NULL). Arrow-batched, executor-side.

    Repeated URLs (retries, revisits, cross-segment overlap — routine
    in real Common Crawl) are collapsed to ONE row per url, latest
    capture wins (ties broken by md5(html) — fully deterministic).
    The page store must be unique on url: duplicate rows would
    multiply the fetch-simulate inner join and emit same-UID docs with
    the same op_seq, breaking the sink's LWW determinism. The dedup is
    one shuffle on url with map-side combine, BEFORE the text UDF so
    the dropped captures never pay the DOM parse."""
    ok = warc_df.filter((F.col("status") == 200)
                        & F.col("url").isNotNull())
    ordkey = F.struct(
        F.coalesce(F.col("warc_ts"),
                   F.lit("1970-01-01 00:00:00").cast("timestamp"))
        .alias("ts"),
        F.md5(F.col("html")).alias("tb"))
    best = (ok.groupBy("url")
            .agg(F.max_by(F.struct("warc_ts", "html", "content_type"),
                          ordkey).alias("p"))
            .select("url", F.col("p.warc_ts").alias("warc_ts"),
                    F.col("p.html").alias("html"),
                    F.col("p.content_type").alias("content_type")))
    return best.select(
        "url", "warc_ts", "html",
        _html_to_text_udf(F.col("html"), F.col("content_type"))
        .alias("text"))
