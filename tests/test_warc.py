"""WARC source: record parsing, gzip layouts, page-store adapter."""

from __future__ import annotations

import gzip

from ftw_crawler_spark.sources.warc import (parse_warc_bytes, read_warc,
                                            warc_to_pages)


def _http(body: bytes, status: int = 200,
          ctype: bytes = b"text/html") -> bytes:
    return (b"HTTP/1.1 %d OK\r\nContent-Type: %s\r\n\r\n%s"
            % (status, ctype, body))


def _record(rtype: bytes, uri: bytes | None, payload: bytes,
            date: bytes = b"2026-01-02T03:04:05Z") -> bytes:
    head = [b"WARC/1.0", b"WARC-Type: " + rtype,
            b"WARC-Date: " + date,
            b"Content-Length: " + str(len(payload)).encode()]
    if uri is not None:
        head.insert(2, b"WARC-Target-URI: " + uri)
    return b"\r\n".join(head) + b"\r\n\r\n" + payload + b"\r\n\r\n"


HTML_A = b"<html><body>doc a</body></html>"
HTML_B = b"<html><body>doc b</body></html>"


def _sample_warc() -> bytes:
    return b"".join([
        _record(b"warcinfo", None, b"software: test\r\n"),
        _record(b"response", b"http://a.example.org/x", _http(HTML_A)),
        _record(b"request", b"http://a.example.org/x",
                b"GET /x HTTP/1.1\r\n\r\n"),
        _record(b"response", b"http://b.example.org/y",
                _http(HTML_B, status=404)),
    ])


def test_parse_warc_plain():
    rows = parse_warc_bytes(_sample_warc())
    assert [(r[0], r[2]) for r in rows] == [
        ("http://a.example.org/x", 200),
        ("http://b.example.org/y", 404)]
    url, ts, status, ctype, html = rows[0]
    assert html == HTML_A and ctype == "text/html"
    assert ts.isoformat() == "2026-01-02T03:04:05"


def test_parse_warc_gzip_layouts():
    # whole-file gzip
    assert len(parse_warc_bytes(gzip.compress(_sample_warc()))) == 2
    # per-record gzip members (the Common Crawl layout)
    members = b"".join(
        gzip.compress(_record(b"response", u, _http(h)))
        for u, h in ((b"http://a/1", HTML_A), (b"http://a/2", HTML_B)))
    rows = parse_warc_bytes(members)
    assert [r[0] for r in rows] == ["http://a/1", "http://a/2"]


def test_builders_roundtrip():
    """The write half (build_warc_record / build_http_response /
    gzip_deterministic) parses back exactly — the contract the
    warc_ingest_links registry fixture leans on."""
    from ftw_crawler_spark.sources.warc import (build_http_response,
                                                build_warc_record,
                                                gzip_deterministic)
    body = "<html><body>bär</body></html>".encode("utf-8")
    data = (build_warc_record("warcinfo", None, b"software: t\r\n")
            + build_warc_record("response", "http://u/é",
                                build_http_response(body, status=200),
                                date="2025-06-01T00:00:07Z")
            + build_warc_record("response", "http://u/e2",
                                build_http_response(b"gone", status=404)))
    for blob in (data, gzip_deterministic(data)):
        rows = parse_warc_bytes(blob)
        assert [(r[0], r[2]) for r in rows] == [
            ("http://u/é", 200), ("http://u/e2", 404)]
        assert rows[0][4] == body
        assert rows[0][1].isoformat() == "2025-06-01T00:00:07"
        assert rows[0][3] == "text/html"
    # byte-reproducible gzip (plain gzip.compress stamps wall time)
    assert gzip_deterministic(data) == gzip_deterministic(data)


def test_parse_warc_truncated_tail_keeps_prefix():
    data = _sample_warc() + b"WARC/1.0\r\nWARC-Type: response\r\n" \
        b"Content-Length: 99999\r\n\r\ntruncated"
    assert len(parse_warc_bytes(data)) == 2


def test_read_warc_and_pages_adapter(spark, tmp_path):
    p = tmp_path / "seg-00000.warc.gz"
    p.write_bytes(gzip.compress(_sample_warc()))
    df = read_warc(spark, str(tmp_path))
    rows = {r["url"]: r for r in df.collect()}
    assert set(rows) == {"http://a.example.org/x",
                         "http://b.example.org/y"}
    assert bytes(rows["http://a.example.org/x"]["html"]) == HTML_A
    assert rows["http://b.example.org/y"]["status"] == 404

    pages = warc_to_pages(df)
    got = pages.collect()
    assert [r["url"] for r in got] == ["http://a.example.org/x"]
    assert got[0]["warc_ts"] is not None
    assert set(pages.columns) == {"url", "warc_ts", "html", "text"}
    # text is materialized per the page-store contract
    from ftw_crawler_spark.functions.html import html_to_text
    assert got[0]["text"] == html_to_text(HTML_A, "text/html")


def test_warc_repeated_url_latest_capture_wins(spark, tmp_path):
    """Real CC archives revisit URLs (retries, cross-segment overlap);
    the page store must stay unique on url or the fetch join multiplies
    and same-op_seq docs break sink LWW determinism. Latest warc_ts
    wins; ties break on md5(html)."""
    recs = b"".join([
        _record(b"response", b"http://a/x", _http(HTML_A),
                date=b"2026-01-01T00:00:00Z"),
        _record(b"response", b"http://a/x", _http(HTML_B),
                date=b"2026-01-03T00:00:00Z"),
        _record(b"response", b"http://a/x", _http(HTML_A),
                date=b"2026-01-02T00:00:00Z"),
        _record(b"response", b"http://a/y", _http(HTML_A)),
    ])
    p = tmp_path / "dup.warc"
    p.write_bytes(recs)
    pages = warc_to_pages(read_warc(spark, str(tmp_path)))
    got = {r["url"]: r for r in pages.collect()}
    assert len(got) == 2
    assert bytes(got["http://a/x"]["html"]) == HTML_B
    assert got["http://a/x"]["warc_ts"].isoformat() == \
        "2026-01-03T00:00:00"


def test_warc_corrupt_gzip_isolated(spark, tmp_path):
    """One undecodable .warc.gz (corrupt mid-stream, not merely
    truncated) yields zero rows for THAT file; the rest of the ingest
    succeeds — same per-unit isolation posture as the sitemap parser."""
    good = tmp_path / "good.warc.gz"
    good.write_bytes(gzip.compress(_sample_warc()))
    bad = gzip.compress(_sample_warc())
    corrupt = bad[:20] + bytes(b ^ 0xFF for b in bad[20:40]) + bad[40:]
    (tmp_path / "bad.warc.gz").write_bytes(corrupt)
    df = read_warc(spark, str(tmp_path))
    rows = df.collect()
    assert {r["url"] for r in rows} == {"http://a.example.org/x",
                                       "http://b.example.org/y"}
    assert all(r["warc_file"].endswith("good.warc.gz") for r in rows)


def test_warc_world_roundtrip_crawl(spark, tiny_world, tmp_path):
    """A world whose page store is re-ingested from WARC archives
    yields the BYTE-IDENTICAL final index — the end-to-end proof the
    WARC path feeds the real pipeline, not a parallel one."""
    import shutil

    from ftw_crawler_spark.plans.crawl import run_crawl

    def index_of(result):
        return sorted(
            (r["UID"], r["path_string"], r["Title"],
             r["SearchableText"], str(r["modified"]))
            for r in result.index().collect())

    out1 = tmp_path / "out1"
    idx1 = index_of(run_crawl(spark, tiny_world, str(out1),
                              resume=False))

    # re-encode the page store as a per-record-gzip WARC archive
    pages = spark.read.parquet(f"{tiny_world}/pages.parquet").collect()
    recs = []
    for p in pages:
        payload = (b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"
                   + bytes(p["html"]))
        date = p["warc_ts"].strftime("%Y-%m-%dT%H:%M:%SZ").encode()
        recs.append(gzip.compress(_record(
            b"response", p["url"].encode(), payload, date=date)))
    warc_dir = tmp_path / "warc"
    warc_dir.mkdir()
    (warc_dir / "seg-00000.warc.gz").write_bytes(b"".join(recs))

    world2 = tmp_path / "world2"
    shutil.copytree(tiny_world, world2)
    shutil.rmtree(world2 / "pages.parquet")
    warc_to_pages(read_warc(spark, str(warc_dir))) \
        .write.parquet(str(world2 / "pages.parquet"))

    out2 = tmp_path / "out2"
    idx2 = index_of(run_crawl(spark, str(world2), str(out2),
                              resume=False))
    assert idx1 == idx2 and len(idx1) > 0
