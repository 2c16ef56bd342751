"""Extraction engine over DataFrames: ported document-building
assertions (reference tests/test_extractors.py:81-229 engine semantics +
extractor goldens), evaluated through the real Spark path (native
columns + the single pandas UDF)."""

from __future__ import annotations

import base64
from datetime import datetime

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ftw_crawler_spark import config as cfg
from ftw_crawler_spark.operators.extraction import (
    document_schema, extract_documents, md5_uuid_col)

CRAWL_TIME = datetime(2026, 1, 15, 12, 0, 0)

HTML5_DOC = """<!DOCTYPE html>
<html>
  <head>
    <title>HTML 5 Example</title>
    <meta charset="utf-8"/>
    <meta name="description" content="A fine example"/>
    <meta name="keywords" content="Foo, Bar, Baz"/>
    <meta name="author" content="Hans Muster"/>
  </head>
 <body>
 \t<div id="content">
 \t\t<h1><span>Der</span> B\xe4rengraben</h1>

 \t\t<p>Foo</p>
 \t\t<p>Bar</p>
 \t</div>
 </body>
</html>""".encode("utf-8")

RESOURCE_SCHEMA = T.StructType([
    T.StructField("loc", T.StringType()),
    T.StructField("lastmod", T.StringType()),
    T.StructField("target", T.StringType()),
    T.StructField("html", T.BinaryType()),
    T.StructField("text", T.StringType()),
    T.StructField("content_type", T.StringType()),
    T.StructField("headers", T.MapType(T.StringType(), T.StringType())),
    T.StructField("site_attributes",
                  T.MapType(T.StringType(), T.StringType())),
])


def _resources(spark, rows):
    return spark.createDataFrame(rows, RESOURCE_SCHEMA)


@pytest.fixture(scope="module")
def extracted(spark):
    from ftw_crawler_spark.functions.html import html_to_text
    text = html_to_text(HTML5_DOC, "text/html")
    rows = [
        # full-featured page
        ("http://example.org/foo", "2014-12-31", None, HTML5_DOC, text,
         "text/html", {"content-type": "text/html; charset=utf-8"},
         {"site_area": "Sportamt Bern"}),
        # target + no markup title sources → header title
        ("http://example.org/bar", None,
         "http://example.org/target-bar", None, "Plain body text",
         "application/pdf",
         {"content-type": "application/pdf",
          "x-document-title":
              base64.b64encode("B\xe4ren PDF".encode()).decode(),
          "last-modified": "2015-02-03T10:00:00Z",
          "content-disposition": 'attachment; filename="doc.pdf"'},
         {}),
        # no metadata at all → slug title, defaults
        ("http://example.org/stuff/", None, None, None, "",
         "text/html", {"content-type": "text/html"}, {}),
    ]
    config = cfg.default_config()
    df = extract_documents(_resources(spark, rows), config, CRAWL_TIME)
    out = {r["path_string"]: r.asDict() for r in df.collect()}
    return out


def test_uid_golden_and_native_md5(extracted, spark):
    # native md5-uuid column matches the python golden
    assert extracted["http://example.org/foo"]["UID"] == \
        __import__("ftw_crawler_spark.functions.scalars",
                   fromlist=["uid_for_url"]).uid_for_url(
                       "http://example.org/foo")
    golden = spark.range(1).select(
        md5_uuid_col(F.lit("http://example.org")).alias("u")).first()["u"]
    assert golden == "dab521de-65f9-250b-4cca-7383feef67dc"


def test_title_cascade_h1(extracted):
    # div#content h1 wins over <title> metadata (extractors.py:205-213)
    assert extracted["http://example.org/foo"]["Title"] == \
        "Der B\xe4rengraben"


def test_title_cascade_header(extracted):
    # X-Document-Title header takes precedence (extractors.py:199-202)
    assert extracted["http://example.org/bar"]["Title"] == "B\xe4ren PDF"


def test_title_cascade_slug_fallback(extracted):
    assert extracted["http://example.org/stuff/"]["Title"] == "stuff"


def test_description_creator_keywords(extracted):
    doc = extracted["http://example.org/foo"]
    assert doc["Description"] == "A fine example"
    assert doc["Creator"] == "Hans Muster"
    assert doc["Subject"] == ["Foo", "Bar", "Baz"]
    assert doc["topics"] == ["Foo", "Bar", "Baz"]


def test_optional_missing_is_null(extracted):
    doc = extracted["http://example.org/stuff/"]
    assert doc["Description"] is None
    assert doc["Creator"] is None
    assert doc["Subject"] is None


def test_searchable_text_and_snippet(extracted):
    doc = extracted["http://example.org/foo"]
    # SearchableText = normalize_whitespace(html_to_text(html))
    assert doc["SearchableText"] == \
        "HTML 5 Example Der B\xe4rengraben Foo Bar"
    # text does NOT start with the (h1-derived) title here, so the
    # snippet is the full plain text (extractors.py:325: startswith guard)
    assert doc["snippetText"] == doc["SearchableText"]
    # but when the text DOES start with the title, lstrip quirk applies —
    # covered in test_scalars.test_snippet_characterset_strip_quirk


def test_dates(extracted):
    doc = extracted["http://example.org/foo"]
    assert doc["modified"] == datetime(2014, 12, 31)     # sitemap lastmod
    assert doc["created"] == datetime(2014, 12, 31)
    assert doc["effective"] == CRAWL_TIME                # indexing time
    assert doc["expires"] == datetime(2050, 12, 31)
    pdf = extracted["http://example.org/bar"]
    assert pdf["modified"] == datetime(2015, 2, 3, 10)   # header fallback
    blank = extracted["http://example.org/stuff/"]
    assert blank["modified"] == CRAWL_TIME               # indexing-time fallback


def test_mappings(extracted):
    doc = extracted["http://example.org/foo"]
    assert doc["portal_type"] == "ContentPage"   # text/html mapping
    assert doc["object_type"] == "CONTENT_PAGE"  # field mapping
    pdf = extracted["http://example.org/bar"]
    assert pdf["portal_type"] == "File"
    assert pdf["object_type"] == "FILE"


def test_constants_and_site_attrs(extracted):
    doc = extracted["http://example.org/foo"]
    assert doc["allowedRolesAndUsers"] == ["Anonymous"]
    assert doc["showinsearch"] is True
    assert doc["site_area"] == ["Sportamt Bern"]
    assert extracted["http://example.org/stuff/"]["site_area"] is None


def test_target_url(extracted):
    assert extracted["http://example.org/bar"]["getRemoteUrl"] == \
        "http://example.org/target-bar"
    assert extracted["http://example.org/foo"]["getRemoteUrl"] == \
        "http://example.org/foo"


def test_slug_getid(extracted):
    assert extracted["http://example.org/stuff/"]["getId"] == "stuff"


def test_schema_matches_declaration(extracted, spark):
    config = cfg.default_config()
    schema = document_schema(config)
    assert [f.name for f in schema.fields] == [f.name for f in config.fields]


def _dom_sig(node):
    """Deep DOM serialization with adjacent data strings coalesced
    (handler-call granularity may legitimately differ between the fast
    tokenizer and HTMLParser; only the concatenation is contractual)."""
    from ftw_crawler_spark.functions.html import Node
    out = [("open", node.tag, tuple(sorted(node.attrs.items())))]
    buf = []
    for c in node.children:
        if isinstance(c, Node):
            if buf:
                out.append(("data", "".join(buf)))
                buf = []
            out.extend(_dom_sig(c))
        else:
            buf.append(c)
    if buf:
        out.append(("data", "".join(buf)))
    out.append(("close", node.tag))
    return out


def test_fast_parser_matches_stdlib():
    """The whole-string fast tokenizer must be call-identical to
    HTMLParser(convert_charrefs=True) wherever it runs, and bail (never
    diverge) elsewhere. Crafted edge docs + seeded random tag soup;
    the full 300k-page corpus sweep was run once at build time."""
    import random

    from ftw_crawler_spark.functions import html as H

    def stdlib(s):
        b = H._TreeBuilder()
        b.feed(s)
        b.close()
        return b.root

    def compare(s):
        ref = _dom_sig(stdlib(s))
        b = H._TreeBuilder()
        try:
            H._fast_feed(s, b)
        except H._Bail:
            return False
        assert _dom_sig(b.root) == ref, s[:200]
        return True

    crafted = [
        "<html><head><title>T&amp;T</title><meta name=a content='x&gt;'>"
        "</head><body><h1 class=big>H</h1><p>a<b>c</p></body></html>",
        "<script>if (a<b && c>d) { '</div>' }</script>after",
        # cdata closes: '</tag' without its '>' is DATA (the stdlib
        # pattern is '</\\s*tag\\s*>'); a junk close must not swallow
        # the genuine one
        "<style>a</style b </style><a href='http://x/'>L</a></style>",
        "<script>x </script y </script> alert(1) </script>",
        "<script>\"</scriptish>\"</script>done",
        "<STYLE>a>b{}</STyLE><p>x",
        "<!doctype html><!-- c --><?pi?><div/>text</div>",
        "plain & text < 5 > 3 &#65;&#xE9;&notanentity;",
        "<p a=1 b='2' c=\"3\" d>x</ p><img src=x/><br/>",
        "<t:ns attr='v'>x</t:ns>",
        "a<",  # trailing lone '<'
        "</>x</ >y<!bogus>z",
        "<td>x</td></tr>",  # endtags with no open match
    ]
    ok = sum(compare(s) for s in crafted)
    assert ok >= 8  # nearly all crafted docs take the fast path

    random.seed(11)
    pieces = ["<p>", "</p>", "<div class='a'>", "</div>", "text", "&amp;",
              "&#65;", "&", "<", "< no", "<!-- c -->", "<!doctype html>",
              "<br/>", "<script>'<div>'</script>", "</>", "<p a>", "é",
              "<title>T&T</title>", "<b", "&gt", "<p/>x</p >"]
    fast = 0
    for _ in range(400):
        s = "".join(random.choice(pieces)
                    for _ in range(random.randint(1, 25)))
        fast += compare(s)
    assert fast > 100  # bail is allowed, divergence never
