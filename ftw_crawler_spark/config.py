"""Declarative crawl configuration: sites, fields, extractors.

Mirrors the reference's config surface (ftw/crawler/configuration.py:31-101:
``Config`` holds ordered ``Field``s, each binding an ``Extractor``; Sites
carry politeness + attributes) but each extractor here is a *vectorized*
specification with two possible evaluation paths:

- ``column_expr(ctx)``  → a pyspark Column — the JVM/codegen fast path
  (UID via md5 SQL, coalesce chains, constants, mappings);
- ``eval_batch(batch)`` → a pandas Series over an Arrow batch — the
  Python path for semantics Spark expressions can't produce
  byte-identically (title cascade with HTML parse, slugify,
  snippet lstrip quirk, dateutil-lenient ISO parse).

The engine (operators/extraction.py) runs ALL Python-path fields of a
config in ONE pandas UDF per batch (one HTML parse per row, shared by
every extractor that needs the DOM) and everything else as native
columns — never per-row Python in the hot path.
"""

from __future__ import annotations

from dataclasses import dataclass, field as dc_field
from datetime import datetime

from ftw_crawler_spark.functions import scalars
from ftw_crawler_spark.functions import html as htmlmod

# ---------------------------------------------------------------------------
# sites
# ---------------------------------------------------------------------------


@dataclass
class Site:
    """Seed/crawl-unit config (reference: configuration.py:65-79)."""

    site_id: int
    url: str
    sleeptime: float = 0.1          # politeness delay, configuration.py:67
    crawler_site_id: str | None = None
    attributes: dict = dc_field(default_factory=dict)
    sitemap_urls: list | None = None   # static sitemaps, sitemap.py:32-34


# ---------------------------------------------------------------------------
# extractors — vectorized spec objects
# ---------------------------------------------------------------------------


class Extractor:
    """Base: subclasses implement ``eval_row(ctx_row) -> value | NO_VALUE``
    (the engine vectorizes over the batch) or are special-cased to native
    Columns by the engine. ``NO_VALUE`` models the reference's
    NoValueExtracted (extractors.py:134-140)."""

    def eval_row(self, row):  # pragma: no cover - abstract
        raise NotImplementedError


NO_VALUE = object()


class _RowCtx:
    """Per-row resource view handed to extractors: the ResourceInfo analog
    (reference: ftw/crawler/resource.py:1-13) materialized from DataFrame
    columns. ``headers`` keys are lower-cased (CaseInsensitiveDict analog,
    fetcher.py:79). ``metadata``/``plain_text``/``dom`` are computed once
    per row and shared by all extractors."""

    __slots__ = ("loc", "lastmod", "target", "html", "text", "content_type",
                 "headers", "attributes", "crawl_time", "_metadata", "dom",
                 "_title")

    def __init__(self, loc, lastmod, target, html, text, content_type,
                 headers, attributes, crawl_time):
        self.loc = loc
        self.lastmod = lastmod
        self.target = target
        self.html = html
        self.text = text if text is not None else ""
        self.content_type = content_type
        self.headers = {k.lower(): v for k, v in (headers or {}).items()}
        self.attributes = attributes or {}
        self.crawl_time = crawl_time
        self.dom = None
        self._title = None
        self._metadata = None

    @property
    def metadata(self):
        # lazy + shares get_dom()'s single parse with the title/xpath
        # extractors (the DOM parse dominates per-row extraction cost)
        if self._metadata is None:
            raw = htmlmod.extract_metadata(self.html, self.content_type,
                                           root=self.get_dom())
            self._metadata = scalars.canonicalize_metadata(raw)
        return self._metadata

    def get_dom(self):
        if self.dom is None and self.html is not None \
                and self.content_type in htmlmod.MARKUP_TYPES:
            self.dom = htmlmod.parse_html(self.html)
        return self.dom


class PlainTextExtractor(Extractor):
    """normalize_whitespace(text) — extractors.py:146-149."""

    def eval_row(self, row):
        return scalars.normalize_whitespace(row.text)


class UIDExtractor(Extractor):
    """md5-as-UUID of loc — extractors.py:152-158. Engine compiles this to
    native SQL (md5 + substrings) when possible."""

    def eval_row(self, row):
        return scalars.uid_for_url(row.loc)


class SlugExtractor(Extractor):
    """extractors.py:161-177."""

    def eval_row(self, row):
        return scalars.slug_for_url(row.loc)


class URLExtractor(Extractor):
    """extractors.py:180-184."""

    def eval_row(self, row):
        return row.loc


class TargetURLExtractor(Extractor):
    """target if present else loc — extractors.py:187-193."""

    def eval_row(self, row):
        return row.target if row.target is not None else row.loc


class XPathExtractor(Extractor):
    """First xpath match's text_content over the sniffed-encoding DOM;
    markup content types only — extractors.py:231-285."""

    def __init__(self, xpath):
        self.xpath = xpath

    def eval_row(self, row):
        if row.content_type not in htmlmod.MARKUP_TYPES:
            return NO_VALUE
        dom = row.get_dom()
        if dom is None:
            return NO_VALUE
        node = htmlmod.xpath_first(dom, self.xpath)
        if node is None:
            return NO_VALUE
        return node.text_content()


class TitleExtractor(Extractor):
    """Cascade: X-Document-Title header (base64) → //div[@id='content']/h1
    → metadata title → content-disposition filename → slug; then
    normalize_whitespace — extractors.py:196-228."""

    _H1 = XPathExtractor("//div[@id='content']/h1")

    def eval_row(self, row):
        # cached on the row: the snippet extractor re-derives the title
        # (extractors.py:306-327), which would re-run the whole cascade
        # (header decode + xpath + metadata) per row
        if row._title is None:
            row._title = scalars.normalize_whitespace(
                self._raw_title(row))
        return row._title

    def _raw_title(self, row):
        if "x-document-title" in row.headers:
            return scalars.decode_document_title_header(
                row.headers["x-document-title"])
        h1 = self._H1.eval_row(row)
        if h1 is not NO_VALUE:
            return h1
        value = row.metadata.get("title")
        if value is None:
            value = FilenameExtractor().eval_row(row)
            if value is NO_VALUE:
                value = scalars.slug_for_url(row.loc)
        return value


class DescriptionExtractor(Extractor):
    """metadata description or no value — extractors.py:288-294."""

    def eval_row(self, row):
        value = row.metadata.get("description")
        return NO_VALUE if value is None else value


class CreatorExtractor(Extractor):
    """metadata creator or no value — extractors.py:297-303."""

    def eval_row(self, row):
        value = row.metadata.get("creator")
        return NO_VALUE if value is None else value


class SnippetTextExtractor(Extractor):
    """plain text minus title with the lstrip quirk — extractors.py:306-327."""

    def eval_row(self, row):
        plain = scalars.normalize_whitespace(row.text)
        title = TitleExtractor().eval_row(row)
        return scalars.snippet_text(plain, title)


class LastModifiedExtractor(Extractor):
    """coalesce(urlinfo lastmod → UTC, header last-modified, crawl time)
    — extractors.py:330-344. Crawl time is the injected per-run literal
    (wall-clock in the reference; injected for determinism, SURVEY §2.4
    E15 note)."""

    def eval_row(self, row):
        if row.lastmod is not None:
            return scalars.from_iso_datetime(row.lastmod)
        if "last-modified" in row.headers:
            # HTTP header → RFC 2616 parse (extractors.py:339 uses
            # from_http_datetime; both accept ISO, so the synthetic
            # world's ISO headers and real WARC RFC 1123 headers parse)
            return scalars.from_http_datetime(row.headers["last-modified"])
        return row.crawl_time


class FilenameExtractor(Extractor):
    """content-disposition filename — extractors.py:347-360."""

    def eval_row(self, row):
        if "content-disposition" in row.headers:
            fn = scalars.filename_from_content_disposition(
                row.headers["content-disposition"])
            if fn is not None:
                return fn
        return NO_VALUE


class KeywordsExtractor(Extractor):
    """metadata keywords split — extractors.py:363-373."""

    def eval_row(self, row):
        value = row.metadata.get("keywords")
        if value is None:
            return NO_VALUE
        return scalars.split_keywords(value)


class ConstantExtractor(Extractor):
    """extractors.py:376-390."""

    def __init__(self, value):
        self.value = value

    def eval_row(self, row):
        return self.value


class IndexingTimeExtractor(Extractor):
    """datetime.utcnow() in the reference (extractors.py:393-396); here the
    injected crawl_time literal for determinism/resumability."""

    def eval_row(self, row):
        return row.crawl_time


class SiteAttributeExtractor(Extractor):
    """site.attributes[key] or no value — extractors.py:399-413."""

    def __init__(self, key):
        self.key = key

    def eval_row(self, row):
        value = row.attributes.get(self.key)
        return NO_VALUE if value is None else value


class HeaderMappingExtractor(Extractor):
    """header value → mapping | default | no value; content-type is
    charset-stripped first — extractors.py:416-442."""

    def __init__(self, header_name, mapping, default=None):
        self.header_name = header_name
        self.mapping = mapping
        self.default = default

    def eval_row(self, row):
        header_value = row.headers.get(self.header_name.lower())
        if header_value is None:
            return self._default()
        if self.header_name.lower() == "content-type":
            header_value = scalars.get_content_type(header_value)
        if header_value in self.mapping:
            return self.mapping[header_value]
        return self._default()

    def _default(self):
        return self.default if self.default is not None else NO_VALUE


class FieldMappingExtractor(Extractor):
    """another field's value → mapping | default | no value —
    extractors.py:445-469. The engine resolves the source field by name
    and evaluates it first (topological order)."""

    def __init__(self, field_name, mapping, default=None):
        self.field_name = field_name
        self.mapping = mapping
        self.default = default
        self._source = None  # bound by the engine

    def eval_row(self, row):
        value = self._source.eval_row(row)
        if value is NO_VALUE or value is None:
            return self._default()
        if value in self.mapping:
            return self.mapping[value]
        return self._default()

    def _default(self):
        return self.default if self.default is not None else NO_VALUE


# ---------------------------------------------------------------------------
# fields + config
# ---------------------------------------------------------------------------


@dataclass
class Field:
    """Output-schema field (reference: configuration.py:82-101). ``type_``
    ∈ {str, datetime, bool}; ``multivalued`` wraps it in an array."""

    name: str
    extractor: Extractor
    type_: type = str
    required: bool = False
    multivalued: bool = False

    def default_value(self):
        """Required-but-missing default: epoch for datetimes, else the
        type's zero value — extractors.py:115-122."""
        if issubclass(self.type_, datetime):
            return scalars.EPOCH
        return self.type_()


@dataclass
class CrawlerConfig:
    """The reference ``Config`` analog (configuration.py:31-62)."""

    sites: list
    fields: list
    unique_field: str = "UID"
    url_field: str = "path_string"
    last_modified_field: str = "modified"

    def __post_init__(self):
        by_name = {f.name: f for f in self.fields}
        for f in self.fields:
            if isinstance(f.extractor, FieldMappingExtractor):
                f.extractor._source = by_name[f.extractor.field_name].extractor

    def get_field(self, name):
        for f in self.fields:
            if f.name == name:
                return f
        raise KeyError(name)


PORTAL_TYPE_MAPPING = {  # reference: tests/assets/basic_config.py:23-26
    "text/html": "ContentPage",
    "application/pdf": "File",
}

OBJECT_TYPE_MAPPING = {  # reference: tests/assets/basic_config.py:28-31
    "ContentPage": "CONTENT_PAGE",
    "File": "FILE",
}


def default_fields() -> list:
    """The canonical 20-field document schema of the reference deployment
    (tests/assets/basic_config.py:62-115 + solr-base.cfg:29-50)."""
    return [
        Field("allowedRolesAndUsers", ConstantExtractor(["Anonymous"]),
              multivalued=True),
        Field("created", LastModifiedExtractor(), type_=datetime),
        Field("Creator", CreatorExtractor()),
        Field("Description", DescriptionExtractor()),
        Field("effective", IndexingTimeExtractor(), type_=datetime),
        Field("expires", ConstantExtractor(datetime(2050, 12, 31)),
              type_=datetime),
        Field("getId", SlugExtractor()),
        Field("getRemoteUrl", TargetURLExtractor()),
        Field("modified", LastModifiedExtractor(), type_=datetime),
        Field("object_type", FieldMappingExtractor(
            "portal_type", OBJECT_TYPE_MAPPING, default="File")),
        Field("path_string", URLExtractor()),
        Field("portal_type", HeaderMappingExtractor(
            "content-type", PORTAL_TYPE_MAPPING, default="File")),
        Field("SearchableText", PlainTextExtractor()),
        Field("showinsearch", ConstantExtractor(True), type_=bool),
        Field("site_area", SiteAttributeExtractor("site_area"),
              multivalued=True),
        Field("snippetText", SnippetTextExtractor()),
        Field("Subject", KeywordsExtractor(), multivalued=True),
        Field("Title", TitleExtractor()),
        Field("topics", KeywordsExtractor(), multivalued=True),
        Field("UID", UIDExtractor(), required=True),
    ]


def default_config(sites: list | None = None) -> CrawlerConfig:
    return CrawlerConfig(sites=sites or [], fields=default_fields())
