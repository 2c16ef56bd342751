"""Pure-Python scalar semantics, byte-identical to the reference crawler.

Every function here reimplements — exactly, quirks included — a scalar
behavior of the reference (4teamwork/ftw.crawler). These are used both
inside the vectorized pandas UDFs (operators/extraction.py) and as the
plain-Python oracle in tests, so any deviation shows up as a golden-file
mismatch.

Reference citations are given per function as ``path:line`` into
/root/reference/.
"""

from __future__ import annotations

import base64
import gzip
import hashlib
import io
import re
import unicodedata
import uuid
from datetime import datetime, timezone
from urllib.parse import unquote_plus, urlparse

import dateutil.parser

# ---------------------------------------------------------------------------
# whitespace / unicode
# ---------------------------------------------------------------------------


def normalize_whitespace(s: str) -> str:
    """Collapse all unicode-whitespace runs to single spaces and strip ends.

    Reference: ftw/crawler/utils.py:98-105 — ``u' '.join(s.split())``.
    NOTE: must use Python ``str.split()`` (splits on the unicode-whitespace
    set incl. NBSP-adjacent controls), NOT a ``\\s+`` regex, whose class
    differs on some unicode whitespace codepoints.
    """
    return " ".join(s.split())


# ---------------------------------------------------------------------------
# UID  (md5-of-url as UUID)
# ---------------------------------------------------------------------------


def uid_for_url(url: str) -> str:
    """md5(url) digest laid out as a UUID string.

    Reference: ftw/crawler/extractors.py:152-158 (UIDExtractor).
    Golden: ``http://example.org`` → ``dab521de-65f9-250b-4cca-7383feef67dc``
    (tests/test_extractors.py:513-521).
    """
    digest = hashlib.md5(url.encode("utf-8")).digest()
    return str(uuid.UUID(bytes=digest))


# ---------------------------------------------------------------------------
# slug
# ---------------------------------------------------------------------------

_SLUG_SPECIAL = {
    "ß": "ss", "æ": "ae", "Æ": "AE", "ø": "o", "Ø": "O", "þ": "th",
    "Þ": "Th", "ð": "d", "Ð": "D", "đ": "d", "Đ": "D", "ł": "l",
    "Ł": "L", "œ": "oe", "Œ": "OE", "ı": "i", "ſ": "s",
}

_QUOTE_RE = re.compile(r"[']+")
_DISALLOWED_RE = re.compile(r"[^-a-z0-9]+")
_DUP_DASH_RE = re.compile(r"-{2,}")


def _ascii_fold(text: str) -> str:
    """Latin transliteration equivalent to unidecode for the Latin range:
    NFKD-decompose, drop combining marks, special-case letters with no
    decomposition (ß→ss, ø→o, …). Non-Latin codepoints without a
    decomposition are dropped (matching unidecode's '' for unmapped)."""
    out = []
    for ch in text:
        if ch in _SLUG_SPECIAL:
            out.append(_SLUG_SPECIAL[ch])
            continue
        if ord(ch) < 128:
            out.append(ch)
            continue
        decomp = unicodedata.normalize("NFKD", ch)
        kept = "".join(c for c in decomp if not unicodedata.combining(c)
                       and ord(c) < 128)
        out.append(kept)
    return "".join(out)


def slugify(text: str) -> str:
    """python-slugify semantics (the library the reference imports):
    transliterate → lowercase → drop apostrophes → non-[a-z0-9] runs
    become single dashes → strip dashes.

    Reference: ftw/crawler/extractors.py:161-168 (SlugExtractor._make_slug);
    goldens tests/test_extractors.py:544-598 (%-encoding, ä→a).
    """
    text = _ascii_fold(text)
    text = text.lower()
    text = _QUOTE_RE.sub("", text)
    text = _DISALLOWED_RE.sub("-", text)
    text = _DUP_DASH_RE.sub("-", text).strip("-")
    return text


def slug_for_url(url: str) -> str:
    """Slug of the rightmost URL path segment.

    Reference: ftw/crawler/extractors.py:170-177 — path, rstrip('/'),
    last '/'-segment, '' → 'index-html', unquote_plus, slugify.
    """
    path = urlparse(url).path.rstrip("/")
    basename = path.split("/")[-1]
    if basename == "":
        basename = "index-html"
    return slugify(unquote_plus(basename))


# ---------------------------------------------------------------------------
# datetimes
# ---------------------------------------------------------------------------

EPOCH = datetime(1970, 1, 1)  # required-datetime default, extractors.py:115-119


def to_utc(dt: datetime) -> datetime:
    """Naive → assume UTC; aware → convert to UTC.

    Reference: ftw/crawler/utils.py:14-23.
    """
    if dt.tzinfo is None:
        return dt.replace(tzinfo=timezone.utc)
    return dt.astimezone(timezone.utc)


def from_iso_datetime(datestring: str) -> datetime:
    """Lenient ISO-8601 parse (dateutil — same library as the reference)
    normalized to UTC. Accepts date-only ('2014-12-31') and offset forms.

    Reference: ftw/crawler/utils.py:33-37.
    """
    return to_utc(dateutil.parser.parse(datestring))


def to_iso_datetime(dt: datetime) -> str:
    """``%Y-%m-%dT%H:%M:%S.%fZ`` — exact format incl. microseconds.

    Reference: ftw/crawler/utils.py:26-30 (tests/test_utils.py:44-55).
    """
    return to_utc(dt).strftime("%Y-%m-%dT%H:%M:%S.%fZ")


def to_http_datetime(dt: datetime) -> str:
    """RFC 2616 / RFC 1123 HTTP-date in GMT (``Wed, 31 Dec 2014
    14:45:30 GMT``). timegm (UTC), NOT mktime (localtime) — same
    pitfall the reference documents.

    Reference: ftw/crawler/utils.py:40-46 (tests/test_utils.py:70-80).
    """
    import calendar
    from wsgiref.handlers import format_date_time
    timestamp = calendar.timegm(to_utc(dt).timetuple())
    return format_date_time(timestamp)


def from_http_datetime(datestring: str) -> datetime:
    """Parse an RFC 2616 HTTP-date (any of its three formats: RFC 1123,
    RFC 850, ANSI-C asctime) to an aware UTC datetime. Lenient dateutil
    parse — the same implementation the reference uses, so non-HTTP
    forms (ISO) are accepted too.

    Reference: ftw/crawler/utils.py:49-54 (tests/test_utils.py:82-98).
    """
    return to_utc(dateutil.parser.parse(datestring))


# ---------------------------------------------------------------------------
# HTTP header helpers
# ---------------------------------------------------------------------------


def get_content_type(header_value: str | None) -> str | None:
    """Strip any '; charset=…' suffix: split on ';', take first token
    verbatim (NOT trimmed — reference keeps 'text/html ' if spaced).

    Reference: ftw/crawler/utils.py:57-66.
    """
    if header_value is not None:
        return header_value.split(";")[0]
    return None


def filename_from_content_disposition(header_value: str) -> str | None:
    """Parse ``content-disposition`` exactly like the reference:
    split on ';', strip items, first item starting with 'filename'
    (case-insens.), split on '=' into exactly (key, value) — a value
    containing '=' is an error in the reference (ValueError) and maps to
    "no value" here — strip quotes from the value.

    Reference: ftw/crawler/extractors.py:347-360 (FilenameExtractor).
    Returns None when no value can be extracted (NoValueExtracted analog).
    """
    items = [i.strip() for i in header_value.split(";")]
    for item in items:
        if item.lower().startswith("filename"):
            parts = [token.strip() for token in item.split("=")]
            if len(parts) != 2:
                return None  # reference raises ValueError → crawl-site abort
            _key, value = parts
            return value.replace('"', "")
    return None


def decode_document_title_header(header_value: str) -> str:
    """X-Document-Title header: base64 → utf-8 → strip.

    Reference: ftw/crawler/extractors.py:199-202.
    """
    return base64.b64decode(header_value).decode("utf-8").strip()


def is_gzipped(content_type: str | None, url: str) -> bool:
    """Content-Type is application/x-gzip OR url path ends with .gz.

    Reference: ftw/crawler/utils.py:69-78.
    """
    ct = get_content_type(content_type)
    path = urlparse(url).path
    return ct == "application/x-gzip" or path.endswith(".gz")


def gunzip(data: bytes) -> bytes:
    """Reference: ftw/crawler/utils.py:81-85."""
    with gzip.GzipFile(mode="rb", fileobj=io.BytesIO(data)) as f:
        return f.read()


# ---------------------------------------------------------------------------
# keywords
# ---------------------------------------------------------------------------


def split_keywords(value: str) -> list[str]:
    """Split on ',' if any comma present else on whitespace; strip each
    item (empty items from ',,' are KEPT as '' — reference keeps them).

    Reference: ftw/crawler/extractors.py:363-373 (KeywordsExtractor).
    """
    if "," in value:
        keywords = value.split(",")
    else:
        keywords = value.split()
    return [kw.strip() for kw in keywords]


# ---------------------------------------------------------------------------
# metadata canonicalization (SimpleMetadata)
# ---------------------------------------------------------------------------

METADATA_MAPPING = {
    "title": ["dcterms:title", "dc:title", "DC.title", "title"],
    "created": ["dcterms:created", "meta:creation-date", "Creation-Date"],
    "description": ["dcterms:description", "dc:description", "DC.description",
                    "description"],
    "keywords": ["dc:subject", "DC.subject", "keywords", "subject"],
    "creator": ["dcterms:creator", "dc:creator", "DC.creator", "creator",
                "author"],
}


def canonicalize_metadata(mapping: dict) -> dict:
    """First-prefix-wins mapping of Dublin-Core-style keys onto canonical
    keys, originals preserved; a canonical key already present is
    OVERWRITTEN when an earlier-precedence prefixed key exists.

    Reference: ftw/crawler/metadata.py:1-33 (SimpleMetadata);
    tests/test_metadata.py:7-26.
    """
    result = dict(mapping)
    # membership is tested against the dict as constructed (originals
    # only — the reference updates once, after the loop)
    for property_, keys in METADATA_MAPPING.items():
        for possible_key in keys:
            if possible_key in mapping:
                result[property_] = mapping[possible_key]
                break
    return result


# ---------------------------------------------------------------------------
# snippet
# ---------------------------------------------------------------------------


def snippet_text(plain_text: str, title: str) -> str:
    """Plain text minus title — with the reference's ``str.lstrip(title)``
    quirk: if the stripped plain text startswith the stripped title, strip
    from the left every character CONTAINED IN the title (character-set
    strip, not prefix removal): title 'Bären' + text 'Bärengraben' →
    'graben'.

    Reference: ftw/crawler/extractors.py:306-327 (SnippetTextExtractor);
    quirk golden tests/test_extractors.py:399-430.
    """
    plain_text = plain_text.strip()
    title = title.strip()
    snippet = plain_text
    if title is not None and snippet.startswith(title):
        snippet = snippet.lstrip(title)
    return snippet
