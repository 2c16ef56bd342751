"""HTML handling: encoding sniff, DOM, XPath subset, metadata & text.

This is the engine's stand-in for the reference's two external services:

- Tika ``/meta`` + ``/tika`` (reference: ftw/crawler/tika.py:23-59) —
  replaced by :func:`extract_metadata` / :func:`html_to_text` running
  in-process over the ``html`` binary column (no HTTP crossing; the
  functions are applied per Arrow batch inside pandas UDFs).
- lxml+BeautifulSoup in XPathExtractor (reference:
  ftw/crawler/extractors.py:231-285) — replaced by a stdlib
  ``html.parser`` DOM plus a small XPath-subset evaluator covering the
  pattern family the reference's configs use (``//tag[@attr='v']/child``).

Encoding sniffing mirrors UnicodeDammit over the reference's proposed
list ['utf-8', 'latin1'] (extractors.py:236-242): strict utf-8 first,
latin-1 as the fallback that always succeeds.

The ``html_to_text`` output contract is this engine's deterministic
"Tika text" specification: block-level elements emit newline
separators, scripts/styles/comments are dropped, character data is
preserved verbatim. The synthetic page store (sources/synth.py) defines
its ``text`` column as exactly ``html_to_text(html)``, so byte-identity
of extraction is testable end-to-end.
"""

from __future__ import annotations

import re
from html import unescape as _unescape
from html.parser import HTMLParser
from urllib.parse import urljoin, urlsplit, urlunsplit

# The fast tokenizer (_fast_feed) reuses html.parser's PRIVATE compiled
# regexes so its tokenization is call-identical to the stdlib where it
# runs. Those names are implementation details: CPython's html.parser
# security rewrites have renamed/retired such internals before, so any
# missing name disables the fast path entirely (parse_html then always
# takes the stdlib reparse branch — slower, never wrong). Verified
# against CPython 3.10–3.13; an interpreter bump MUST re-run
# ``python tools/sweep_parser.py`` (297k-page identity sweep) before
# trusting the fast path again.
try:
    from html.parser import (attrfind_tolerant, commentclose, endendtag,
                             endtagfind, locatestarttagend_tolerant,
                             piclose, tagfind_tolerant)
    _FAST_PARSER_OK = True
except ImportError:   # stdlib internals moved — force the stdlib path
    _FAST_PARSER_OK = False

MARKUP_TYPES = ("application/xml", "application/xhtml+xml", "text/xml",
                "text/html")  # reference: ftw/crawler/xml_utils/__init__.py:5-7

VOID_ELEMENTS = frozenset((
    "area", "base", "br", "col", "embed", "hr", "img", "input", "link",
    "meta", "param", "source", "track", "wbr",
))

BLOCK_ELEMENTS = frozenset((
    "title", "p", "div", "h1", "h2", "h3", "h4", "h5", "h6", "li", "ul",
    "ol", "table", "tr", "td", "th", "blockquote", "pre", "section",
    "article", "header", "footer", "nav", "aside", "main", "figure",
    "figcaption", "address", "dt", "dd", "dl", "form", "fieldset",
    "hr", "br", "body", "head", "html",
))

SKIP_ELEMENTS = frozenset(("script", "style"))


class Node:
    """Minimal DOM node: tag, attrs dict, children (Node or str)."""

    __slots__ = ("tag", "attrs", "children", "parent")

    def __init__(self, tag: str, attrs=None, parent=None):
        self.tag = tag
        self.attrs = dict(attrs) if attrs else {}
        self.children: list = []
        self.parent = parent

    def iter(self):
        # explicit-stack preorder DFS: nested `yield from` recursion
        # costs a generator frame per tree level per yielded node —
        # measurably hot when every extraction row walks its DOM
        stack = [self]
        while stack:
            node = stack.pop()
            yield node
            stack.extend(child for child in reversed(node.children)
                         if isinstance(child, Node))

    def text_content(self) -> str:
        """All descendant character data concatenated in document order
        (lxml ``text_content()`` analog — extractors.py:273)."""
        parts: list[str] = []
        self._collect_text(parts)
        return "".join(parts)

    def _collect_text(self, parts: list[str]) -> None:
        if self.tag in SKIP_ELEMENTS:
            return
        for child in self.children:
            if isinstance(child, Node):
                child._collect_text(parts)
            else:
                parts.append(child)


class DocumentRoot(Node):
    """Root node carrying a tag → [nodes in document order] index built
    during the parse. Element creation order IS preorder document
    order, so index lists match ``iter()`` order exactly — consumers
    (metadata scan, the XPath first step) use the index instead of a
    full-tree walk, which the extraction profile showed as the second
    cost after the parse itself."""

    __slots__ = ("by_tag",)

    def __init__(self):
        super().__init__("#document")
        self.by_tag: dict[str, list] = {}


class _TreeBuilder(HTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.root = DocumentRoot()
        self.stack = [self.root]

    def _index(self, tag: str, node: Node) -> None:
        bucket = self.root.by_tag.get(tag)
        if bucket is None:
            self.root.by_tag[tag] = [node]
        else:
            bucket.append(node)

    def handle_starttag(self, tag, attrs):
        # namespace strip analog (reference XSLT remove_namespaces,
        # xml_utils/__init__.py:10-19): drop any prefix
        if ":" in tag:
            tag = tag.rsplit(":", 1)[-1]
        node = Node(tag, attrs, parent=self.stack[-1])
        self.stack[-1].children.append(node)
        self._index(tag, node)
        if tag not in VOID_ELEMENTS:
            self.stack.append(node)

    def handle_startendtag(self, tag, attrs):
        if ":" in tag:
            tag = tag.rsplit(":", 1)[-1]
        node = Node(tag, attrs, parent=self.stack[-1])
        self.stack[-1].children.append(node)
        self._index(tag, node)

    def handle_endtag(self, tag):
        if ":" in tag:
            tag = tag.rsplit(":", 1)[-1]
        # pop to nearest matching open tag (lenient, HTMLParser-style)
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].tag == tag:
                del self.stack[i:]
                break

    def handle_data(self, data):
        if data:
            self.stack[-1].children.append(data)


def sniff_encoding(data: bytes) -> str:
    """UnicodeDammit-over-['utf-8','latin1'] analog: strict utf-8 first,
    latin-1 fallback (extractors.py:236-242)."""
    try:
        data.decode("utf-8")
        return "utf-8"
    except (UnicodeDecodeError, AttributeError):
        return "latin-1"


class _Bail(Exception):
    """Fast tokenizer hit a construct it does not replicate — reparse
    the whole document with the stdlib HTMLParser."""


# stdlib html.parser's own token regexes are imported at module top and
# reused verbatim so the fast path is token-identical where it runs
# exactly HTMLParser.set_cdata_mode's pattern: the close must include
# its '>' — '</script x>' or a bare '</script' prefix is DATA, not a
# close (divergence here produced a different DOM; pinned by the
# cdata cases in test_fast_parser_matches_stdlib)
_CDATA_CLOSE = {
    "script": re.compile(r"</\s*script\s*>", re.IGNORECASE),
    "style": re.compile(r"</\s*style\s*>", re.IGNORECASE),
}
_LETTERS = frozenset(
    "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ")


def _fast_feed(s: str, b: "_TreeBuilder") -> None:
    """One-pass tokenizer over a COMPLETE document string, emitting the
    same handler calls as ``HTMLParser(convert_charrefs=True)`` —
    goahead()'s incremental-feed generality (rawdata buffering,
    updatepos line tracking, partial-charref hold-back) is what the
    extraction profile showed as the dominant per-row cost, and none
    of it is needed when the whole string is in hand. Tag/attr
    tokenization reuses the stdlib's own compiled regexes, so where
    this path runs it is call-for-call identical; any construct whose
    stdlib handling involves recovery heuristics we don't replicate
    (truncated tags, marked sections, unterminated comments) raises
    ``_Bail`` and the caller reparses with the stdlib parser.
    Byte-identity with HTMLParser is pinned by test_extraction's
    corpus sweep + a randomized cross-check."""
    i, n = 0, len(s)
    handle_data = b.handle_data
    find = s.find
    startswith = s.startswith
    while i < n:
        j = find("<", i)
        if j < 0:
            chunk = s[i:]
            if chunk:
                handle_data(_unescape(chunk) if "&" in chunk else chunk)
            return
        if j > i:
            chunk = s[i:j]
            handle_data(_unescape(chunk) if "&" in chunk else chunk)
        i = j
        nxt = s[i + 1:i + 2]
        if nxt in _LETTERS:
            # --- parse_starttag, whole-string edition ---
            m = locatestarttagend_tolerant.match(s, i)
            j2 = m.end()
            after = s[j2:j2 + 1]
            if after == ">":
                endpos = j2 + 1
            elif after == "/" and startswith("/>", j2):
                endpos = j2 + 2
            elif after == "":
                raise _Bail  # EOF inside tag: stdlib recovery path
            elif after == "/" or after in _LETTERS or after == "=":
                raise _Bail  # buffer-boundary/bogus recovery path
            else:
                endpos = j2 if j2 > i else i + 1
            tm = tagfind_tolerant.match(s, i + 1)
            if tm is None:
                raise _Bail
            k = tm.end()
            tag = tm.group(1).lower()
            attrs = []
            while k < endpos:
                am = attrfind_tolerant.match(s, k)
                if not am:
                    break
                attrname, rest, attrvalue = am.group(1, 2, 3)
                if not rest:
                    attrvalue = None
                elif attrvalue[:1] == "'" == attrvalue[-1:] or \
                        attrvalue[:1] == '"' == attrvalue[-1:]:
                    attrvalue = attrvalue[1:-1]
                if attrvalue:
                    attrvalue = _unescape(attrvalue)
                attrs.append((attrname.lower(), attrvalue))
                k = am.end()
            end = s[k:endpos].strip()
            if end not in (">", "/>"):
                handle_data(s[i:endpos])
                i = endpos
                continue
            if end == "/>":
                b.handle_startendtag(tag, attrs)
                i = endpos
                continue
            b.handle_starttag(tag, attrs)
            i = endpos
            if tag in _CDATA_CLOSE:
                # --- cdata mode: raw data until the FULL close tag
                # ('</\s*tag\s*>', HTMLParser.set_cdata_mode) — a bare
                # '</tag' prefix without its '>' is data. The matched
                # span contains exactly one '>' (its last char), so the
                # stdlib's parse_endtag on this position always closes
                # this element at m2.end().
                m2 = _CDATA_CLOSE[tag].search(s, i)
                if not m2:
                    raise _Bail  # unterminated script/style
                if m2.start() > i:
                    handle_data(s[i:m2.start()])  # raw: no charrefs
                b.handle_endtag(tag)
                i = m2.end()
        elif startswith("</", i):
            # --- parse_endtag (non-cdata) ---
            gm = endendtag.search(s, i + 1)
            if not gm:
                raise _Bail
            gtpos = gm.end()
            em = endtagfind.match(s, i)
            if em:
                b.handle_endtag(em.group(1).lower())
                i = gtpos
                continue
            nm = tagfind_tolerant.match(s, i + 2)
            if not nm:
                if startswith("</>", i):
                    i += 3
                    continue
                # bogus comment: ignored by the builder
                pos = find(">", i + 2)
                if pos == -1:
                    raise _Bail
                i = pos + 1
                continue
            gtpos2 = find(">", nm.end())
            if gtpos2 == -1:
                raise _Bail
            b.handle_endtag(nm.group(1).lower())
            i = gtpos2 + 1
        elif startswith("<!--", i):
            m3 = commentclose.search(s, i + 4)
            if not m3:
                raise _Bail
            i = m3.end()  # comments ignored by the builder
        elif startswith("<?", i):
            m4 = piclose.search(s, i + 2)
            if not m4:
                raise _Bail
            i = m4.end()  # PIs ignored
        elif startswith("<!", i):
            if startswith("<![", i):
                raise _Bail  # marked section
            # doctype / bogus declaration: skip to '>' (ignored)
            pos = find(">", i + 2)
            if pos == -1:
                raise _Bail
            i = pos + 1
        else:
            # lone '<' is data
            handle_data("<")
            i += 1


def parse_html(data: bytes | str) -> Node:
    if isinstance(data, bytes):
        data = data.decode(sniff_encoding(data))
    builder = _TreeBuilder()
    if _FAST_PARSER_OK:
        try:
            _fast_feed(data, builder)
            return builder.root
        except _Bail:
            builder = _TreeBuilder()
    builder.feed(data)
    builder.close()
    return builder.root


# ---------------------------------------------------------------------------
# XPath subset
# ---------------------------------------------------------------------------


def xpath_first(root: Node, xpath: str) -> Node | None:
    """Evaluate the XPath subset ``//tag[@attr='value']/child[...]...``
    (descendant-or-self start, child steps, optional single attribute
    predicate per step) and return the FIRST match in document order —
    the reference warns + takes the first on multiple matches
    (extractors.py:266-272).
    """
    matches = xpath_all(root, xpath)
    return matches[0] if matches else None


def xpath_all(root: Node, xpath: str) -> list[Node]:
    if not xpath.startswith("//"):
        raise ValueError(f"unsupported xpath (must start with //): {xpath}")
    steps = xpath[2:].split("/")
    parsed = [_parse_step(s) for s in steps if s]

    # first step: descendant-or-self (the by_tag index is preorder
    # document order — identical to the iter() walk)
    tag0, pred0 = parsed[0]
    if isinstance(root, DocumentRoot):
        current = [n for n in root.by_tag.get(tag0, ())
                   if _match_pred(n, pred0)]
    else:
        current = [n for n in root.iter()
                   if n.tag == tag0 and _match_pred(n, pred0)]
    for tag, pred in parsed[1:]:
        nxt = []
        for node in current:
            for child in node.children:
                if isinstance(child, Node) and child.tag == tag \
                        and _match_pred(child, pred):
                    nxt.append(child)
        current = nxt
    return current


def _parse_step(step: str):
    if "[" in step:
        tag, _, rest = step.partition("[")
        pred = rest.rstrip("]")
        if not (pred.startswith("@") and "=" in pred):
            raise ValueError(f"unsupported xpath predicate: [{pred}]")
        attr, _, val = pred[1:].partition("=")
        return tag, (attr.strip(), val.strip().strip("'\""))
    return step, None


def _match_pred(node: Node, pred) -> bool:
    if pred is None:
        return True
    attr, val = pred
    return node.attrs.get(attr) == val


# ---------------------------------------------------------------------------
# Tika-analog metadata + text
# ---------------------------------------------------------------------------


def extract_metadata(html_bytes: bytes | None,
                     content_type: str | None,
                     root: Node | None = None) -> dict:
    """HTML ``<meta name= content=>`` tags + ``<title>`` as a raw
    metadata dict — this engine's Tika ``/meta`` analog for markup
    (reference: tika.py:23-46). Keys are the verbatim ``name``
    attributes (so 'DC.title', 'author', … survive for the
    SimpleMetadata canonicalization in scalars.canonicalize_metadata).
    Non-markup content types yield an empty dict.

    ``root``: an already-parsed DOM of the same bytes — the extraction
    row context passes its cached tree so metadata and the
    title/xpath extractors share ONE parse per document (the parse is
    the dominant per-row cost in the hot extraction stage).
    """
    if html_bytes is None or content_type not in MARKUP_TYPES:
        return {}
    if root is None:
        root = parse_html(html_bytes)
    # the first <title> in document order (== the xpath_first('//title')
    # result) + every <meta name= content=> — via the parse-time tag
    # index when available (no tree walk), else one traversal
    meta: dict[str, str] = {}
    title_node = None
    if isinstance(root, DocumentRoot):
        titles = root.by_tag.get("title")
        title_node = titles[0] if titles else None
        for node in root.by_tag.get("meta", ()):
            name = node.attrs.get("name")
            content = node.attrs.get("content")
            if name and content is not None:
                meta[name] = content
    else:
        for node in root.iter():
            if node.tag == "title" and title_node is None:
                title_node = node
            elif node.tag == "meta":
                name = node.attrs.get("name")
                content = node.attrs.get("content")
                if name and content is not None:
                    meta[name] = content
    if title_node is not None:
        # insertion order must match the original (title first) for the
        # canonicalization's dict-order semantics
        meta = {"title": title_node.text_content(), **meta}
    return meta


def html_to_text(html_bytes: bytes | None,
                 content_type: str | None) -> str:
    """Deterministic plain-text rendering of markup — this engine's Tika
    ``/tika`` (text/plain) analog (reference: tika.py:48-59).

    Contract: character data verbatim, in document order;
    scripts/styles dropped; a single ``\\n`` separator emitted at each
    block-element boundary (collapsing runs); leading/trailing
    whitespace of the whole document stripped. The synthetic page
    store's ``text`` column is defined as this function's output, which
    makes "byte-identical extracted text per url" a real end-to-end
    assertion rather than a tautology on stored data.
    """
    if html_bytes is None:
        return ""
    if content_type is not None and content_type not in MARKUP_TYPES:
        # non-markup: bytes are already plain text (Tika passthrough)
        return html_bytes.decode(sniff_encoding(html_bytes))
    root = parse_html(html_bytes)
    parts: list[str] = []
    _render(root, parts)
    text = "".join(parts)
    # collapse newline runs introduced at block boundaries
    lines = [seg for seg in (s.strip() for s in text.split("\n")) if seg]
    return "\n".join(lines)


def _render(node: Node, parts: list[str]) -> None:
    if node.tag in SKIP_ELEMENTS:
        return
    is_block = node.tag in BLOCK_ELEMENTS
    if is_block:
        parts.append("\n")
    for child in node.children:
        if isinstance(child, Node):
            _render(child, parts)
        else:
            parts.append(child)
    if is_block:
        parts.append("\n")


# ---------------------------------------------------------------------------
# outlinks (shared-parse form)
# ---------------------------------------------------------------------------

_SKIP_LINK_SCHEMES = ("mailto", "javascript", "tel", "data", "about")


def doc_outlinks(doc: Node | None, base_url: str | None) -> list:
    """(resolved_href, anchor_text) pairs from a PARSED document in
    document order, duplicates kept. DOM-level so callers that already
    hold a parse share it (the extraction engine's per-row DOM is the
    expensive step; operators/linkgraph.parse_outlinks wraps this for
    the standalone raw-bytes path). Hrefs resolve against the page url
    honoring ``<base href>`` (RFC 3986 join); non-fetchable schemes and
    pure-fragment hrefs are dropped; fragments are stripped."""
    if doc is None or base_url is None:
        return []
    by_tag = getattr(doc, "by_tag", None)
    if by_tag is None:
        return []
    base = base_url
    for node in by_tag.get("base", ()):
        if node.attrs.get("href"):
            base = urljoin(base_url, node.attrs["href"])
            break
    out = []
    for a in by_tag.get("a", ()):
        href = a.attrs.get("href")
        if not href:
            continue
        href = href.strip()
        if not href or href.startswith("#"):
            continue
        scheme = href.split(":", 1)[0].lower() if ":" in href else ""
        if scheme in _SKIP_LINK_SCHEMES:
            continue
        try:
            resolved = urljoin(base, href)
            parts = urlsplit(resolved)
        except ValueError:
            continue
        if parts.scheme not in ("http", "https"):
            continue
        resolved = urlunsplit(
            (parts.scheme, parts.netloc, parts.path, parts.query, ""))
        anchor = " ".join((a.text_content() or "").split())
        out.append((resolved, anchor))
    return out
