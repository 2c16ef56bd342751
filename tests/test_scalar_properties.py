"""Property-based tests (hypothesis) for the byte-identity scalar layer.

The golden tests (test_scalars) pin exact reference values; these pin
the INVARIANTS the reference semantics imply, over arbitrary unicode
input — the class of bug goldens can't catch (a quirk that happens to
hold on the fixture corpus but breaks elsewhere)."""

from __future__ import annotations

import re
from datetime import datetime, timedelta, timezone

from hypothesis import given, settings
from hypothesis import strategies as st

from ftw_crawler_spark.functions import scalars

TEXT = st.text(max_size=200)
SETTINGS = settings(max_examples=200, deadline=None)


@SETTINGS
@given(TEXT)
def test_normalize_whitespace_canonical(s):
    out = scalars.normalize_whitespace(s)
    assert out == scalars.normalize_whitespace(out)   # idempotent
    assert not out.startswith(" ") and not out.endswith(" ")
    assert "  " not in out
    # token multiset preserved
    assert out.split() == s.split()


@SETTINGS
@given(TEXT)
def test_slugify_alphabet(s):
    out = scalars.slugify(s)
    assert re.fullmatch(r"(?:[a-z0-9]+(?:-[a-z0-9]+)*)?", out), out
    assert scalars.slugify(out) == out                # idempotent


@SETTINGS
@given(st.text(min_size=1, max_size=100))
def test_uid_shape_and_determinism(url):
    uid = scalars.uid_for_url(url)
    assert re.fullmatch(
        r"[0-9a-f]{8}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{12}",
        uid)
    assert uid == scalars.uid_for_url(url)


@SETTINGS
@given(TEXT, TEXT)
def test_snippet_lstrip_quirk_invariants(text, title):
    out = scalars.snippet_text(text, title)
    plain = text.strip()
    t = title.strip()
    if not plain.startswith(t) or not t:
        assert out == plain
    else:
        # the quirk: strip-from-left every char CONTAINED in the title
        assert out == plain.lstrip(t)
        assert not out or out[0] not in set(t)


@SETTINGS
@given(st.text(alphabet=st.characters(blacklist_characters=","),
               max_size=50).map(lambda s: s))
def test_keywords_no_comma_splits_on_whitespace(s):
    out = scalars.split_keywords(s)
    assert out == [w.strip() for w in s.split()]


@SETTINGS
@given(st.lists(st.text(
    alphabet=st.characters(blacklist_categories=("Cs",),
                           blacklist_characters=","), max_size=10),
    min_size=1, max_size=6))
def test_keywords_with_comma_splits_on_comma(parts):
    s = ",".join(parts)
    if "," in s:
        assert scalars.split_keywords(s) == [p.strip() for p in parts]


@SETTINGS
@given(st.datetimes(min_value=datetime(1971, 1, 1),
                    max_value=datetime(2199, 12, 31)))
def test_iso_roundtrip(dt):
    s = scalars.to_iso_datetime(dt)
    back = scalars.from_iso_datetime(s)
    assert back == dt.replace(tzinfo=timezone.utc)


@SETTINGS
@given(st.datetimes(min_value=datetime(1971, 1, 1),
                    max_value=datetime(2199, 12, 31)),
       st.integers(min_value=-14 * 60, max_value=14 * 60))
def test_to_utc_offset_normalization(dt, offset_min):
    aware = dt.replace(tzinfo=timezone(timedelta(minutes=offset_min)))
    out = scalars.to_utc(aware)
    assert out.utcoffset() == timedelta(0)
    assert out == aware                               # same instant


@SETTINGS
@given(st.binary(max_size=500))
def test_gzip_roundtrip(data):
    import gzip as g
    assert scalars.gunzip(g.compress(data)) == data


@SETTINGS
@given(st.dictionaries(
    st.sampled_from(["dcterms:title", "dc:title", "DC.title", "title",
                     "dc:creator", "author", "keywords", "other"]),
    st.text(max_size=10), max_size=6))
def test_metadata_canonicalization_precedence(mapping):
    out = scalars.canonicalize_metadata(mapping)
    # originals preserved — except keys that are THEMSELVES canonical
    # keys, which the reference's post-loop update() may overwrite with
    # a higher-precedence prefixed value (metadata.py:33)
    for k, v in mapping.items():
        if k not in scalars.METADATA_MAPPING:
            assert out[k] == v
    # canonical title = first present key in precedence order
    for key in ["dcterms:title", "dc:title", "DC.title", "title"]:
        if key in mapping:
            assert out["title"] == mapping[key]
            break
