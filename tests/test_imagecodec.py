"""Stdlib image codec: decoder round-trips and the real-codec path of
the multimodal Spark stages (blob → decode → resize → feature on REAL
bytes — the honest upgrade from the SQL-oracled deterministic fake)."""

from __future__ import annotations

import hashlib

import pytest

from ftw_crawler_spark.functions.imagecodec import (decode_bmp, decode_image,
                                                    decode_png, decode_ppm,
                                                    encode_bmp, encode_png,
                                                    encode_ppm,
                                                    pixel_features,
                                                    resize_nearest, sniff)


def _img(w: int, h: int):
    """Deterministic test image with all-distinct pixel bytes."""
    px = bytes((13 * i + 7) % 256 for i in range(3 * w * h))
    return (w, h, px)


# width 3 exercises BMP's 4-byte row padding (9 -> 12); width 4 none
@pytest.mark.parametrize("w,h", [(3, 2), (4, 3), (1, 1), (7, 5)])
def test_roundtrip_all_formats(w, h):
    img = _img(w, h)
    assert decode_ppm(encode_ppm(img)) == img
    assert decode_bmp(encode_bmp(img)) == img
    assert decode_png(encode_png(img)) == img
    for blob, kind in ((encode_ppm(img), "ppm"),
                       (encode_bmp(img), "bmp"),
                       (encode_png(img), "png")):
        assert sniff(blob) == kind
        assert decode_image(blob) == img


def test_png_all_filter_types_roundtrip():
    """Encoding with real per-row filter math (Sub/Up/Average/Paeth)
    makes decode exercise every unfilter branch on genuine streams."""
    img = _img(6, 10)
    for filters in ([1], [2], [3], [4], [0, 1, 2, 3, 4]):
        blob = encode_png(img, filters=filters)
        assert decode_png(blob) == img, f"filters={filters}"


def test_ppm_header_comments_and_whitespace():
    w, h, px = _img(2, 2)
    blob = b"P6 # comment\n# another\n 2\t2\n255\n" + px
    assert decode_ppm(blob) == (2, 2, px)


def test_unsupported_rejected():
    with pytest.raises(ValueError, match="unsupported"):
        decode_image(b"\xff\xd8\xff\xe0 jpeg-ish")
    with pytest.raises(ValueError, match="maxval"):
        decode_ppm(b"P6\n1 1\n65535\n" + b"\x00" * 6)
    with pytest.raises(ValueError, match="24-bit"):
        decode_bmp(encode_bmp(_img(1, 1))[:28]
                   + b"\x08\x00" + encode_bmp(_img(1, 1))[30:])
    with pytest.raises(ValueError, match="truncated"):
        decode_ppm(encode_ppm(_img(4, 4))[:-1])


def test_resize_nearest_semantics():
    # 2x2 distinct-corner image blown up 2x: each corner becomes a
    # 2x2 block of its color (floor mapping)
    px = bytes([255, 0, 0, 0, 255, 0,
                0, 0, 255, 255, 255, 0])
    up = resize_nearest((2, 2, px), 4, 4)
    assert up[0:2] == (4, 4)
    rgb = up[2]
    assert rgb[0:3] == rgb[3:6] == bytes([255, 0, 0])
    assert rgb[6:9] == rgb[9:12] == bytes([0, 255, 0])
    # identity resize is a no-op
    assert resize_nearest((2, 2, px), 2, 2) == (2, 2, px)


def test_pixel_features_shape_and_values():
    # uniform mid-gray: channel means 128/255, second moment (128/255)^2
    img = (4, 2, bytes([128] * 24))
    f = pixel_features(img, 8)
    assert len(f) == 8
    assert abs(f[0] - 128 / 255) < 1e-12
    assert abs(f[1] - (128 / 255) ** 2) < 1e-12
    assert abs(f[6] - 4 / 6) < 1e-12
    assert all(0.0 <= v <= 1.0 for v in f)


@pytest.mark.slow
def test_spark_stages_real_codec(spark):
    """The three multimodal stages over real PPM/BMP/PNG bytes match a
    row-wise pure-Python oracle — same Arrow plumbing as the certified
    fake mode, real pixels."""
    from ftw_crawler_spark.operators import multimodal as mm

    blobs = []
    for i in range(12):
        img = _img(3 + i % 5, 2 + i % 4)
        enc = (encode_ppm, encode_bmp, encode_png)[i % 3]
        blobs.append((i, enc(img), img))
    df = spark.createDataFrame([(i, b) for i, b, _ in blobs],
                               "doc_id long, blob binary")

    meta = {r["doc_id"]: r for r in
            mm.blob_meta(df, codec="real").collect()}
    rs = {r["doc_id"]: r for r in
          mm.resize_meta(df, 4, 4, codec="real").collect()}
    feat = {r["doc_id"]: r for r in
            mm.feature_extract(df, codec="real").collect()}
    for i, blob, img in blobs:
        w, h, _px = img
        assert (meta[i]["width"], meta[i]["height"]) == (w, h)
        assert meta[i]["n_bytes"] == len(blob)
        assert meta[i]["magic"] == ("ppm", "bmp", "png")[i % 3]
        scale = min(4 / w, 4 / h)
        ow, oh = max(1, int(w * scale)), max(1, int(h * scale))
        assert (rs[i]["out_w"], rs[i]["out_h"]) == (ow, oh)
        assert rs[i]["resized_hash"] == hashlib.md5(
            resize_nearest(img, ow, oh)[2]).hexdigest()
        want = pixel_features(img, mm.FEATURE_DIM)
        assert max(abs(a - b) for a, b in
                   zip(feat[i]["feature"], want)) < 1e-12
