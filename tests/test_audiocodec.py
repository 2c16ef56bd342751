"""Stdlib audio codec: WAV round-trips and the real-codec path of the
audio multimodal Spark stages (blob → decode → window → feature on
REAL PCM bytes — the audio twin of test_imagecodec)."""

from __future__ import annotations

import hashlib
import math
import struct

import pytest

from ftw_crawler_spark.functions.audiocodec import (audio_features,
                                                    decode_audio,
                                                    decode_wav, encode_wav,
                                                    n_frames,
                                                    resample_nearest,
                                                    sniff_audio,
                                                    window_slices)


def _audio(rate: int, nch: int, n: int):
    """Deterministic test stream with all-distinct sample values."""
    pcm = b"".join(struct.pack("<h", (1103 * i + 7) % 65536 - 32768)
                   for i in range(n * nch))
    return (rate, nch, pcm)


@pytest.mark.parametrize("rate,nch,n",
                         [(8000, 1, 5), (16000, 2, 7), (44100, 2, 1),
                          (22050, 1, 160)])
def test_wav_roundtrip(rate, nch, n):
    audio = _audio(rate, nch, n)
    blob = encode_wav(audio)
    assert sniff_audio(blob) == "wav"
    assert decode_wav(blob) == audio
    assert decode_audio(blob) == audio
    assert n_frames(audio) == n


def test_wav_extra_chunks_and_odd_pad():
    """Decode skips LIST/fact noise; odd-sized chunk bodies consume
    their RIFF pad byte (both before and inside the data tail)."""
    audio = _audio(8000, 1, 3)
    blob = encode_wav(audio, extra_chunks=[(b"LIST", b"INFOxyz"),   # odd: 7
                                           (b"fact", b"\x03\x00\x00\x00")])
    assert decode_wav(blob) == audio
    # odd-length data body (mono stream of 3 frames = 6 bytes is even;
    # craft an odd body by appending a torn half-frame → dropped)
    torn = encode_wav((8000, 1, audio[2] + b"\xff"))
    assert decode_wav(torn) == audio


def test_wav_rejects_unsupported():
    with pytest.raises(ValueError, match="unsupported"):
        decode_audio(b"\xffID3 mp3-ish payload")
    audio = _audio(8000, 1, 4)
    blob = bytearray(encode_wav(audio))
    # fmt chunk starts at offset 12; audio_format field at 12+8
    struct.pack_into("<H", blob, 20, 85)   # MP3 format tag
    with pytest.raises(ValueError, match="only PCM"):
        decode_wav(bytes(blob))
    with pytest.raises(ValueError, match="missing fmt"):
        decode_wav(b"RIFF\x04\x00\x00\x00WAVE")


def test_resample_nearest_semantics():
    # 2x upsample of a 4-frame stream duplicates each frame (floor map)
    audio = _audio(8000, 1, 4)
    up = resample_nearest(audio, 16000)
    assert up[0:2] == (16000, 1)
    assert n_frames(up) == 8
    for i in range(8):
        assert up[2][2 * i:2 * i + 2] == audio[2][2 * (i // 2):
                                                  2 * (i // 2) + 2]
    # identity resample is a no-op; stereo frames stay interleaved
    assert resample_nearest(audio, 8000) == audio
    st = _audio(8000, 2, 5)
    down = resample_nearest(st, 4000)
    assert n_frames(down) == 2 and down[1] == 2


def test_window_slices_partition_exhaustively():
    audio = _audio(8000, 2, 11)
    wins = window_slices(audio, 3)
    assert len(wins) == 3
    assert b"".join(wins) == audio[2]
    # frame-aligned: every window is a whole number of 4-byte blocks
    assert all(len(w) % 4 == 0 for w in wins)


def test_audio_features_shape_and_values():
    # constant +8192 mono signal: mean_norm 0.625, rms 0.25, zcr 0;
    # the absent second channel reads as silence (0.5, 0, 0)
    pcm = struct.pack("<4h", 8192, 8192, 8192, 8192)
    f = audio_features((16000, 1, pcm), 8)
    assert len(f) == 8
    assert abs(f[0] - 0.625) < 1e-12
    assert abs(f[1] - 0.25) < 1e-12
    assert f[2] == 0.0
    assert f[3:6] == [0.5, 0.0, 0.0]
    assert abs(f[6] - 16000 / 48000) < 1e-12
    assert abs(f[7] - math.log1p(4) / 20.0) < 1e-12
    # alternating-sign signal has zero-crossing rate 1
    alt = struct.pack("<4h", 1000, -1000, 1000, -1000)
    assert audio_features((8000, 1, alt), 8)[2] == 1.0
    assert all(0.0 <= v <= 1.0 for v in f)


@pytest.mark.slow
def test_spark_stages_real_codec(spark):
    """The three audio stages over real WAV bytes match a row-wise
    pure-Python oracle — same Arrow plumbing as the SQL-certified fake
    mode, real samples."""
    from ftw_crawler_spark.operators import multimodal as mm

    blobs = []
    for i in range(10):
        audio = _audio(8000 * (1 + i % 4), 1 + i % 2, 3 + 17 * i)
        blobs.append((i, encode_wav(audio), audio))
    df = spark.createDataFrame([(i, b) for i, b, _ in blobs],
                               "doc_id long, blob binary")

    meta = {r["doc_id"]: r for r in
            mm.audio_meta(df, codec="real").collect()}
    wins = {(r["doc_id"], r["window_idx"]): r["window_hash"] for r in
            mm.audio_windows(df, n_windows=3, codec="real").collect()}
    feat = {r["doc_id"]: r for r in
            mm.audio_feature_extract(df, codec="real").collect()}
    for i, blob, audio in blobs:
        rate, nch, _pcm = audio
        assert (meta[i]["sample_rate"], meta[i]["n_channels"],
                meta[i]["n_samples"]) == (rate, nch, n_frames(audio))
        assert meta[i]["n_bytes"] == len(blob)
        assert meta[i]["magic"] == "wav"
        for k, pcm in enumerate(window_slices(audio, 3)):
            assert wins[(i, k)] == hashlib.md5(pcm).hexdigest()
        want = audio_features(audio, mm.FEATURE_DIM)
        assert max(abs(a - b) for a, b in
                   zip(feat[i]["feature"], want)) < 1e-12
