"""Pure-stdlib audio codec for the multimodal pipeline's decode hook.

The audio analog of ``functions/imagecodec.py``: the sandbox has no
ffmpeg/soundfile, but canonical PCM WAV is fully expressible with the
standard library, which is enough to run the blob → decode → window →
feature path on REAL audio bytes instead of the deterministic fake:

- **WAV (RIFF/WAVE, PCM format 1, 16-bit)**: chunked container —
  ``fmt `` declares channels/rate/depth, ``data`` carries interleaved
  little-endian s16 frames; unknown chunks (LIST/fact/cue) are skipped,
  odd-sized chunk bodies consume their RIFF pad byte.

The in-memory representation is ``(sample_rate, n_channels, pcm)``
with ``pcm`` = interleaved little-endian int16 frames — the same
(shape-tuple, raw-bytes) convention as the image codec's
``(w, h, pixels)``. An encoder exists so the decoder is pinned by
exact round-trips.

This module is plain Python by design: it runs inside the Arrow-batch
UDFs of ``operators/multimodal.py`` (the codec IS the slow path there)
and in tests/oracles row-wise. A production deployment swaps
ffmpeg/libsndfile into the same ``decode_audio`` seam for
MP3/FLAC/Opus.
"""

from __future__ import annotations

import struct

Audio = tuple  # (sample_rate: int, n_channels: int, pcm: bytes — s16le frames)

_BYTES_PER_SAMPLE = 2


def sniff_audio(blob: bytes) -> str | None:
    """Format name for supported payloads, None otherwise."""
    if blob[:4] == b"RIFF" and blob[8:12] == b"WAVE":
        return "wav"
    return None


def n_frames(audio: Audio) -> int:
    """Per-channel sample (frame) count."""
    rate, nch, pcm = audio
    return len(pcm) // (_BYTES_PER_SAMPLE * nch)


# -- WAV (RIFF, PCM s16le) ----------------------------------------------------

def decode_wav(blob: bytes) -> Audio:
    if sniff_audio(blob) != "wav":
        raise ValueError("wav: bad magic")
    pos = 12
    fmt = None
    data = None
    while pos + 8 <= len(blob):
        cid, size = struct.unpack_from("<4sI", blob, pos)
        body = blob[pos + 8:pos + 8 + size]
        pos += 8 + size + (size & 1)   # odd chunks carry a pad byte
        if cid == b"fmt ":
            if len(body) < 16:
                raise ValueError("wav: truncated fmt chunk")
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            if len(body) < size:
                raise ValueError("wav: truncated data chunk")
            data = body
    if fmt is None or data is None:
        raise ValueError("wav: missing fmt/data chunk")
    audio_format, nch, rate, _brate, _align, depth = fmt
    if audio_format != 1 or depth != 16:
        raise ValueError(f"wav: only PCM s16 (got format={audio_format}, "
                         f"depth={depth})")
    if nch < 1 or rate < 1:
        raise ValueError("wav: bad channel count / sample rate")
    block = _BYTES_PER_SAMPLE * nch
    usable = len(data) - len(data) % block   # drop a torn trailing frame
    return (rate, nch, bytes(data[:usable]))


def encode_wav(audio: Audio, extra_chunks=()) -> bytes:
    """``extra_chunks``: optional (id, body) pairs inserted before
    ``data`` — lets tests pin that decode skips LIST/fact noise and
    honors the RIFF odd-size pad rule on genuine streams."""
    rate, nch, pcm = audio
    block = _BYTES_PER_SAMPLE * nch
    fmt = struct.pack("<HHIIHH", 1, nch, rate, rate * block, block, 16)
    chunks = [b"fmt " + struct.pack("<I", len(fmt)) + fmt]
    for cid, body in extra_chunks:
        chunks.append(cid + struct.pack("<I", len(body)) + body
                      + (b"\x00" if len(body) & 1 else b""))
    chunks.append(b"data" + struct.pack("<I", len(pcm)) + pcm
                  + (b"\x00" if len(pcm) & 1 else b""))
    body = b"WAVE" + b"".join(chunks)
    return b"RIFF" + struct.pack("<I", len(body)) + body


# -- dispatch + transforms -----------------------------------------------------

def decode_audio(blob: bytes) -> Audio:
    """(sample_rate, n_channels, s16le frames) for any supported
    format."""
    if sniff_audio(blob) == "wav":
        return decode_wav(blob)
    raise ValueError(
        "unsupported audio payload (stdlib codec handles PCM s16 WAV; "
        "swap ffmpeg/libsndfile into this seam for MP3/FLAC/Opus)")


def resample_nearest(audio: Audio, out_rate: int) -> Audio:
    """Nearest-neighbor (zero-order hold) resample to ``out_rate`` —
    the audio analog of ``imagecodec.resize_nearest``: floor frame
    mapping, deterministic, dependency-free."""
    rate, nch, pcm = audio
    n = n_frames(audio)
    out_n = max(1, (n * out_rate) // rate) if n else 0
    block = _BYTES_PER_SAMPLE * nch
    out = bytearray(block * out_n)
    for i in range(out_n):
        src = min(n - 1, (i * n) // out_n)
        out[block * i:block * (i + 1)] = pcm[block * src:block * (src + 1)]
    return (out_rate, nch, bytes(out))


def window_slices(audio: Audio, n_windows: int) -> list:
    """``n_windows`` contiguous near-equal frame windows (boundaries at
    ``k·n // n_windows`` — frame-aligned, exhaustive, deterministic):
    the audio analog of video frame sampling. Returns the windows'
    interleaved s16le bytes."""
    rate, nch, pcm = audio
    n = n_frames(audio)
    block = _BYTES_PER_SAMPLE * nch
    bounds = [(k * n) // n_windows for k in range(n_windows + 1)]
    return [pcm[block * bounds[k]:block * bounds[k + 1]]
            for k in range(n_windows)]


def audio_features(audio: Audio, dim: int = 8) -> list:
    """Deterministic ``dim``-component descriptor of real samples with
    a FIXED layout: two channel blocks of (normalized mean, RMS,
    zero-crossing rate) — a channel that is absent (mono) or empty
    reads as silence (0.5, 0, 0) — then normalized rate and
    log-duration: 8 components, the shape a learned audio encoder's
    output occupies, computed without one. All lie in [0, 1]."""
    import math
    rate, nch, pcm = audio
    n = n_frames(audio)
    feats = []
    for c in range(2):
        if c >= nch or n == 0:
            feats += [0.5, 0.0, 0.0]
            continue
        ch = [struct.unpack_from("<h", pcm, _BYTES_PER_SAMPLE
                                 * (i * nch + c))[0] for i in range(n)]
        mean = sum(ch) / n
        rms = math.sqrt(sum(s * s for s in ch) / n)
        zc = sum(1 for a, b in zip(ch, ch[1:])
                 if (a < 0) != (b < 0)) / max(1, n - 1)
        feats += [(mean / 32768.0 + 1.0) / 2.0, rms / 32768.0, zc]
    feats.append(min(1.0, rate / 48000.0))
    feats.append(min(1.0, math.log1p(n) / 20.0))
    return (feats + [0.0] * dim)[:dim]
