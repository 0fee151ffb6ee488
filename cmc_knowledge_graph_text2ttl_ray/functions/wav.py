"""Minimal WAV (RIFF PCM) decoder — real audio decode with zero native
dependencies (public RIFF/WAVE format).

Supports PCM (format tag 1) at 8-bit unsigned and 16-bit signed, any
channel count (channels are averaged to mono). Returns a float64 waveform
in [-1, 1] plus the sample rate; malformed input raises :class:`WavError`.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["WavError", "decode_wav"]


class WavError(Exception):
    pass


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise WavError("Not a RIFF/WAVE file")
    pos = 12
    fmt = None
    pcm = None
    while pos + 8 <= len(data):
        cid = data[pos:pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4:pos + 8])
        body = data[pos + 8:pos + 8 + size]
        if cid == b"fmt ":
            if len(body) < 16:
                raise WavError("Truncated fmt chunk")
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            pcm = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or pcm is None:
        raise WavError("Missing fmt or data chunk")
    tag, n_channels, sample_rate, _brate, _align, bits = fmt
    if tag != 1:
        raise WavError(f"Only PCM (tag 1) supported, got {tag}")
    if n_channels < 1:
        raise WavError("Zero channels")
    if bits == 16:
        samples = np.frombuffer(pcm[: len(pcm) - len(pcm) % 2],
                                dtype="<i2").astype(np.float64) / 32768.0
    elif bits == 8:
        samples = (np.frombuffer(pcm, dtype=np.uint8).astype(np.float64)
                   - 128.0) / 128.0
    else:
        raise WavError(f"Unsupported bit depth {bits} (8/16 only)")
    usable = len(samples) - len(samples) % n_channels
    wave = samples[:usable].reshape(-1, n_channels).mean(axis=1)
    return wave, sample_rate
