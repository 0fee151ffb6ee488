"""Multimodal column stages: decode / feature-extract over opaque ``binary``
payload columns.

Real image/audio codecs are not available in this container, so the decode
kernel is pluggable: the default ``FakeDecoder`` is a deterministic stand-in
(content-hash → fixed-size uint8 "pixel" grid) and ``LibraryDecoder`` is the
clearly-marked stub that would wrap PIL/ffmpeg. Everything around the decode
— schema handling, actor-pool stage shape, small batch sizes for large
payloads, output layout — is real and tested, so swapping in a codec later
is a one-class change.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

__all__ = ["FakeDecoder", "LibraryDecoder", "MediaFeatures", "media_features"]


class FakeDecoder:
    """Deterministic fake decode: bytes → (h, w) uint8 grid from a blake2b
    stream. Stands in for a real image decode with identical plumbing."""

    def __init__(self, height: int = 8, width: int = 8) -> None:
        self.shape = (height, width)

    def decode(self, payload: bytes) -> np.ndarray:
        n = self.shape[0] * self.shape[1]
        out = bytearray()
        counter = 0
        while len(out) < n:
            out += hashlib.blake2b(payload + counter.to_bytes(4, "big"), digest_size=32).digest()
            counter += 1
        return np.frombuffer(bytes(out[:n]), dtype=np.uint8).reshape(self.shape)


class LibraryDecoder:
    """Stub for a real codec-backed decoder (PIL / ffmpeg)."""

    def __init__(self, *args, **kwargs) -> None:
        raise NotImplementedError(
            "Image/audio codec libraries are not available in this environment; "
            "use FakeDecoder for plumbing tests or install a codec and implement "
            "decode() here."
        )


class MediaFeatures:
    """Actor-pool stage: binary payload column → per-item features.

    Decoder is constructed ONCE per actor (the expensive part for real
    codecs); batches should be small because payload rows are large —
    callers pass ``batch_size`` accordingly.
    """

    def __init__(self, payload_column: str = "payload", id_column: str = "doc_id",
                 decoder=None) -> None:
        self._payload = payload_column
        self._id = id_column
        self._decoder = decoder or FakeDecoder()

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        means, stds, phashes = [], [], []
        for payload in df[self._payload]:
            img = self._decoder.decode(bytes(payload))
            means.append(float(img.mean()))
            stds.append(float(img.std()))
            # perceptual-hash-style bit signature: above/below mean per cell
            bits = (img.flatten() > img.mean()).astype(np.uint64)
            phashes.append(int((bits << np.arange(len(bits), dtype=np.uint64)).sum()
                               & np.uint64(0x7FFF_FFFF_FFFF_FFFF)))
        return pd.DataFrame(
            {
                self._id: df[self._id],
                "mean_intensity": np.round(means, 4),
                "std_intensity": np.round(stds, 4),
                "phash": phashes,
            }
        )


def media_features(ds, payload_column: str = "payload", id_column: str = "doc_id",
                   concurrency=(1, 4), batch_size: int = 32):
    """Dataset with a binary payload column → per-item feature rows."""
    return ds.map_batches(
        MediaFeatures,
        fn_constructor_kwargs=dict(payload_column=payload_column, id_column=id_column),
        batch_format="pandas",
        concurrency=concurrency,
        batch_size=batch_size,
    )
