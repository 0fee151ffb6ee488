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

__all__ = ["FakeDecoder", "LibraryDecoder", "MediaFeatures", "media_features",
           "resize_media", "sample_frames", "AudioFeatures", "audio_features"]


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


def resize_media(ds, payload_column: str = "payload", id_column: str = "doc_id",
                 out_height: int = 4, out_width: int = 4,
                 concurrency=(1, 4), batch_size: int = 32):
    """Actor-pool resize stage: decode → block-mean downsample → re-encoded
    bytes + typed dims. The resample math is real (numpy block mean); only
    the codec boundary is the pluggable decoder."""

    class _Resizer:
        def __init__(self) -> None:
            self._decoder = FakeDecoder()

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            outs = []
            for payload in df[payload_column]:
                img = self._decoder.decode(bytes(payload))
                h, w = img.shape
                bh, bw = max(1, h // out_height), max(1, w // out_width)
                resized = (
                    img[: out_height * bh, : out_width * bw]
                    .reshape(out_height, bh, out_width, bw)
                    .mean(axis=(1, 3))
                    .astype(np.uint8)
                )
                outs.append(resized.tobytes())
            return pd.DataFrame({
                id_column: df[id_column],
                "payload": outs,
                "height": np.full(len(df), out_height, dtype=np.int64),
                "width": np.full(len(df), out_width, dtype=np.int64),
            })

    return ds.map_batches(_Resizer, batch_format="pandas",
                          concurrency=concurrency, batch_size=batch_size)


def sample_frames(ds, payload_column: str = "payload", id_column: str = "doc_id",
                  n_frames_column: str = "n_frames", every: int = 4,
                  concurrency=(1, 4), batch_size: int = 16):
    """Frame-sampling stage for video-like payloads: one input row → one
    OUTPUT ROW PER SAMPLED FRAME (row-expanding ``map_batches``). The fake
    "video" is frame-seeded fake decodes; a real ffmpeg seek slots into the
    same per-frame decode call. Batches stay small — each input row fans
    out ``n_frames/every`` rows of frame payload."""

    class _Sampler:
        def __init__(self) -> None:
            self._decoder = FakeDecoder()

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            ids, fnos, frames = [], [], []
            for doc_id, payload, n_frames in zip(
                df[id_column], df[payload_column], df[n_frames_column]
            ):
                for fno in range(0, int(n_frames), every):
                    frame = self._decoder.decode(
                        bytes(payload) + fno.to_bytes(4, "big")
                    )
                    ids.append(doc_id)
                    fnos.append(fno)
                    frames.append(frame.tobytes())
            return pd.DataFrame({
                id_column: pd.Series(ids, dtype=df[id_column].dtype),
                "frame_no": pd.Series(fnos, dtype="int64"),
                "frame": frames,
            })

    return ds.map_batches(_Sampler, batch_format="pandas",
                          concurrency=concurrency, batch_size=batch_size)


class AudioFeatures:
    """Actor-pool audio stage: payload → fake waveform (deterministic, the
    codec stand-in) → real DSP features (RMS, zero-crossing rate),
    vectorized numpy per item."""

    def __init__(self, payload_column: str = "payload", id_column: str = "doc_id",
                 n_samples: int = 1024) -> None:
        self._payload = payload_column
        self._id = id_column
        self._n = n_samples
        self._decoder = FakeDecoder(height=1, width=n_samples)

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        rms, zcr = [], []
        for payload in df[self._payload]:
            wave = self._decoder.decode(bytes(payload)).astype(np.float64).ravel()
            wave = (wave - 127.5) / 127.5  # [-1, 1]
            rms.append(float(np.sqrt((wave ** 2).mean())))
            zcr.append(float((np.signbit(wave[1:]) != np.signbit(wave[:-1])).mean()))
        return pd.DataFrame({
            self._id: df[self._id],
            "rms": np.round(rms, 4),
            "zcr": np.round(zcr, 4),
        })


def audio_features(ds, payload_column: str = "payload", id_column: str = "doc_id",
                   concurrency=(1, 4), batch_size: int = 32):
    return ds.map_batches(
        AudioFeatures,
        fn_constructor_kwargs=dict(payload_column=payload_column, id_column=id_column),
        batch_format="pandas",
        concurrency=concurrency,
        batch_size=batch_size,
    )
