"""Multimodal column stages: decode / feature-extract over opaque ``binary``
payload columns.

The decode kernel is pluggable. REAL decoders (pure Python, round-3):
``PngDecoder`` (8-bit gray/RGB/RGBA PNG via ``functions/png.py``) and the
WAV path in ``AudioFeatures`` (RIFF PCM via ``functions/wav.py``) — an
``AutoDecoder`` sniffs the payload and routes PNG → real decode, anything
else → the deterministic ``FakeDecoder`` stand-in (content-hash → uint8
grid), so mixed corpora keep streaming. ``LibraryDecoder`` remains the
clearly-marked stub for codecs this container can't provide (JPEG/video).
Everything around the decode — schema handling, actor-pool stage shape,
small batch sizes for large payloads, output layout — is real and tested.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

__all__ = ["FakeDecoder", "PngDecoder", "AutoDecoder", "LibraryDecoder",
           "MediaFeatures", "media_features", "resize_media",
           "sample_frames", "AudioFeatures", "audio_features",
           "media_phash_near_dups"]


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


class PngDecoder:
    """REAL image decode: 8-bit PNG → (h, w) uint8 luma grid
    (``functions/png.py`` — pure Python, all five scanline filters)."""

    def decode(self, payload: bytes) -> np.ndarray:
        from cmc_knowledge_graph_text2ttl_ray.functions.png import decode_png_gray

        return decode_png_gray(bytes(payload))


class AutoDecoder:
    """Sniffing decoder: PNG payloads decode for real, anything else falls
    back to the deterministic stand-in so mixed corpora keep streaming."""

    def __init__(self, height: int = 8, width: int = 8) -> None:
        self._png = PngDecoder()
        self._fake = FakeDecoder(height, width)

    def decode(self, payload: bytes) -> np.ndarray:
        b = bytes(payload)
        if b.startswith(b"\x89PNG\r\n\x1a\n"):
            from cmc_knowledge_graph_text2ttl_ray.functions.png import PngError

            try:
                return self._png.decode(b)
            except PngError:
                # unsupported PNG variant (palette/interlaced/16-bit) or a
                # corrupt file: fall back so mixed corpora keep streaming
                return self._fake.decode(b)
        return self._fake.decode(b)


class LibraryDecoder:
    """Stub for a real codec-backed decoder (PIL / ffmpeg)."""

    def __init__(self, *args, **kwargs) -> None:
        raise NotImplementedError(
            "Image/audio codec libraries are not available in this environment; "
            "use FakeDecoder for plumbing tests or install a codec and implement "
            "decode() here."
        )


def _block_mean_resize(img: np.ndarray, oh: int, ow: int) -> np.ndarray:
    """Bin-edge block-mean resize that handles ANY input size (including
    images smaller than the target — real decoders produce arbitrary
    dims, unlike the fixed-grid stand-in): each output cell averages its
    [linspace] bin, bins never being empty."""
    h, w = img.shape
    ys = np.linspace(0, h, oh + 1).astype(np.int64)
    xs = np.linspace(0, w, ow + 1).astype(np.int64)
    out = np.empty((oh, ow), dtype=np.uint8)
    for i in range(oh):
        y0, y1 = ys[i], max(ys[i + 1], ys[i] + 1)
        y0 = min(y0, h - 1)
        for j in range(ow):
            x0, x1 = xs[j], max(xs[j + 1], xs[j] + 1)
            x0 = min(x0, w - 1)
            out[i, j] = int(img[y0:y1, x0:x1].mean())
    return out


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
        self._decoder = decoder or AutoDecoder()

    @staticmethod
    def _phash(img: np.ndarray) -> int:
        """64-bit perceptual hash: block-mean the image to 8×8 (whatever its
        true size), then above/below-mean bits."""
        h, w = img.shape
        ro, co = min(8, h), min(8, w)
        bh, bw = h // ro, w // co
        small = (img[: ro * bh, : co * bw]
                 .reshape(ro, bh, co, bw).mean(axis=(1, 3)))
        bits = (small.flatten() > small.mean()).astype(np.uint64)
        return int((bits << np.arange(len(bits), dtype=np.uint64)).sum()
                   & np.uint64(0x7FFF_FFFF_FFFF_FFFF))

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        means, stds, phashes = [], [], []
        for payload in df[self._payload]:
            img = self._decoder.decode(bytes(payload))
            means.append(float(img.mean()))
            stds.append(float(img.std()))
            phashes.append(self._phash(img))
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
            self._decoder = AutoDecoder()

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            outs = []
            for payload in df[payload_column]:
                img = self._decoder.decode(bytes(payload))
                outs.append(_block_mean_resize(img, out_height, out_width)
                            .tobytes())
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
            b = bytes(payload)
            wave = None
            if b[:4] == b"RIFF" and b[8:12] == b"WAVE":
                # REAL decode: RIFF PCM via functions/wav.py; unsupported
                # variants (float/24-bit) fall back to the stand-in
                from cmc_knowledge_graph_text2ttl_ray.functions.wav import (
                    WavError,
                    decode_wav,
                )

                try:
                    wave, _sr = decode_wav(b)
                except WavError:
                    wave = None
            if wave is None:
                wave = self._decoder.decode(b).astype(np.float64).ravel()
                wave = (wave - 127.5) / 127.5  # [-1, 1]
            rms.append(float(np.sqrt((wave ** 2).mean())) if len(wave) else 0.0)
            zcr.append(float((np.signbit(wave[1:]) != np.signbit(wave[:-1])).mean())
                       if len(wave) > 1 else 0.0)
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


def media_phash_near_dups(ds, payload_column: str = "payload",
                          id_column: str = "doc_id", max_hamming: int = 3,
                          concurrency=(1, 4), batch_size: int = 32,
                          n_rows_hint: int | None = None):
    """Image near-duplicate pairs by perceptual hash: decode → 64-bit
    block-mean pHash (one actor-pool pass, :class:`MediaFeatures`) →
    Hamming-≤k banding (``dedup.hamming64_near_dup_pairs``). The dedup
    exchange moves only (band_key, id, phash) rows — payload bytes never
    shuffle, which is the entire point for image corpora where a row is
    megabytes but its signature is 8 bytes. Returns (doc_a, doc_b,
    hamming)."""
    from cmc_knowledge_graph_text2ttl_ray.pipelines.dedup import (
        hamming64_near_dup_pairs,
    )

    feats = media_features(ds, payload_column=payload_column,
                           id_column=id_column, concurrency=concurrency,
                           batch_size=batch_size)
    sigs = feats.map_batches(
        lambda df: pd.DataFrame({
            id_column: df[id_column],
            "phash": df["phash"].astype("uint64")}),
        batch_format="pandas")
    return hamming64_near_dup_pairs(sigs, id_column, "phash",
                                    max_hamming=max_hamming,
                                    n_rows_hint=n_rows_hint)
