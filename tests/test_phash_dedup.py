"""Perceptual-hash image near-dup pairs over real PNG payloads."""

import struct
import zlib

import numpy as np
import pandas as pd
import pytest
import ray.data

from cmc_knowledge_graph_text2ttl_ray.stages.multimodal import (
    media_phash_near_dups,
)


def encode_png_gray(img: np.ndarray) -> bytes:
    """Minimal 8-bit grayscale PNG encoder (filter 0 scanlines)."""
    h, w = img.shape

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (struct.pack(">I", len(body)) + tag + body
                + struct.pack(">I", zlib.crc32(tag + body)))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    raw = b"".join(b"\x00" + img[r].astype(np.uint8).tobytes()
                   for r in range(h))
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b""))


@pytest.fixture(scope="module")
def image_ds(ray_session):
    rng = np.random.default_rng(21)
    base = rng.integers(0, 256, (16, 16)).astype(np.uint8)
    near = base.copy()
    near[0, 0] = 255 - near[0, 0]          # tiny change → small hamming
    other = rng.integers(0, 256, (16, 16)).astype(np.uint8)
    rows = pd.DataFrame({
        "doc_id": pd.array([1, 2, 3, 4], dtype="int64"),
        "payload": [encode_png_gray(base), encode_png_gray(near),
                    encode_png_gray(other), encode_png_gray(base)],
    })
    return ray.data.from_pandas(rows).repartition(2)


def test_planted_image_dups_found(image_ds):
    out = media_phash_near_dups(image_ds, max_hamming=3, n_rows_hint=4) \
        .to_pandas().sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
    pairs = set(zip(out["doc_a"], out["doc_b"]))
    assert (1, 4) in pairs            # exact copy: hamming 0
    assert (1, 2) in pairs or (2, 4) in pairs   # one-pixel change
    ham = dict(zip(zip(out["doc_a"], out["doc_b"]), out["hamming"]))
    assert ham[(1, 4)] == 0
    # the unrelated image must not pair with anything
    assert not any(3 in p for p in pairs)
