"""Pure-Python PNG/WAV decoders + their multimodal-stage wiring.

The encoders here are written independently from the decoders (straight
from the public specs) so the round-trips are a real check, not a mirror.
"""

import struct
import zlib

import numpy as np
import pytest


def _chunk(ctype: bytes, body: bytes) -> bytes:
    return (struct.pack(">I", len(body)) + ctype + body
            + struct.pack(">I", zlib.crc32(ctype + body)))


def encode_png(img: np.ndarray, filters=None) -> bytes:
    """Independent minimal PNG writer; ``filters`` picks the per-row
    scanline filter (default 0/None)."""
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, c = img.shape
    color = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    bpp = c
    raw = bytearray()
    prev = np.zeros(w * c, dtype=np.int64)
    for y in range(h):
        row = img[y].reshape(-1).astype(np.int64)
        f = filters[y] if filters else 0
        raw.append(f)
        if f == 0:
            enc = row
        elif f == 1:      # Sub
            left = np.concatenate([np.zeros(bpp, dtype=np.int64), row[:-bpp]])
            enc = (row - left) % 256
        elif f == 2:      # Up
            enc = (row - prev) % 256
        elif f == 3:      # Average
            enc = np.empty_like(row)
            for x in range(len(row)):
                left = row[x - bpp] if x >= bpp else 0
                enc[x] = (row[x] - (left + prev[x]) // 2) % 256
        elif f == 4:      # Paeth
            enc = np.empty_like(row)
            for x in range(len(row)):
                a = row[x - bpp] if x >= bpp else 0
                b = prev[x]
                cc = prev[x - bpp] if x >= bpp else 0
                p = a + b - cc
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else cc)
                enc[x] = (row[x] - pred) % 256
        raw += bytes(enc.astype(np.uint8))
        prev = row
    return (b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(bytes(raw)))
            + _chunk(b"IEND", b""))


def encode_wav(wave: np.ndarray, rate: int = 8000, bits: int = 16,
               channels: int = 1) -> bytes:
    if bits == 16:
        pcm = (np.clip(wave, -1, 1) * 32767).astype("<i2").tobytes()
    else:
        pcm = ((np.clip(wave, -1, 1) * 127) + 128).astype(np.uint8).tobytes()
    block = channels * bits // 8
    fmt = struct.pack("<HHIIHH", 1, channels, rate, rate * block, block, bits)
    return (b"RIFF" + struct.pack("<I", 36 + len(pcm)) + b"WAVE"
            + b"fmt " + struct.pack("<I", 16) + fmt
            + b"data" + struct.pack("<I", len(pcm)) + pcm)


@pytest.mark.parametrize("channels", [1, 2, 3, 4])
def test_png_roundtrip_all_color_types(channels):
    from cmc_knowledge_graph_text2ttl_ray.functions.png import decode_png

    rng = np.random.RandomState(7)
    img = rng.randint(0, 256, size=(11, 13, channels), dtype=np.uint8)
    out = decode_png(encode_png(img))
    assert out.shape == img.shape
    assert (out == img).all()


def test_png_all_five_filters_reconstruct():
    from cmc_knowledge_graph_text2ttl_ray.functions.png import decode_png

    rng = np.random.RandomState(3)
    img = rng.randint(0, 256, size=(10, 9, 3), dtype=np.uint8)
    filters = [0, 1, 2, 3, 4, 4, 3, 2, 1, 0]
    out = decode_png(encode_png(img, filters=filters))
    assert (out == img).all()


def test_png_gray_luma_and_errors():
    from cmc_knowledge_graph_text2ttl_ray.functions.png import (
        PngError,
        decode_png_gray,
    )

    img = np.zeros((4, 4, 3), dtype=np.uint8)
    img[:, :, 1] = 255  # pure green
    gray = decode_png_gray(encode_png(img))
    assert gray.shape == (4, 4)
    assert int(gray[0, 0]) == 149  # 587*255//1000
    with pytest.raises(PngError):
        decode_png_gray(b"not a png")
    # truncated IDAT
    good = encode_png(img)
    with pytest.raises(PngError):
        decode_png_gray(good[:40])


def test_wav_roundtrip_and_stereo_downmix():
    from cmc_knowledge_graph_text2ttl_ray.functions.wav import WavError, decode_wav

    t = np.linspace(0, 1, 800, endpoint=False)
    wave = np.sin(2 * np.pi * 5 * t)
    out, rate = decode_wav(encode_wav(wave, rate=8000, bits=16))
    assert rate == 8000
    assert np.abs(out - wave).max() < 1e-3
    # 8-bit
    out8, _ = decode_wav(encode_wav(wave, bits=8))
    assert np.abs(out8 - wave).max() < 0.02
    # stereo downmix: L = wave, R = -wave → silence
    stereo = np.empty(1600)
    stereo[0::2] = wave
    stereo[1::2] = -wave
    pcm = (np.clip(stereo, -1, 1) * 32767).astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, 2, 8000, 32000, 4, 16)
    blob = (b"RIFF" + struct.pack("<I", 36 + len(pcm)) + b"WAVE"
            + b"fmt " + struct.pack("<I", 16) + fmt
            + b"data" + struct.pack("<I", len(pcm)) + pcm)
    mixed, _ = decode_wav(blob)
    assert np.abs(mixed).max() < 1e-3
    with pytest.raises(WavError):
        decode_wav(b"RIFFxxxxNOPE")


def test_media_features_real_png_through_stage(ray_session):
    """AutoDecoder routes PNG payloads to the REAL decoder inside the Ray
    actor stage: a bright and a dark image must order by mean intensity."""
    import pyarrow as pa
    import ray.data

    from cmc_knowledge_graph_text2ttl_ray.stages.multimodal import media_features

    bright = np.full((16, 16), 230, dtype=np.uint8)
    dark = np.full((16, 16), 20, dtype=np.uint8)
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "payload": pa.array([encode_png(bright), encode_png(dark)], pa.binary()),
    }))
    out = media_features(ds, concurrency=(1, 2)).to_pandas().sort_values("doc_id")
    assert abs(out["mean_intensity"].iloc[0] - 230.0) < 0.01
    assert abs(out["mean_intensity"].iloc[1] - 20.0) < 0.01


def test_audio_features_real_wav_through_stage(ray_session):
    """RIFF payloads decode for real: a sine and near-silence must order by
    RMS, and the sine's ZCR matches its frequency."""
    import pyarrow as pa
    import ray.data

    from cmc_knowledge_graph_text2ttl_ray.stages.multimodal import audio_features

    t = np.linspace(0, 1, 1000, endpoint=False)
    sine = encode_wav(np.sin(2 * np.pi * 10 * t))
    quiet = encode_wav(np.full(1000, 1e-4))
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "payload": pa.array([sine, quiet], pa.binary()),
    }))
    out = audio_features(ds, concurrency=(1, 2)).to_pandas().sort_values("doc_id")
    assert abs(out["rms"].iloc[0] - 0.7071) < 0.01
    assert out["rms"].iloc[1] < 0.001
    assert abs(out["zcr"].iloc[0] - 0.02) < 0.005  # 10 Hz → 20 crossings/1000


def test_png_wav_never_crash_on_fuzz():
    """Codec contract: arbitrary bytes raise PngError/WavError or decode —
    never an unhandled exception."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from cmc_knowledge_graph_text2ttl_ray.functions.png import PngError, decode_png
    from cmc_knowledge_graph_text2ttl_ray.functions.wav import WavError, decode_wav

    @given(st.binary(max_size=300))
    @settings(max_examples=300, deadline=None)
    def run(payload):
        for prefix in (b"", b"\x89PNG\r\n\x1a\n", b"RIFF\x24\x00\x00\x00WAVE"):
            blob = prefix + payload
            try:
                decode_png(blob)
            except PngError:
                pass
            try:
                decode_wav(blob)
            except WavError:
                pass

    run()


def test_auto_decoder_falls_back_on_unsupported_png_and_small_resize(ray_session):
    """Round-3 review: unsupported PNG variants fall back to the stand-in
    instead of crashing the stage, and resize handles images SMALLER than
    the target dims."""
    import struct
    import pyarrow as pa
    import ray.data

    from cmc_knowledge_graph_text2ttl_ray.stages.multimodal import (
        AutoDecoder,
        media_features,
        resize_media,
    )

    # 16-bit PNG header (unsupported depth) — valid signature, bad variant
    ihdr = struct.pack(">IIBBBBB", 4, 4, 16, 0, 0, 0, 0)
    bad_png = (b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", ihdr)
               + _chunk(b"IEND", b""))
    out = AutoDecoder().decode(bad_png)
    assert out.shape == (8, 8)  # fake fallback

    tiny = np.arange(9, dtype=np.uint8).reshape(3, 3)
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "payload": pa.array([encode_png(tiny), bad_png], pa.binary()),
    }))
    rs = resize_media(ds, out_height=4, out_width=4,
                      concurrency=(1, 2)).to_pandas()
    assert len(rs) == 2 and all(len(b) == 16 for b in rs["payload"])
    feats = media_features(ds, concurrency=(1, 2)).to_pandas()
    assert len(feats) == 2 and feats["mean_intensity"].notna().all()


def test_audio_features_unsupported_wav_falls_back(ray_session):
    """IEEE-float WAV (tag 3) routes to the stand-in, not a crash."""
    import struct
    import pyarrow as pa
    import ray.data

    from cmc_knowledge_graph_text2ttl_ray.stages.multimodal import audio_features

    fmt = struct.pack("<HHIIHH", 3, 1, 8000, 32000, 4, 32)  # IEEE float
    blob = (b"RIFF" + struct.pack("<I", 36) + b"WAVE"
            + b"fmt " + struct.pack("<I", 16) + fmt
            + b"data" + struct.pack("<I", 0))
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([1], pa.int64()),
        "payload": pa.array([blob], pa.binary()),
    }))
    out = audio_features(ds, concurrency=(1, 2)).to_pandas()
    assert len(out) == 1 and float(out["rms"].iloc[0]) > 0  # fake waveform
