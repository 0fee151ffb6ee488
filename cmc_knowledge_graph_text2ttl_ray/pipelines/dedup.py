"""Deduplication family over the ``documents`` table — exact, MinHash+LSH,
SimHash, and exact n-gram-Jaccard verification. First-class engine
components for training-data pipelines.

Scale shapes:

- **exact**: hash(text) → groupby(hash).min(doc_id). The only shuffle moves
  (hash, doc_id) pairs, never text.
- **MinHash+LSH**: signatures are computed vectorized per batch (one base
  hash per shingle + k universal-hash transforms), banded, and only
  (band_key, doc_id, signature) rows are shuffled; candidate pairs are
  generated per LSH bucket and verified by signature similarity. No O(n²)
  anywhere; bucket skew is bounded because identical band-hashes imply
  near-identical docs.
- **SimHash**: 64-bit signatures; near-dup candidates via 4×16-bit band
  exact-match buckets (Hamming ≤ 3 ⇒ at least one band matches by
  pigeonhole for 4 bands).
"""

from __future__ import annotations

import hashlib
import itertools

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

__all__ = [
    "exact_dedup",
    "minhash_signatures",
    "minhash_lsh_pairs",
    "simhash_signatures",
    "simhash_near_dup_pairs",
    "ngram_jaccard_verify",
]

_MERSENNE = (1 << 61) - 1


def _docs(sf_dir: str, columns=None):
    return ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=columns)


def exact_dedup(sf_dir: str):
    """(text_hash, doc_id) with the smallest doc_id per identical text."""
    ds = _docs(sf_dir, columns=["doc_id", "text"])

    def hash_batch(df: pd.DataFrame) -> pd.DataFrame:
        h = df["text"].map(lambda s: hashlib.md5(s.encode("utf-8")).hexdigest())
        out = pd.DataFrame({"text_hash": h, "doc_id": df["doc_id"]})
        # per-block combiner: keep min doc_id per hash before the shuffle
        return out.groupby("text_hash", as_index=False).min()

    from ray.data.aggregate import Min

    return (
        ds.map_batches(hash_batch, batch_format="pandas")
        .groupby("text_hash")
        .aggregate(Min("doc_id", alias_name="doc_id"))
    )


def _shingles(text: str, n: int) -> list[str]:
    toks = text.split()
    if len(toks) < n:
        return [" ".join(toks)] if toks else []
    return [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]


def _hash_params(num_perm: int, seed: int = 7) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.RandomState(seed)  # fixed seed → deterministic engine-wide
    a = rng.randint(1, _MERSENNE, size=num_perm, dtype=np.uint64)
    b = rng.randint(0, _MERSENNE, size=num_perm, dtype=np.uint64)
    return a, b


def _minhash_one(text: str, n: int, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    sh = _shingles(text, n)
    if not sh:
        return np.full(len(a), _MERSENNE, dtype=np.uint64)
    # vectorized 64-bit shingle hashes (pandas siphash — deterministic,
    # fixed key, ~5× faster than per-shingle blake2b)
    base = pd.util.hash_array(np.array(sh, dtype=object))
    # k universal hashes of all shingles at once: (k, |sh|) matrix min-reduced
    vals = (np.outer(a, base) + b[:, None]) % np.uint64(_MERSENNE)
    return vals.min(axis=1)


class _MinHasher:
    """Actor: hash params built once, signatures per batch."""

    def __init__(self, num_perm: int, shingle: int) -> None:
        self._a, self._b = _hash_params(num_perm)
        self._n = shingle

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        sigs = [ _minhash_one(t, self._n, self._a, self._b) for t in df["text"] ]
        return pd.DataFrame(
            {"doc_id": df["doc_id"], "sig": [s.tolist() for s in sigs]}
        )


def minhash_signatures(sf_dir: str, num_perm: int = 64, shingle: int = 2,
                       concurrency=(1, 4)):
    ds = _docs(sf_dir, columns=["doc_id", "text"])
    return ds.map_batches(
        _MinHasher,
        fn_constructor_kwargs=dict(num_perm=num_perm, shingle=shingle),
        batch_format="pandas",
        concurrency=concurrency,
    )


def minhash_lsh_pairs(
    sf_dir: str,
    num_perm: int = 64,
    shingle: int = 2,
    bands: int = 16,
    threshold: float = 0.7,
    concurrency=(1, 4),
):
    """Near-duplicate pairs (doc_a < doc_b, est_jaccard ≥ threshold)."""
    rows_per_band = num_perm // bands
    sigs = minhash_signatures(sf_dir, num_perm, shingle, concurrency)

    band_a, band_b = _hash_params(rows_per_band, seed=23)

    def bandify(df: pd.DataFrame) -> pd.DataFrame:
        # fully vectorized banding: (n, bands, r) tensor × weight vector →
        # one integer band hash per (doc, band); no per-row Python loop
        mat = np.stack([np.asarray(s, dtype=np.uint64) for s in df["sig"]])
        n = len(mat)
        tensor = mat.reshape(n, bands, rows_per_band)
        keys = (tensor * band_a + band_b) % np.uint64(_MERSENNE)
        band_hash = keys.sum(axis=2, dtype=np.uint64)  # (n, bands)
        band_ids = np.tile(np.arange(bands, dtype=np.uint64), n)
        return pd.DataFrame(
            {
                "band_key": [f"{b}:{h}" for b, h in zip(band_ids, band_hash.ravel())],
                "doc_id": np.repeat(df["doc_id"].to_numpy(), bands),
                "sig": [s for s in df["sig"] for _ in range(bands)],
            }
        )

    banded = sigs.map_batches(bandify, batch_format="pandas")

    def bucket_pairs(group: pd.DataFrame) -> pd.DataFrame:
        if len(group) < 2:
            return pd.DataFrame({"doc_a": [], "doc_b": [], "est_jaccard": []})
        group = group.sort_values("doc_id")
        recs = list(zip(group["doc_id"], group["sig"]))
        out = []
        for (da, sa), (db, sb) in itertools.combinations(recs, 2):
            if da == db:
                continue
            est = float(np.mean(np.asarray(sa) == np.asarray(sb)))
            if est >= threshold:
                out.append((int(da), int(db), round(est, 4)))
        return pd.DataFrame(out, columns=["doc_a", "doc_b", "est_jaccard"])

    pairs = banded.groupby("band_key").map_groups(bucket_pairs, batch_format="pandas")
    # a pair can surface from several bands → dedup on (doc_a, doc_b)
    from ray.data.aggregate import Max

    return pairs.groupby(["doc_a", "doc_b"]).aggregate(
        Max("est_jaccard", alias_name="est_jaccard")
    )


def _simhash_one(text: str) -> int:
    toks = text.split()
    if not toks:
        return 0
    uniq, counts = np.unique(np.array(toks, dtype=object), return_counts=True)
    hashes = pd.util.hash_array(uniq)  # vectorized deterministic 64-bit
    bits = ((hashes[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1)).astype(np.int64)
    weighted = ((bits * 2 - 1) * counts[:, None]).sum(axis=0)
    return int(((weighted > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)).sum())


def simhash_signatures(sf_dir: str):
    ds = _docs(sf_dir, columns=["doc_id", "text"])

    def sh(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"doc_id": df["doc_id"],
             "simhash64": df["text"].map(_simhash_one).astype("uint64")}
        )

    return ds.map_batches(sh, batch_format="pandas")


def simhash_near_dup_pairs(sf_dir: str, max_hamming: int = 3):
    """Hamming-≤k pairs via 4×16-bit band buckets (pigeonhole: ≤3 differing
    bits ⇒ at least one of 4 bands identical)."""
    sigs = simhash_signatures(sf_dir)

    def bandify(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for doc_id, h in zip(df["doc_id"], df["simhash64"]):
            h = int(h)
            for bi in range(4):
                chunk = (h >> (bi * 16)) & 0xFFFF
                rows.append((f"{bi}:{chunk}", int(doc_id), h))
        return pd.DataFrame(rows, columns=["band_key", "doc_id", "simhash64"])

    banded = sigs.map_batches(bandify, batch_format="pandas")

    def bucket_pairs(group: pd.DataFrame) -> pd.DataFrame:
        if len(group) < 2:
            return pd.DataFrame({"doc_a": [], "doc_b": [], "hamming": []})
        group = group.sort_values("doc_id")
        recs = list(zip(group["doc_id"], group["simhash64"]))
        out = []
        for (da, ha), (db, hb) in itertools.combinations(recs, 2):
            if da == db:
                continue
            d = bin(int(ha) ^ int(hb)).count("1")
            if d <= max_hamming:
                out.append((int(da), int(db), d))
        return pd.DataFrame(out, columns=["doc_a", "doc_b", "hamming"])

    pairs = banded.groupby("band_key").map_groups(bucket_pairs, batch_format="pandas")
    from ray.data.aggregate import Min

    return pairs.groupby(["doc_a", "doc_b"]).aggregate(Min("hamming", alias_name="hamming"))


def ngram_jaccard_verify(sf_dir: str, pairs_df: pd.DataFrame, shingle: int = 2):
    """Exact n-gram Jaccard for candidate pairs: texts of ONLY the candidate
    docs are fetched once (broadcast dict), pairs verified vectorized-ish."""
    if pairs_df.empty:
        return pairs_df.assign(jaccard=pd.Series(dtype=float))
    wanted = set(pairs_df["doc_a"]) | set(pairs_df["doc_b"])
    docs = (
        _docs(sf_dir, columns=["doc_id", "text"])
        .map_batches(
            lambda df: df[df["doc_id"].isin(wanted)], batch_format="pandas"
        )
        .to_pandas()
    )
    texts = dict(zip(docs["doc_id"], docs["text"]))
    out = []
    for r in pairs_df.itertuples():
        sa, sb = set(_shingles(texts[r.doc_a], shingle)), set(_shingles(texts[r.doc_b], shingle))
        union = len(sa | sb)
        out.append(round(len(sa & sb) / union, 4) if union else 0.0)
    return pairs_df.assign(jaccard=out)
