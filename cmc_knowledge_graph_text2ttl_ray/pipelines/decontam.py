"""Benchmark decontamination over the ``documents`` table.

Training corpora must be screened against evaluation benchmarks before
training; the standard checks are (a) exact passage containment and (b)
token-n-gram overlap (the GPT-3/PaLM-style "13-gram" rule).  The engine
derives a deterministic benchmark set from the corpus itself (every 97th
doc's leading 64 characters) so the operators are exercised — and
oracle-checkable — without external data; ``passages``/``bench_grams``
parameters accept a real benchmark set instead.

Scale shapes:

- benchmark sets are small by nature (10²–10⁵ passages): they are collected
  once from a column-pruned filtered read, broadcast via ``ray.put``, and
  every worker scans its batches against them — the corpus itself never
  shuffles.
- :func:`contains_benchmark` is one C-speed ``pc.match_substring`` pass per
  passage (linear in #passages; at ≥10⁵ passages switch to
  :func:`ngram_overlap`, whose cost is independent of the passage count).
- :func:`ngram_overlap` hashes each doc's token n-grams vectorized (one
  ``pd.util.hash_array`` pass per batch) and membership-tests them against
  the sorted benchmark-gram array with ``np.searchsorted`` — O(log B) per
  gram, no Python loop over grams.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

__all__ = ["benchmark_passages", "contains_benchmark", "ngram_overlap",
           "ngram_overlap_bloom"]

_BENCH_EVERY = 97
_PASSAGE_LEN = 64


def _docs(sf_dir: str, columns=None):
    return ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=columns)


def benchmark_passages(sf_dir: str) -> list[str]:
    """Deterministic stand-in benchmark: every ``doc_id % 97 == 0`` doc's
    first 64 characters (only docs long enough to make containment
    non-trivial). Column-pruned filtered read; result is driver-small."""

    def pick(t: pa.Table) -> pa.Table:
        did = np.asarray(t["doc_id"].to_numpy(zero_copy_only=False),
                         dtype=np.int64)
        keep = pa.array((did % _BENCH_EVERY) == 0)
        sub = t.filter(pc.and_(
            keep, pc.greater_equal(pc.utf8_length(t["text"]), _PASSAGE_LEN)))
        return pa.table({"passage": pc.utf8_slice_codeunits(
            sub["text"], 0, _PASSAGE_LEN)})

    ds = _docs(sf_dir, columns=["doc_id", "text"]).map_batches(
        pick, batch_format="pyarrow")
    return [r["passage"] for r in ds.take_all()]


def contains_benchmark(sf_dir: str, passages: list[str] | None = None):
    """(doc_id, contaminated): does the document contain any benchmark
    passage verbatim?  One vectorized substring scan per passage; the
    benchmark broadcasts once via ``ray.put``."""
    import ray

    if passages is None:
        passages = benchmark_passages(sf_dir)
    ref = ray.put(list(passages))

    def flag(t: pa.Table) -> pa.Table:
        ps = ray.get(ref)
        mask = pa.array(np.zeros(len(t), dtype=bool))
        for p in ps:
            mask = pc.or_(mask, pc.match_substring(t["text"], p))
        return pa.table({"doc_id": t["doc_id"].cast(pa.int64()),
                         "contaminated": mask})

    return _docs(sf_dir, columns=["doc_id", "text"]).map_batches(
        flag, batch_format="pyarrow")


def _gram_hashes(texts, n: int) -> tuple[np.ndarray, np.ndarray]:
    """Hashes of all token n-grams across a batch (vectorized: one token
    explode, one rolling join via per-position hash mixing), with the doc
    index of each gram. Grams never cross document boundaries."""
    toks = pd.Series(texts).str.split()
    lens = toks.str.len().fillna(0).astype(np.int64).to_numpy()
    flat = np.concatenate(
        [np.asarray(t, dtype=object) for t in toks
         if isinstance(t, list) and len(t)]
    ) if lens.sum() else np.empty(0, dtype=object)
    if len(flat) == 0:
        return np.empty(0, dtype=np.uint64), np.empty(0, dtype=np.int64)
    h = pd.util.hash_array(flat)  # one siphash pass over every token
    # rolling n-gram hash: position-weighted mix of n consecutive token
    # hashes (weights break symmetry so "a b" != "b a")
    mults = np.array([(0x9E3779B97F4A7C15 * (i + 1) | 1) & 0xFFFFFFFFFFFFFFFF
                      for i in range(n)], dtype=np.uint64)
    total = len(h)
    if total < n:
        win_count = 0
    else:
        win_count = total - n + 1
    if win_count <= 0:
        return np.empty(0, dtype=np.uint64), np.empty(0, dtype=np.int64)
    windows = np.lib.stride_tricks.sliding_window_view(h, n)
    grams = (windows * mults).sum(axis=1, dtype=np.uint64)
    # doc index per WINDOW START, and a mask for windows that stay inside
    # one document
    ends = np.cumsum(lens)
    starts_ = ends - lens
    doc_idx = np.searchsorted(ends - 1, np.arange(win_count), side="left")
    keep = (np.arange(win_count) + n - 1) < ends[doc_idx]
    return grams[keep], doc_idx[keep]


def ngram_overlap(sf_dir: str, n: int = 8,
                  passages: list[str] | None = None):
    """(doc_id, n_hits): how many of the document's token ``n``-grams appear
    in the benchmark's n-gram set (hash-based; the benchmark grams broadcast
    as ONE sorted uint64 array, membership is a vectorized searchsorted).
    A document with ``n_hits > 0`` fails the GPT-3-style overlap rule."""
    import ray

    if passages is None:
        passages = benchmark_passages(sf_dir)
    bg, _ = _gram_hashes(passages, n)
    bench = np.unique(bg)
    ref = ray.put(bench)

    def hits(df: pd.DataFrame) -> pd.DataFrame:
        bench_ = ray.get(ref)
        grams, doc_idx = _gram_hashes(df["text"].tolist(), n)
        out = np.zeros(len(df), dtype=np.int64)
        if len(grams) and len(bench_):
            pos = np.searchsorted(bench_, grams)
            pos_c = np.minimum(pos, len(bench_) - 1)
            hit = bench_[pos_c] == grams
            np.add.at(out, doc_idx[hit], 1)
        return pd.DataFrame({"doc_id": df["doc_id"].astype("int64"),
                             "n_hits": out})

    return _docs(sf_dir, columns=["doc_id", "text"]).map_batches(
        hits, batch_format="pandas")


def ngram_overlap_bloom(sf_dir: str, n: int = 8,
                        passages: list[str] | None = None,
                        n_bits: int | None = None, k: int = 7):
    """EXACTLY :func:`ngram_overlap`'s output via the Bloom-gated plan —
    the 100-TB path for when the benchmark n-gram set outgrows the sorted
    uint64 broadcast array (e.g. decontaminating against a full eval-suite
    union): the grams broadcast as a ~16-bits-per-gram Bloom filter (4×
    smaller than the exact array) and only CANDIDATE grams — true hits
    plus the filter's small false-positive fraction — leave the corpus
    scan for the exact verify. The corpus itself never shuffles.

    Exactness: candidates are verified against the exact gram set before
    counting, so false positives change WORK, never RESULTS (equivalence-
    tested down to a deliberately saturated 2^10-bit filter). The verify
    is the same searchsorted as :func:`ngram_overlap` but touches only
    the gated candidates (a ~FPR fraction of all grams), pulled zero-copy
    from the object store only when a batch has any; when even the exact
    array outgrows a worker heap, the same candidate stream instead joins
    distributed against the benchmark-gram dataset — the plan shape (gate
    at the scan, verify only candidates) is the part that scales."""
    import math

    import ray

    from cmc_knowledge_graph_text2ttl_ray.pipelines.sketches import (
        _bloom_partial, bloom_contains,
    )

    if passages is None:
        passages = benchmark_passages(sf_dir)
    bg, _ = _gram_hashes(passages, n)
    bench = np.unique(bg)
    if n_bits is None:
        n_bits = 1 << max(12, math.ceil(math.log2(
            16 * max(len(bench), 1))))
    words_ref = ray.put(_bloom_partial(bench, n_bits, k))
    bench_ref = ray.put(bench)

    def hits(df: pd.DataFrame) -> pd.DataFrame:
        words = ray.get(words_ref)
        grams, doc_idx = _gram_hashes(df["text"].tolist(), n)
        out = np.zeros(len(df), dtype=np.int64)
        if len(grams):
            gate = bloom_contains(grams, words, k)
            cand, cand_doc = grams[gate], doc_idx[gate]
            if len(cand):
                bench_ = ray.get(bench_ref)
                pos = np.minimum(np.searchsorted(bench_, cand),
                                 len(bench_) - 1)
                true_hit = bench_[pos] == cand
                np.add.at(out, cand_doc[true_hit], 1)
        return pd.DataFrame({"doc_id": df["doc_id"].astype("int64"),
                             "n_hits": out})

    return _docs(sf_dir, columns=["doc_id", "text"]).map_batches(
        hits, batch_format="pandas")
