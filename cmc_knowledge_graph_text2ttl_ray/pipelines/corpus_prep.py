"""Training-corpus preparation pipeline: quality filter → exact dedup →
cleaned corpus. The composition a 100 TB pretraining-data run actually
ships: every stage is a streaming transform, the only shuffle is the
(hash, doc_id) dedup exchange, and the output is resumable partitioned
parquet.

Stage shapes:

1. quality signals are computed INLINE with the filter (one scan — not a
   metrics pass plus a filter pass),
2. the filter is pure ``pyarrow.compute``,
3. exact dedup ships only ``(md5, doc_id)`` pairs through the groupby
   (per-block min-combiner first),
4. the winner set joins back to the filtered text via a distributed hash
   join under Ray, so no text ever reaches the driver; with ``out_dir``
   the cleaned corpus lands as partitioned parquet.
"""

from __future__ import annotations

import hashlib

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

__all__ = ["clean_corpus", "corpus_prep_stats", "train_val_split",
           "pack_sequences", "epoch_shuffle", "chunk_documents"]


def _quality_filter(t: pa.Table, min_alpha_ratio: float, min_tokens: int,
                    max_tokens: int) -> pa.Table:
    text = t["text"]
    n = pc.utf8_length(text).cast(pa.float64())
    alpha = pc.utf8_length(
        pc.replace_substring_regex(text, "[^a-zA-Z]", "")
    ).cast(pa.float64())
    toks = pc.list_value_length(
        pc.split_pattern_regex(pc.utf8_trim_whitespace(text), r"\s+")
    ).cast(pa.int64())
    alpha_ratio = pc.divide(alpha, pc.max_element_wise(n, pa.scalar(1.0)))
    keep = pc.and_(
        pc.and_(
            pc.greater_equal(alpha_ratio, pa.scalar(min_alpha_ratio)),
            pc.greater_equal(toks, pa.scalar(min_tokens)),
        ),
        pc.less_equal(toks, pa.scalar(max_tokens)),
    )
    return t.filter(keep)


def clean_corpus(
    sf_dir: str,
    min_alpha_ratio: float = 0.6,
    min_tokens: int = 10,
    max_tokens: int = 1_000_000,
    out_dir: str | None = None,
    num_join_partitions: int | None = None,
):
    """documents → quality-filtered, exactly-deduped corpus.

    Returns the cleaned Dataset ``(doc_id, text_hash)`` (winners only; the
    smallest ``doc_id`` represents each identical-text group). With
    ``out_dir`` the full rows (id + text) are written as parquet.
    """
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])

    def filt_hash(t: pa.Table) -> pa.Table:
        t = _quality_filter(t, min_alpha_ratio, min_tokens, max_tokens)
        h = pa.array(
            [hashlib.md5(v.encode("utf-8")).hexdigest()
             for v in t["text"].to_pylist()],
            pa.string(),
        )
        out = pa.table({"text_hash": h, "doc_id": t["doc_id"]})
        # per-block combiner: min doc_id per hash before the shuffle
        return out.group_by("text_hash").aggregate([("doc_id", "min")]).rename_columns(
            ["text_hash", "doc_id"]
        )

    from cmc_knowledge_graph_text2ttl_ray.functions.cluster import (
        coarse_group_reduce,
    )

    # coarse hash-partition reduce instead of groupby(hash).aggregate:
    # distinct hashes ≈ distinct documents (see coarse_group_reduce)
    winners = coarse_group_reduce(
        ds.map_batches(filt_hash, batch_format="pyarrow"),
        ["text_hash"],
        lambda g: g.groupby("text_hash", as_index=False)["doc_id"].min(),
    )

    if out_dir is not None:
        if num_join_partitions is None:
            from cmc_knowledge_graph_text2ttl_ray.functions.cluster import (
                default_join_partitions,
            )

            num_join_partitions = default_join_partitions()
        filtered = ds.map_batches(
            lambda t: _quality_filter(t, min_alpha_ratio, min_tokens, max_tokens),
            batch_format="pyarrow",
        )
        kept = winners.select_columns(["doc_id"]).repartition(num_join_partitions)
        cleaned = filtered.join(
            kept, join_type="inner", num_partitions=num_join_partitions,
            on=("doc_id",),
        )
        import shutil

        # Ray write_parquet APPENDS uniquely-named part files: clear the
        # target first so a retried run can't double the corpus
        shutil.rmtree(out_dir, ignore_errors=True)
        cleaned.write_parquet(out_dir)
    return winners


def corpus_prep_stats(sf_dir: str, min_alpha_ratio: float = 0.6,
                      min_tokens: int = 10, max_tokens: int = 1_000_000):
    """One-row funnel summary: total docs → quality-passing → distinct."""
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])

    def partial(t: pa.Table) -> pa.Table:
        kept = _quality_filter(t, min_alpha_ratio, min_tokens, max_tokens)
        return pa.table({
            "n_total": pa.array([t.num_rows], pa.int64()),
            "n_quality": pa.array([kept.num_rows], pa.int64()),
        })

    counts = ds.map_batches(partial, batch_format="pyarrow").sum(
        ["n_total", "n_quality"]
    )
    n_distinct = clean_corpus(sf_dir, min_alpha_ratio, min_tokens, max_tokens).count()
    return pd.DataFrame({
        "n_total": [int(counts["sum(n_total)"])],
        "n_quality": [int(counts["sum(n_quality)"])],
        "n_distinct": [int(n_distinct)],
    })


def train_val_split(sf_dir: str, train_fraction: float = 0.9):
    """Deterministic, reshuffle-free train/val assignment: md5 of the doc id
    keyed against a hex threshold. The same document lands in the same
    split on every run, on every cluster size, with NO shuffle — the
    standard content-hash split for 100 TB corpora (a random_shuffle-based
    split would be an all-to-all exchange AND non-reproducible)."""
    # clamp to the hex-comparable domain: ≥1 → everything trains ("g" sorts
    # above every hex digit), ≤0 → nothing does
    if train_fraction >= 1.0:
        threshold = "g"
    elif train_fraction <= 0.0:
        threshold = "00000000"
    else:
        threshold = format(int(train_fraction * 16**8), "08x")

    def split(df: pd.DataFrame) -> pd.DataFrame:
        h = df["doc_id"].map(
            lambda d: hashlib.md5(str(d).encode()).hexdigest()[:8]
        )
        return pd.DataFrame({
            "doc_id": df["doc_id"].astype("int64"),
            "split": (h < threshold).map({True: "train", False: "val"}),
        })

    return ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id"]
    ).map_batches(split, batch_format="pandas")


def pack_sequences(sf_dir: str, seq_len: int = 512):
    """Fixed-length training-sequence packing: concatenate every document's
    token stream in ``doc_id`` order and cut the combined stream into
    ``seq_len``-token chunks; per document, emit its global token span and
    the first/last chunk it lands in — the bookkeeping a
    tokenize-concat-chunk pretraining loader needs.

    Scale shape: a distributed PREFIX SUM. Sort by doc_id (the one
    all-to-all — range partitioning makes block doc-id ranges disjoint),
    then (1) one row PER BLOCK (first doc_id, block token total) flows to
    the driver — blocks ≪ rows, so this is bounded — (2) an exclusive
    scan over those per-block totals yields each block's base offset,
    broadcast via ``ray.put``, and (3) a second embarrassingly-parallel
    pass adds the base to each block's local cumulative sum. The token
    streams themselves never move or materialize.
    """
    import numpy as np
    import ray

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])

    def tok_counts(t: pa.Table) -> pa.Table:
        toks = pc.list_value_length(
            pc.split_pattern_regex(pc.utf8_trim_whitespace(t["text"]),
                                   r"\s+")
        ).cast(pa.int64())
        return pa.table({"doc_id": t["doc_id"].combine_chunks().cast(pa.int64()),
                         "n_tokens": toks})

    counted = ds.map_batches(tok_counts, batch_format="pyarrow") \
                .sort("doc_id").materialize()

    def block_summary(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"first": pa.array([], pa.int64()),
                             "total": pa.array([], pa.int64())})
        return pa.table({
            "first": pa.array([pc.min(t["doc_id"]).as_py()], pa.int64()),
            "total": pa.array([pc.sum(t["n_tokens"]).as_py()], pa.int64()),
        })

    summaries = (counted.map_batches(block_summary, batch_format="pyarrow")
                 .to_pandas().sort_values("first"))
    bases = dict(zip(
        summaries["first"],
        np.concatenate([[0], summaries["total"].to_numpy(np.int64)
                        .cumsum()[:-1]]),
    ))
    bases_ref = ray.put(bases)

    def spans(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "n_tokens": pa.array([], pa.int64()),
                             "start_off": pa.array([], pa.int64()),
                             "end_off": pa.array([], pa.int64()),
                             "first_seq": pa.array([], pa.int64()),
                             "last_seq": pa.array([], pa.int64())})
        nt = t["n_tokens"].to_numpy()
        base = ray.get(bases_ref)[int(pc.min(t["doc_id"]).as_py())]
        end = base + nt.cumsum()
        start = end - nt
        first_seq = start // seq_len
        last_seq = np.where(nt == 0, first_seq,
                            (end - 1) // seq_len)
        return pa.table({
            "doc_id": t["doc_id"],
            "n_tokens": t["n_tokens"],
            "start_off": pa.array(start, pa.int64()),
            "end_off": pa.array(end, pa.int64()),
            "first_seq": pa.array(first_seq, pa.int64()),
            "last_seq": pa.array(last_seq, pa.int64()),
        })

    return counted.map_batches(spans, batch_format="pyarrow")


def epoch_shuffle(sf_dir: str, seed: int = 0):
    """Deterministic global epoch shuffle: every document gets a total-order
    training position for a given ``seed``, reproducible on any cluster
    size and resumable (position is a pure function of (seed, corpus) —
    re-running epoch 3 after a crash yields the identical order, unlike
    ``random_shuffle``). Changing ``seed`` per epoch gives independent
    permutations.

    Scale shape: rank = md5(seed:doc_id) — one range-partitioning sort on
    the 16-hex-char key (the single all-to-all; only (key, doc_id) pairs
    move, never text), then global positions via the same bounded
    distributed prefix sum as ``pack_sequences``: one (first_key, count)
    row per block to the driver, exclusive scan, broadcast base offsets,
    per-block ``arange`` add. A loader then reads the corpus joined
    against this (doc_id → pos) table, or the positions are written as a
    partitioned parquet index next to the shards.
    """
    import numpy as np
    import ray

    prefix = f"{seed}:"

    def key(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "doc_id": df["doc_id"].astype("int64"),
            "skey": [hashlib.md5((prefix + str(d)).encode()).hexdigest()[:16]
                     for d in df["doc_id"]],
        })

    keyed = (ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                   columns=["doc_id"])
             .map_batches(key, batch_format="pandas")
             .sort(["skey", "doc_id"]).materialize())

    def block_summary(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"first": pa.array([], pa.string()),
                             "count": pa.array([], pa.int64())})
        return pa.table({
            "first": pa.array([t["skey"][0].as_py()], pa.string()),
            "count": pa.array([t.num_rows], pa.int64()),
        })

    summaries = (keyed.map_batches(block_summary, batch_format="pyarrow")
                 .to_pandas().sort_values("first"))
    bases = dict(zip(
        summaries["first"],
        np.concatenate([[0], summaries["count"].to_numpy(np.int64)
                        .cumsum()[:-1]]),
    ))
    bases_ref = ray.put(bases)

    def positions(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "pos": pa.array([], pa.int64())})
        base = ray.get(bases_ref)[t["skey"][0].as_py()]
        return pa.table({
            "doc_id": t["doc_id"],
            "pos": pa.array(base + np.arange(t.num_rows), pa.int64()),
        })

    return keyed.map_batches(positions, batch_format="pyarrow")


def chunk_documents(sf_dir: str, chunk_tokens: int = 64,
                    overlap: int = 16):
    """Overlapping token-window chunking (the RAG / context-window
    preprocessing step): each document yields chunks of ``chunk_tokens``
    whitespace tokens starting every ``chunk_tokens - overlap`` tokens.
    Returns ``(doc_id, chunk_idx, start_tok, end_tok)`` —
    ``n_chunks = max(1, ceil((n_tok - overlap) / stride))``, with the last
    chunk clipped to the document end (empty docs yield one [0, 0) chunk,
    keeping every doc represented).

    Scale shape: a pure vectorized flat_map — token counts via one Arrow
    kernel, chunk rows via ``repeat``/``arange``; no shuffle, no state,
    and the text itself never expands (chunks are SPANS; a loader slices
    lazily)."""
    import numpy as np
    import ray

    if overlap >= chunk_tokens:
        raise ValueError("overlap must be smaller than chunk_tokens")
    stride = chunk_tokens - overlap

    def chunks(t: pa.Table) -> pa.Table:
        n_tok = pc.list_value_length(
            pc.split_pattern_regex(pc.utf8_trim_whitespace(t["text"]),
                                   r"\s+")
        ).cast(pa.int64()).to_numpy(zero_copy_only=False)
        n_chunks = np.maximum(
            1, -(-(np.maximum(n_tok - overlap, 1)) // stride))
        doc_ids = t["doc_id"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        rep_doc = np.repeat(doc_ids, n_chunks)
        # per-doc chunk indexes: global arange minus each doc's base
        base = np.repeat(np.cumsum(n_chunks) - n_chunks, n_chunks)
        idx = np.arange(int(n_chunks.sum()), dtype=np.int64) - base
        start = idx * stride
        end = np.minimum(start + chunk_tokens, np.repeat(n_tok, n_chunks))
        return pa.table({
            "doc_id": pa.array(rep_doc, pa.int64()),
            "chunk_idx": pa.array(idx, pa.int64()),
            "start_tok": pa.array(start, pa.int64()),
            "end_tok": pa.array(end, pa.int64()),
        })

    return ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).map_batches(chunks, batch_format="pyarrow")
