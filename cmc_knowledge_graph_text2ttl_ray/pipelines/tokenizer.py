"""Distributed BPE tokenizer training and application.

Byte-pair-encoding vocabularies are trained on a (word, count) histogram,
not on the raw corpus — the histogram is the distributed part, the merge
loop runs over the bounded histogram. This is the classic subword-nmt /
GPT-2-style formulation re-expressed Ray-Data-first:

1. ``word_histogram`` — one streaming pass: punctuation-isolating
   pre-tokenization with Arrow C kernels, per-block ``value_counts``
   partials so only ``(word, partial_count)`` rows shuffle, a coarse
   hash-partition sum over distinct words (vocabulary-bounded — distinct
   words grow ~log corpus), then an exact global top-``max_words``
   truncation (per-block top-k + final sort over ≤ k × blocks rows).
2. ``train_bpe`` — the merge loop is inherently sequential (merge r+1
   depends on merge r) and runs on the driver over ≤ ``max_words`` rows
   with incremental pair-count maintenance: only words containing the
   just-merged pair are re-tokenized, so each iteration is sub-linear in
   the histogram. At 100 TB the histogram top-50k is identical to the
   one a single-machine trainer would see — nothing here scales with
   corpus size except the one histogram pass.
3. ``BpeEncoder`` / ``bpe_token_counts`` — apply learned merges to the
   corpus as an actor-pool ``map_batches`` stage: merge ranks are built
   once per actor in ``__init__`` (broadcast via ``ray.put``), encoding
   memoizes per distinct word so each actor tokenizes a word once no
   matter how many times it occurs.

The reference engine has no tokenizer trainer; this implements the
public BPE algorithm (Sennrich et al. 2016) for the training-data
family the engine adds.
"""

from __future__ import annotations

from collections import defaultdict

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

__all__ = ["word_histogram", "train_bpe", "bpe_token_counts",
           "train_unigram", "unigram_token_counts"]

END_OF_WORD = "</w>"


def _pretokenize(text: pa.ChunkedArray) -> pa.ChunkedArray:
    """Split into BPE pre-tokens: words, numbers, single punctuation.
    Implemented as two C kernels (isolate non-alphanumerics with spaces,
    whitespace-split) — RE2 has no lookarounds, so the usual
    findall-per-row loop is replaced by pad-then-split."""
    padded = pc.replace_substring_regex(text, r"([^A-Za-z0-9\s])", r" \1 ")
    return pc.split_pattern_regex(pc.utf8_trim_whitespace(padded), r"\s+")


def word_histogram(sf_dir: str, max_words: int = 30_000):
    """Exact corpus-wide (word, cnt) histogram truncated to the
    ``max_words`` most frequent words (count-desc, word-asc tie-break).
    Truncation happens AFTER the global sum, so the result is independent
    of block structure and cluster size."""
    from cmc_knowledge_graph_text2ttl_ray.functions.cluster import (
        coarse_group_reduce,
    )

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["text"])

    def partial(t: pa.Table) -> pa.Table:
        toks = _pretokenize(t["text"])
        flat = pc.list_flatten(toks)
        if len(flat) == 0:
            return pa.table({"word": pa.array([], pa.string()),
                             "cnt": pa.array([], pa.int64())})
        vc = flat.value_counts()
        out = pa.table({"word": vc.field("values"),
                        "cnt": vc.field("counts").cast(pa.int64())})
        # trim-then-split yields one "" token for whitespace-only docs
        return out.filter(pc.not_equal(out["word"], ""))

    from cmc_knowledge_graph_text2ttl_ray.functions.cluster import (
        parquet_rows_hint,
    )

    counts = coarse_group_reduce(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["word"],
        lambda g: g.groupby("word", as_index=False)["cnt"].sum(),
        # per-block distinct-word rows; the byte estimate over-counts
        # (safe direction: more, smaller partitions)
        n_rows_hint=parquet_rows_hint(f"{sf_dir}/documents.parquet",
                                      "text", per_row_bytes=24),
    )

    def block_topk(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(["cnt", "word"],
                             ascending=[False, True]).head(max_words)

    cand = counts.map_batches(block_topk, batch_format="pandas").to_pandas()
    return (cand.sort_values(["cnt", "word"], ascending=[False, True])
            .head(max_words).reset_index(drop=True))


def _merge_loop(hist: pd.DataFrame, num_merges: int) -> pd.DataFrame:
    """Classic BPE with incremental pair-count maintenance."""
    words = [tuple(w) + (END_OF_WORD,) for w in hist["word"]]
    cnts = hist["cnt"].to_numpy(np.int64)

    pair_counts: dict[tuple, int] = defaultdict(int)
    pair_words: dict[tuple, set] = defaultdict(set)
    for i, syms in enumerate(words):
        c = int(cnts[i])
        for a, b in zip(syms, syms[1:]):
            pair_counts[(a, b)] += c
            pair_words[(a, b)].add(i)

    merges = []
    for rank in range(num_merges):
        if not pair_counts:
            break
        # deterministic: highest count, then lexicographically first pair
        best = min(pair_counts, key=lambda p: (-pair_counts[p], p))
        freq = pair_counts[best]
        if freq < 2:
            break
        merges.append((rank, best[0], best[1], freq))
        merged = best[0] + best[1]
        for i in list(pair_words[best]):
            syms = words[i]
            c = int(cnts[i])
            # retract this word's old pairs
            for a, b in zip(syms, syms[1:]):
                pair_counts[(a, b)] -= c
                if pair_counts[(a, b)] <= 0:
                    del pair_counts[(a, b)]
                pair_words[(a, b)].discard(i)
            # apply the merge left-to-right
            out, j = [], 0
            while j < len(syms):
                if (j + 1 < len(syms) and syms[j] == best[0]
                        and syms[j + 1] == best[1]):
                    out.append(merged)
                    j += 2
                else:
                    out.append(syms[j])
                    j += 1
            syms = tuple(out)
            words[i] = syms
            for a, b in zip(syms, syms[1:]):
                pair_counts[(a, b)] += c
                pair_words[(a, b)].add(i)

    return pd.DataFrame(merges, columns=["rank", "left", "right", "freq"]) \
        .astype({"rank": "int64", "freq": "int64"})


def train_bpe(sf_dir: str, num_merges: int = 200,
              max_words: int = 30_000) -> pd.DataFrame:
    """Learn ``num_merges`` BPE merge rules from the corpus. Returns a
    small DataFrame ``(rank, left, right, freq)`` — the trained
    vocabulary artifact a tokenizer ships."""
    return _merge_loop(word_histogram(sf_dir, max_words), num_merges)


def _encode_word(word: str, ranks: dict[tuple, int]) -> int:
    """Number of BPE tokens for one word under the learned merges."""
    syms = list(word) + [END_OF_WORD]
    while len(syms) > 1:
        pairs = [(ranks.get((a, b), 1 << 60), k)
                 for k, (a, b) in enumerate(zip(syms, syms[1:]))]
        r, k = min(pairs)
        if r >= 1 << 60:
            break
        syms[k: k + 2] = [syms[k] + syms[k + 1]]
    return len(syms)


class BpeEncoder:
    """Actor-pool stage: tokenize with learned merges; per-word memo so
    each distinct word is encoded once per actor."""

    def __init__(self, merges_ref):
        merges = ray.get(merges_ref)
        self.ranks = {(l, r): int(k) for k, l, r in
                      zip(merges["rank"], merges["left"], merges["right"])}
        self.memo: dict[str, int] = {"": 0}

    def __call__(self, t: pa.Table) -> pa.Table:
        toks = _pretokenize(t["text"])
        flat = pc.list_flatten(toks).to_pylist()
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        memo, ranks = self.memo, self.ranks
        n_tok = np.empty(len(flat), np.int64)
        for i, w in enumerate(flat):
            v = memo.get(w)
            if v is None:
                v = memo[w] = _encode_word(w, ranks)
            n_tok[i] = v
        ends = np.cumsum(lens)
        starts = np.concatenate([[0], ends[:-1]])
        # prefix-sum difference: robust when trailing docs are empty
        # (reduceat with clamped indices truncates the preceding doc)
        cs = np.concatenate([[0], np.cumsum(n_tok)])
        per_doc = cs[ends] - cs[starts]
        return pa.table({"doc_id": t["doc_id"],
                         "n_bpe_tokens": pa.array(per_doc, pa.int64())})


def bpe_token_counts(sf_dir: str, num_merges: int = 200,
                     max_words: int = 30_000, concurrency: int | None = None):
    """Train BPE on the corpus, then one actor-pool pass counting tokens
    per document under the learned vocabulary."""
    import ray as _ray

    merges_ref = _ray.put(train_bpe(sf_dir, num_merges, max_words))
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])
    return ds.map_batches(
        BpeEncoder, fn_constructor_args=(merges_ref,),
        batch_format="pyarrow", concurrency=concurrency or (1, 8),
    )


# --------------------------------------------------------------------------
# Unigram LM tokenizer (Kudo 2018, SentencePiece's second algorithm)
# --------------------------------------------------------------------------
#
# Same distributed decomposition as BPE: the corpus contributes ONE
# streaming word-histogram pass; training runs on the driver over the
# bounded (word, count) table. EM here is the hard (Viterbi) variant —
# each E-step segments every distinct histogram word once under the
# current piece log-probs and accumulates count-weighted piece counts;
# pruning removes the lowest-probability multi-char pieces between EM
# rounds until the vocabulary reaches its target (single characters are
# never pruned, so every word stays segmentable).

_MAX_PIECE_LEN = 10


def _viterbi(word: str, logp: dict[str, float],
             max_len: int = _MAX_PIECE_LEN):
    """Best segmentation of ``word`` under piece log-probs. Returns
    (pieces, total_logp); unknown single chars get a large penalty so
    any word segments."""
    n = len(word)
    best = [0.0] + [-1e18] * n
    back = [0] * (n + 1)
    unk = -1e9
    for j in range(1, n + 1):
        for i in range(max(0, j - max_len), j):
            lp = logp.get(word[i:j])
            if lp is None:
                if j - i == 1:
                    lp = unk
                else:
                    continue
            cand = best[i] + lp
            if cand > best[j]:
                best[j] = cand
                back[j] = i
    pieces = []
    j = n
    while j > 0:
        i = back[j]
        pieces.append(word[i:j])
        j = i
    pieces.reverse()
    return pieces, best[n]


def train_unigram(sf_dir: str, vocab_size: int = 2_000,
                  max_words: int = 30_000, seed_factor: int = 6,
                  em_iters_per_round: int = 2,
                  prune_frac: float = 0.25) -> pd.DataFrame:
    """Learn a unigram-LM piece vocabulary. Returns ``(piece, logp)``
    sorted by piece — deterministic for a given corpus (the histogram is
    block-invariant and training is a pure function of it)."""
    import math

    hist = word_histogram(sf_dir, max_words).reset_index(drop=True)
    words = list(hist["word"])
    counts = hist["cnt"].to_numpy(np.int64)

    # seed: all substrings up to _MAX_PIECE_LEN weighted by word count,
    # truncated to seed_factor × vocab_size (count-desc, piece-asc) —
    # single chars always included
    sub_counts: dict[str, int] = {}
    for w, c in zip(words, counts):
        c = int(c)
        L = len(w)
        for i in range(L):
            for j in range(i + 1, min(L, i + _MAX_PIECE_LEN) + 1):
                p = w[i:j]
                sub_counts[p] = sub_counts.get(p, 0) + c
    chars = {p for p in sub_counts if len(p) == 1}
    if vocab_size <= len(chars):
        # single chars are never pruned, so a smaller target can never be
        # reached — the prune loop below would spin forever
        raise ValueError(
            f"vocab_size={vocab_size} must exceed the number of distinct "
            f"single characters in the corpus ({len(chars)})")
    multi = sorted((p for p in sub_counts if len(p) > 1),
                   key=lambda p: (-sub_counts[p], p))
    seed_n = max(vocab_size, seed_factor * vocab_size) - len(chars)
    vocab = chars | set(multi[:max(0, seed_n)])
    total = sum(sub_counts[p] for p in vocab)
    logp = {p: math.log(sub_counts[p] / total) for p in vocab}

    def em_round(logp):
        for _ in range(em_iters_per_round):
            acc: dict[str, float] = {}
            tot = 0.0
            for w, c in zip(words, counts):
                pieces, _ = _viterbi(w, logp)
                for p in pieces:
                    acc[p] = acc.get(p, 0.0) + float(c)
                    tot += float(c)
            # unseen pieces vanish unless protected (single chars)
            logp = {p: math.log(max(acc.get(p, 0.0), 0.5) / tot)
                    for p in logp}
        return logp

    logp = em_round(logp)
    while sum(1 for p in logp if len(p) > 1) + len(chars) > vocab_size:
        multi_sorted = sorted((p for p in logp if len(p) > 1),
                              key=lambda p: (logp[p], p))
        target_multi = max(0, vocab_size - len(chars))
        n_drop = max(1, int(len(multi_sorted) * prune_frac))
        keep_multi = multi_sorted[n_drop:] \
            if len(multi_sorted) - n_drop > target_multi \
            else multi_sorted[len(multi_sorted) - target_multi:]
        logp = {p: lp for p, lp in logp.items()
                if len(p) == 1 or p in set(keep_multi)}
        logp = em_round(logp)

    out = pd.DataFrame(sorted(logp.items()), columns=["piece", "logp"])
    out["logp"] = out["logp"].astype("float64")
    return out


class UnigramEncoder:
    """Actor-pool stage: Viterbi-segment with the learned piece LM;
    per-word memo so each distinct word segments once per actor."""

    def __init__(self, vocab_ref):
        vocab = ray.get(vocab_ref)
        self.logp = dict(zip(vocab["piece"], vocab["logp"]))
        self.memo: dict[str, int] = {"": 0}

    def __call__(self, t: pa.Table) -> pa.Table:
        toks = _pretokenize(t["text"])
        flat = pc.list_flatten(toks).to_pylist()
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        memo, logp = self.memo, self.logp
        n_tok = np.empty(len(flat), np.int64)
        for i, w in enumerate(flat):
            v = memo.get(w)
            if v is None:
                v = memo[w] = len(_viterbi(w, logp)[0])
            n_tok[i] = v
        ends = np.cumsum(lens)
        starts = np.concatenate([[0], ends[:-1]])
        # prefix-sum difference: robust when trailing docs are empty
        # (reduceat with clamped indices truncates the preceding doc)
        cs = np.concatenate([[0], np.cumsum(n_tok)])
        per_doc = cs[ends] - cs[starts]
        return pa.table({"doc_id": t["doc_id"],
                         "n_unigram_tokens": pa.array(per_doc, pa.int64())})


def unigram_token_counts(sf_dir: str, vocab_size: int = 2_000,
                         max_words: int = 30_000,
                         concurrency: int | None = None):
    """Train the unigram LM on the corpus, then one actor-pool pass
    counting tokens per document under the learned pieces."""
    import ray as _ray

    vocab_ref = _ray.put(train_unigram(sf_dir, vocab_size, max_words))
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])
    return ds.map_batches(
        UnigramEncoder, fn_constructor_args=(vocab_ref,),
        batch_format="pyarrow", concurrency=concurrency or (1, 8),
    )
