"""Text-analysis stages over the ``documents`` table — the operations a
large-scale training-data pipeline needs (language ID, quality scoring,
token counting, fingerprinting). All are single-pass ``map_batches``
transforms; the heavy lifting is vectorized (pyarrow.compute / pandas str
kernels); the language-ID stage is a callable CLASS so its stopword tables
are built once per actor.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

__all__ = [
    "token_stats",
    "quality_scores",
    "fingerprints",
    "LangId",
    "lang_id",
]


def _docs(sf_dir: str, columns=None):
    return ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=columns)


def token_stats(sf_dir: str):
    """Per-doc token/char counts (whitespace tokenization, vectorized)."""
    ds = _docs(sf_dir, columns=["doc_id", "text"])

    def stats(t: pa.Table) -> pa.Table:
        text = t["text"]
        trimmed = pc.utf8_trim_whitespace(text)
        toks = pc.split_pattern_regex(trimmed, r"\s+")
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_chars": pc.utf8_length(text).cast(pa.int64()),
                "n_tokens": pc.list_value_length(toks).cast(pa.int64()),
            }
        )

    return ds.map_batches(stats, batch_format="pyarrow")


def quality_scores(sf_dir: str):
    """Heuristic quality signals: alphabetic ratio + mean token length."""
    ds = _docs(sf_dir, columns=["doc_id", "text"])

    def score(t: pa.Table) -> pa.Table:
        text = t["text"]
        n = pc.utf8_length(text).cast(pa.float64())
        alpha = pc.utf8_length(
            pc.replace_substring_regex(text, "[^a-zA-Z]", "")
        ).cast(pa.float64())
        toks = pc.split_pattern_regex(pc.utf8_trim_whitespace(text), r"\s+")
        n_toks = pc.list_value_length(toks).cast(pa.float64())
        from cmc_knowledge_graph_text2ttl_ray.functions.rounding import pc_round
        alpha_ratio = pc_round(pc.divide(alpha, n), 4)
        avg_tok_len = pc_round(pc.divide(n, n_toks), 4)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "alpha_ratio": alpha_ratio,
                "avg_token_len": avg_tok_len,
            }
        )

    return ds.map_batches(score, batch_format="pyarrow")


def fingerprints(sf_dir: str):
    """Document fingerprints: md5 (exact identity) + a 64-bit rolling hash
    over 8-byte windows (shift-resistant content signature)."""
    ds = _docs(sf_dir, columns=["doc_id", "text"])

    def fp(df: pd.DataFrame) -> pd.DataFrame:
        md5 = df["text"].map(lambda s: hashlib.md5(s.encode("utf-8")).hexdigest())
        roll = df["text"].map(_rolling_hash64)
        return pd.DataFrame({"doc_id": df["doc_id"], "md5": md5, "rolling64": roll})

    return ds.map_batches(fp, batch_format="pandas")


def _rolling_hash64(s: str, window: int = 8) -> int:
    data = s.encode("utf-8")
    if len(data) < window:
        data = data + b"\x00" * (window - len(data))
    arr = np.frombuffer(data, dtype=np.uint8).astype(np.uint64)
    base = np.uint64(257)
    # vectorized polynomial rolling hash of all windows, xor-folded
    pows = base ** np.arange(window, dtype=np.uint64)
    windows = np.lib.stride_tricks.sliding_window_view(arr, window)
    hashes = (windows * pows).sum(axis=1, dtype=np.uint64)
    out = np.bitwise_xor.reduce(hashes)
    return int(out & np.uint64(0x7FFF_FFFF_FFFF_FFFF))


_STOPWORDS = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "it", "with", "was"},
    "de": {"der", "die", "das", "und", "ist", "mit", "von", "ein", "zu", "den"},
    "fr": {"le", "la", "les", "et", "est", "avec", "des", "un", "une", "dans"},
    "es": {"el", "la", "los", "las", "y", "es", "con", "de", "un", "una"},
}


class LangId:
    """Language-ID actor: stopword-ratio n-gram heuristic.

    Tables are built once per actor in ``__init__`` (stateful-stage pattern,
    SURVEY §2.3); ``__call__`` is per batch, vectorized via pandas str ops.
    """

    def __init__(self) -> None:
        import re

        self._word = re.compile(r"[a-zà-ÿ]+")
        self._tables = {k: frozenset(v) for k, v in _STOPWORDS.items()}

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        # fully vectorized (round-1 verdict: the old per-row `best()` loop):
        # explode tokens once, then ONE C-speed isin + bincount per language
        df = df.reset_index(drop=True)
        tokens = df["text"].str.lower().str.findall(self._word)
        ex = tokens.explode().dropna()
        rows = ex.index.to_numpy(dtype=np.int64)
        n = len(df)
        # reverse-sorted so argmax's first-max rule reproduces the
        # (count, lang)-max tie-break of the reference scoring
        langs = sorted(self._tables, reverse=True)
        scores = np.zeros((n, len(langs)), dtype=np.int64)
        for j, lang in enumerate(langs):
            mask = ex.isin(self._tables[lang]).to_numpy(dtype=bool)
            if mask.any():
                scores[:, j] += np.bincount(rows[mask], minlength=n)
        best_j = np.argmax(scores, axis=1)
        best_s = scores[np.arange(n), best_j]
        pred = np.where(best_s > 0, np.array(langs, dtype=object)[best_j], "und")
        return pd.DataFrame({"doc_id": df["doc_id"], "pred_lang": pred})


def lang_id(sf_dir: str, concurrency=(1, 4)):
    ds = _docs(sf_dir, columns=["doc_id", "text"])
    return ds.map_batches(LangId, batch_format="pandas", concurrency=concurrency)
