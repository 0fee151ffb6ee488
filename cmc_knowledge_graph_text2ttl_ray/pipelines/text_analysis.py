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

from cmc_knowledge_graph_text2ttl_ray.functions.rounding import round_half_away

__all__ = [
    "token_stats",
    "quality_scores",
    "fingerprints",
    "LangId",
    "lang_id",
    "pii_redact",
    "normalize_texts",
    "document_frequency",
    "stratified_sample",
    "tfidf_top_terms",
    "top_ngrams",
    "inverted_index",
    "bm25_topk",
           "temperature_sample"]


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


_GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_quality_filter(sf_dir: str, min_words: int = 30,
                          max_words: int = 100_000,
                          min_mean_word_len: float = 3.0,
                          max_mean_word_len: float = 10.0,
                          min_alpha_ratio: float = 0.8,
                          min_stopword_hits: int = 1):
    """Gopher-style rule-based quality filter (Rae et al. 2021, Appendix A):
    per-document named rule booleans + the combined ``keep`` verdict, so a
    pipeline can both FILTER and AUDIT which rule fired. Rules adapted to
    this corpus's single-space tokenization (no line boundaries → the
    bullet/ellipsis line rules don't apply):

    - ``rule_n_words``: word count in [min_words, max_words];
    - ``rule_word_len``: mean word length in
      [min_mean_word_len, max_mean_word_len] (computed on the ROUNDED
      value so engine and SQL oracle agree bit-for-bit);
    - ``rule_alpha``: ≥ ``min_alpha_ratio`` of words contain a letter;
    - ``rule_stopwords``: ≥ ``min_stopword_hits`` occurrences of the
      Gopher stop-word set.

    Fully vectorized: token counts and per-rule hits are C-level regex
    counts over the text column — the corpus never explodes to words and
    nothing shuffles (embarrassingly parallel map_batches).
    """
    ds = _docs(sf_dir, columns=["doc_id", "text"])
    # token-boundary-exact patterns (space-delimited, matching SQL
    # string_split semantics — \b would also match inside hyphenations)
    non_alpha_pat = r"(?:^|(?<= ))[^A-Za-z ]+(?:(?= )|$)"
    # one alternation = one scan; whole-token matches are disjoint, so the
    # alternation count equals the per-word sum
    sw_pat = (r"(?:^|(?<= ))(?:" + "|".join(_GOPHER_STOPWORDS)
              + r")(?:(?= )|$)")

    def score(df: pd.DataFrame) -> pd.DataFrame:
        text = df["text"]
        n_words = (text.str.count(" ") + 1).to_numpy(np.int64)
        n_chars = text.str.len().to_numpy(np.int64)
        mean_word_len = round_half_away(
            (n_chars - n_words + 1) / n_words, 4)
        non_alpha = text.str.count(non_alpha_pat).to_numpy(np.int64)
        alpha_ratio = round_half_away((n_words - non_alpha) / n_words, 4)
        sw = text.str.count(sw_pat).to_numpy(np.int64)
        r_words = (n_words >= min_words) & (n_words <= max_words)
        r_wlen = (mean_word_len >= min_mean_word_len) & \
                 (mean_word_len <= max_mean_word_len)
        r_alpha = alpha_ratio >= min_alpha_ratio
        r_sw = sw >= min_stopword_hits
        return pd.DataFrame({
            "doc_id": df["doc_id"].astype("int64"),
            "n_words": n_words,
            "mean_word_len": mean_word_len,
            "alpha_ratio": alpha_ratio,
            "stopword_hits": sw,
            "rule_n_words": r_words,
            "rule_word_len": r_wlen,
            "rule_alpha": r_alpha,
            "rule_stopwords": r_sw,
            "keep": r_words & r_wlen & r_alpha & r_sw,
        })

    return ds.map_batches(score, batch_format="pandas")


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


def repetition_stats(sf_dir: str):
    """Gopher-style repetition signals per document: duplicate-word
    fraction and most-common-word fraction (the classic LLM-training-data
    quality filters for boilerplate/spam).

    Fully vectorized: one str.split + explode per batch, two C-speed pandas
    groupbys (doc×word counts → per-doc sum/count/max) — no Python loop
    over rows. Per-block partials are exact because every doc's words live
    in one row (map_batches never splits a row)."""
    ds = _docs(sf_dir, columns=["doc_id", "text"])

    def stats(df: pd.DataFrame) -> pd.DataFrame:
        from cmc_knowledge_graph_text2ttl_ray.functions.rounding import round_half_away

        if df.empty:
            return pd.DataFrame({
                "doc_id": pd.Series(dtype="int64"),
                "n_words": pd.Series(dtype="int64"),
                "n_distinct_words": pd.Series(dtype="int64"),
                "dup_word_frac": pd.Series(dtype="float64"),
                "top_word_frac": pd.Series(dtype="float64"),
            })
        words = df["text"].str.split(" ")
        lens = words.str.len().to_numpy()
        flat = pd.DataFrame({
            "doc_id": np.repeat(df["doc_id"].to_numpy(), lens),
            "word": np.concatenate([np.asarray(w, dtype=object) for w in words]),
        })
        counts = (flat.groupby(["doc_id", "word"], sort=False)
                  .size().rename("n").reset_index())
        agg = counts.groupby("doc_id", sort=True).agg(
            n_words=("n", "sum"), n_distinct_words=("n", "count"),
            top=("n", "max"))
        nw = agg["n_words"].to_numpy(dtype=np.float64)
        return pd.DataFrame({
            "doc_id": agg.index.to_numpy(),
            "n_words": agg["n_words"].to_numpy(dtype=np.int64),
            "n_distinct_words": agg["n_distinct_words"].to_numpy(dtype=np.int64),
            "dup_word_frac": round_half_away(
                1.0 - agg["n_distinct_words"].to_numpy(dtype=np.float64) / nw, 4),
            "top_word_frac": round_half_away(agg["top"].to_numpy(dtype=np.float64) / nw, 4),
        })

    return ds.map_batches(stats, batch_format="pandas")


def _trigram_codes(texts: pd.Series) -> tuple[np.ndarray, np.ndarray]:
    """All char-trigram codes across a batch, fully vectorized: texts are
    concatenated into one uint8 buffer, rolling 3-byte codes are computed
    in one shot, and cross-document positions are masked out via offsets.
    Returns (codes, doc_index_per_code)."""
    bufs = [t.encode("utf-8", "ignore") for t in texts]
    lens = np.array([len(b) for b in bufs], dtype=np.int64)
    if lens.sum() == 0:
        return (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64))
    arr = np.frombuffer(b"".join(bufs), dtype=np.uint8).astype(np.int64)
    codes_all = (arr[:-2] << 16) | (arr[1:-1] << 8) | arr[2:]
    # positions whose 3-byte window stays inside one document
    ends = np.cumsum(lens)
    starts = ends - lens
    n = len(codes_all)
    keep = np.ones(n, dtype=bool)
    for e in ends[:-1]:                 # few per batch: doc boundaries only
        keep[max(0, e - 2):min(n, e)] = False
    doc_idx = np.searchsorted(ends - 1, np.arange(n), side="left")
    # windows starting in a doc with <3 bytes spill into the next doc and
    # are already masked by the boundary rule above
    return codes_all[keep], doc_idx[keep]


def char_trigram_model(sf_dir: str) -> tuple[np.ndarray, np.ndarray, int]:
    """Distributed character-trigram count model: per-block vectorized
    ``np.unique`` partials → one small ``groupby(code).sum`` (the distinct
    trigram space of normalized text is tiny vs the corpus) → sorted
    (codes, counts) arrays for ``searchsorted`` lookup. Returns
    (codes, counts, total)."""
    from ray.data.aggregate import Sum

    ds = _docs(sf_dir, columns=["text"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        codes, _ = _trigram_codes(df["text"])
        u, c = np.unique(codes, return_counts=True)
        return pd.DataFrame({"code": u.astype(np.int64),
                             "n": c.astype(np.int64)})

    from cmc_knowledge_graph_text2ttl_ray.functions.cluster import (
        coarse_group_reduce,
    )

    counts = (
        coarse_group_reduce(
            ds.map_batches(partial, batch_format="pandas"),
            ["code"],
            lambda g: g.groupby("code", as_index=False)["n"].sum(),
        )
        .to_pandas()                     # |distinct trigrams| rows — small
        .sort_values("code")
    )
    codes = counts["code"].to_numpy(dtype=np.int64)
    ns = counts["n"].to_numpy(dtype=np.int64)
    return codes, ns, int(ns.sum())


def lm_scores(sf_dir: str):
    """Per-document mean negative log2 trigram probability under the
    corpus's own char-trigram model (the cheap LM-quality signal used to
    rank training data; outliers = gibberish or boilerplate).

    Two phases: the model is trained DISTRIBUTED (:func:`char_trigram_model`),
    broadcast once via ``ray.put``, and scoring is one vectorized
    searchsorted + bincount pass per batch. Add-one smoothing over the
    observed trigram space keeps unseen trigrams finite."""
    import ray

    codes, ns, total = char_trigram_model(sf_dir)
    vocab = max(1, len(codes))
    logp = np.log2((ns + 1.0) / (total + vocab))
    unseen = np.log2(1.0 / (total + vocab))
    model_ref = ray.put((codes, logp, unseen))

    def score(df: pd.DataFrame) -> pd.DataFrame:
        from cmc_knowledge_graph_text2ttl_ray.functions.rounding import round_half_away

        codes_, logp_, unseen_ = ray.get(model_ref)
        tri, doc_idx = _trigram_codes(df["text"])
        out = np.zeros(len(df), dtype=np.float64)
        cnt = np.zeros(len(df), dtype=np.int64)
        if len(tri):
            pos = np.searchsorted(codes_, tri)
            pos_c = np.minimum(pos, len(codes_) - 1)
            lp = np.where(codes_[pos_c] == tri, logp_[pos_c], unseen_)
            np.add.at(out, doc_idx, -lp)
            np.add.at(cnt, doc_idx, 1)
        score_ = np.where(cnt > 0, out / np.maximum(cnt, 1), 0.0)
        return pd.DataFrame({
            "doc_id": df["doc_id"].to_numpy(),
            "n_trigrams": cnt,
            "lm_bits_per_trigram": round_half_away(score_, 4),
        })

    return _docs(sf_dir, columns=["doc_id", "text"]).map_batches(
        score, batch_format="pandas")


def document_frequency(sf_dir: str):
    """Corpus-wide document-frequency table: (token, n_docs, idf).

    The IDF table is the vocabulary-statistics backbone for TF-IDF ranking
    and rare-token filters. Scale shape: per-batch the (doc, token) pairs
    are DISTINCT-ed locally (one explode + drop_duplicates, C-speed) and
    collapsed to per-token partial counts, so the shuffle moves one
    (token, count) row per distinct token per block — bounded by vocabulary,
    not corpus size. Tokenization is a literal single-space split (keeping
    empty tokens) to stay byte-identical with the SQL oracle's
    ``string_split(text, ' ')``."""
    from ray.data.aggregate import Sum

    ds = _docs(sf_dir, columns=["doc_id", "text"])
    import pyarrow.parquet as pq

    n_total = pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        toks = df["text"].str.split(" ")
        lens = toks.str.len().fillna(0).astype(np.int64).to_numpy()
        flat = pd.DataFrame({
            "doc_id": np.repeat(df["doc_id"].to_numpy(), lens),
            "token": np.concatenate([np.asarray(t, dtype=object)
                                     for t in toks
                                     if isinstance(t, list) and len(t)])
            if lens.sum() else np.empty(0, dtype=object),
        })
        per_tok = (flat.drop_duplicates()["token"]
                   .value_counts())
        return pd.DataFrame({"token": per_tok.index.astype(str),
                             "n": per_tok.to_numpy(dtype=np.int64)})

    from cmc_knowledge_graph_text2ttl_ray.functions.cluster import (
        coarse_group_reduce,
    )

    # vocabulary-cardinality reduce → coarse hash partitions, not a
    # per-distinct-group Ray aggregate (see coarse_group_reduce)
    out = coarse_group_reduce(
        ds.map_batches(partial, batch_format="pandas"),
        ["token"],
        lambda g: g.groupby("token", as_index=False)["n"].sum()
        .rename(columns={"n": "n_docs"}),
    )

    def fin(df: pd.DataFrame) -> pd.DataFrame:
        from cmc_knowledge_graph_text2ttl_ray.functions.rounding import round_half_away

        if df.empty:
            return pd.DataFrame({"token": pd.Series(dtype="object"),
                                 "n_docs": pd.Series(dtype="int64"),
                                 "idf": pd.Series(dtype="float64")})
        n = df["n_docs"].to_numpy(dtype=np.float64)
        return pd.DataFrame({
            "token": df["token"].astype(str),
            "n_docs": df["n_docs"].astype("int64"),
            "idf": round_half_away(np.log(n_total / n), 4),
        })

    return out.map_batches(fin, batch_format="pandas").sort("token")


def tfidf_top_terms(sf_dir: str, k: int = 5):
    """Top-``k`` TF-IDF terms per document: (doc_id, token, tf, score).

    Two-phase: the IDF table comes from the distributed
    :func:`document_frequency` pass and broadcasts once (vocabulary-bounded,
    like a model artifact); scoring + per-doc top-k is then a single
    shuffle-free scan (per-batch explode → C-speed groupby count → idf map →
    sort + ``groupby.head(k)``). Ranking uses the ROUNDED score with a token
    tie-break so the result is deterministic and byte-equal to the SQL
    window-function oracle."""
    import ray

    df_tab = document_frequency(sf_dir).to_pandas()
    idf_ref = ray.put(dict(zip(df_tab["token"], df_tab["idf"])))

    def score(df: pd.DataFrame) -> pd.DataFrame:
        idf = ray.get(idf_ref)
        toks = df["text"].str.split(" ")
        lens = toks.str.len().fillna(0).astype(np.int64).to_numpy()
        flat = pd.DataFrame({
            "doc_id": np.repeat(df["doc_id"].to_numpy(), lens),
            "token": np.concatenate([np.asarray(t, dtype=object)
                                     for t in toks
                                     if isinstance(t, list) and len(t)])
            if lens.sum() else np.empty(0, dtype=object),
        })
        if flat.empty:
            return pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                                 "token": pd.Series(dtype="object"),
                                 "tf": pd.Series(dtype="int64"),
                                 "score": pd.Series(dtype="float64")})
        from cmc_knowledge_graph_text2ttl_ray.functions.rounding import round_half_away

        tf = (flat.groupby(["doc_id", "token"], sort=False)
              .size().rename("tf").reset_index())
        tf["score"] = round_half_away(
            tf["tf"].to_numpy(dtype=np.float64)
            * tf["token"].map(idf).to_numpy(dtype=np.float64), 4)
        tf = tf.sort_values(["doc_id", "score", "token"],
                            ascending=[True, False, True])
        top = tf.groupby("doc_id", sort=False).head(k)
        return pd.DataFrame({"doc_id": top["doc_id"].astype("int64"),
                             "token": top["token"].astype(str),
                             "tf": top["tf"].astype("int64"),
                             "score": top["score"]})

    return _docs(sf_dir, columns=["doc_id", "text"]).map_batches(
        score, batch_format="pandas").sort(
        ["doc_id", "score", "token"], descending=[False, True, False])


# per-stratum sampling rates expressed as 8-hex-digit md5-prefix
# thresholds (lexicographic compare works identically in Python and SQL)
STRATA_THRESHOLDS = {"en": "80000000", "_default": "40000000"}


def stratified_sample(sf_dir: str,
                      thresholds: dict[str, str] | None = None):
    """Deterministic hash-based stratified sampling: keep a doc when the
    first 8 hex chars of ``md5(doc_id)`` sort below its language's
    threshold (en: 50%, others: 25% by default).

    Shuffle-free, join-free, reproducible at ANY cluster size or batch
    split — the sampling decision depends only on the row itself (the same
    property as the train/val split operator). Oracle-checked via the
    identical md5-prefix rule in SQL."""
    import hashlib

    thresholds = thresholds or STRATA_THRESHOLDS
    default = thresholds.get("_default", "40000000")

    def keep(df: pd.DataFrame) -> pd.DataFrame:
        h = df["doc_id"].map(
            lambda d: hashlib.md5(str(d).encode()).hexdigest()[:8])
        limit = df["lang"].map(lambda l: thresholds.get(l, default))
        out = df.loc[(h < limit), ["doc_id", "lang"]]
        return out.astype({"doc_id": "int64"})

    return _docs(sf_dir, columns=["doc_id", "lang"]).map_batches(
        keep, batch_format="pandas").sort("doc_id")


# PII patterns are written to the RE2-compatible subset (no backrefs, no
# lookaround) so the Python engine and the DuckDB oracle match byte-for-byte;
# applied in order, each on the previous pattern's redacted output.
PII_PATTERNS: list[tuple[str, str, str]] = [
    # [0-9] not \d: Python's \d is Unicode-wide, RE2's is ASCII-only
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("phone", r"\+?[0-9][0-9\- ]{7,}[0-9]", "<PHONE>"),
    ("ipv4", r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b", "<IP>"),
]


class PiiRedactor:
    """Actor-pool stage: compiled PII regexes held per actor; one vectorized
    ``str.count`` + ``str.replace`` pass per pattern per batch.

    The synthetic corpus contains no organic PII, so a deterministic
    doc_id-derived contact line is appended first — it makes the oracle
    comparison exercise every pattern instead of passing vacuously (the SQL
    side builds the identical line, see ``oracle_sql()['docs_pii_redacted']``).
    """

    def __init__(self, augment: bool = True) -> None:
        import re

        self._pats = [(name, re.compile(pat), repl)
                      for name, pat, repl in PII_PATTERNS]
        self._augment = augment

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        text = df["text"].astype(str)
        if self._augment:
            ids = df["doc_id"].astype("int64")
            text = (text + " Contact user" + ids.astype(str)
                    + "@example.com or +1-202-555-01"
                    + (ids % 100).astype(str).str.zfill(2)
                    + " at 10.0." + (ids % 256).astype(str) + ".42")
        out = {"doc_id": df["doc_id"]}
        for name, pat, repl in self._pats:
            out[f"n_{name}"] = text.str.count(pat).astype("int64")
            text = text.str.replace(pat, repl, regex=True)
        out["text_redacted"] = text
        return pd.DataFrame(out)


def pii_redact(sf_dir: str, concurrency=(1, 4), augment: bool = True):
    """Per-doc PII redaction + per-category match counts (training-data
    hygiene pass). Columns: doc_id, n_email, n_phone, n_ipv4, text_redacted."""
    ds = _docs(sf_dir, columns=["doc_id", "text"])
    return ds.map_batches(PiiRedactor, batch_format="pandas",
                          fn_constructor_kwargs=dict(augment=augment),
                          concurrency=concurrency)


def normalize_texts(sf_dir: str, augment: bool = True):
    """Unicode + whitespace normalization: collapse ASCII whitespace runs,
    trim, then NFC-normalize (combining marks compose). The whitespace class
    is the explicit ASCII ``[ \\t\\n\\r\\f\\v]`` on both engines — Python's
    ``\\s`` is Unicode-wide while RE2's is ASCII, so the explicit class is
    what keeps the oracle byte-identical. ``augment`` appends a decomposed
    ``e+U+0301`` suffix so composition is actually exercised."""
    import re
    import unicodedata

    ws = re.compile(r"[ \t\n\r\f\v]+")

    def norm(df: pd.DataFrame) -> pd.DataFrame:
        text = df["text"].astype(str)
        if augment:
            text = text + "  cafe" + chr(0x0301) + " \t finale\n"
        # strip(" ") not strip(): DuckDB's trim() removes spaces only,
        # Python's bare strip() removes Unicode whitespace — keep them equal
        collapsed = text.str.replace(ws, " ", regex=True).str.strip(" ")
        fixed = collapsed.map(lambda s: unicodedata.normalize("NFC", s))
        return pd.DataFrame({
            "doc_id": df["doc_id"],
            "text_norm": fixed,
            "n_chars_norm": fixed.str.len().astype("int64"),
        })

    return _docs(sf_dir, columns=["doc_id", "text"]).map_batches(
        norm, batch_format="pandas")


def heavy_hitter_words(sf_dir: str, min_count: int = 900,
                       sketch_k: int = 2048):
    """EXACT corpus-wide heavy-hitter words via a two-phase
    sketch-then-verify plan (the scalable alternative to a full word
    groupby):

    1. each block runs a Misra-Gries-style top-``sketch_k`` summary (one
       vectorized value_counts) — the union of block candidates provably
       contains every word with global count ≥ n/sketch_k,
    2. the candidate set (≤ sketch_k × blocks, tiny vs the vocabulary)
       broadcasts via ``ray.put``; one filtered counting pass computes the
       EXACT counts of candidates only, and the threshold is applied to
       exact numbers — so the result equals the full groupby's, while the
       shuffle only ever moves candidate rows."""
    import ray

    from ray.data.aggregate import Sum

    ds = _docs(sf_dir, columns=["text"])

    def block_candidates(df: pd.DataFrame) -> pd.DataFrame:
        words = df["text"].str.split(" ").explode()
        top = words.value_counts().head(sketch_k)
        # first row carries the block's TOTAL word count so the driver can
        # verify the sketch guarantee without another pass
        weight = np.zeros(len(top), dtype=np.int64)
        if len(weight):
            weight[0] = len(words)
        return pd.DataFrame({"word": top.index.astype(str),
                             "block_words": weight})

    cand_df = ds.map_batches(block_candidates, batch_format="pandas").to_pandas()
    total_words = int(cand_df["block_words"].sum())
    if min_count * sketch_k < total_words:
        # the per-block top-k union only provably contains words with
        # global count ≥ N/sketch_k — beyond that the "exact" claim breaks
        raise ValueError(
            f"heavy_hitter_words: min_count={min_count} is below the sketch "
            f"guarantee N/sketch_k={total_words}/{sketch_k}"
            f"={total_words / sketch_k:.0f}; raise sketch_k or min_count")
    cand = set(cand_df["word"])
    cand_ref = ray.put(cand)

    def exact_counts(df: pd.DataFrame) -> pd.DataFrame:
        words = df["text"].str.split(" ").explode()
        words = words[words.isin(ray.get(cand_ref))]
        c = words.value_counts()
        return pd.DataFrame({"word": c.index.astype(str),
                             "n": c.to_numpy(dtype=np.int64)})

    from cmc_knowledge_graph_text2ttl_ray.functions.cluster import (
        coarse_group_reduce,
    )

    out = coarse_group_reduce(
        ds.map_batches(exact_counts, batch_format="pandas"),
        ["word"],
        lambda g: g.groupby("word", as_index=False)["n"].sum(),
    )

    def threshold(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["n"] >= min_count]
        return df.astype({"n": "int64"})

    return out.map_batches(threshold, batch_format="pandas").sort(
        ["n", "word"], descending=[True, False])


def top_ngrams(sf_dir: str, n: int = 2, k: int = 20):
    """Corpus-wide top-k word n-grams (exact counts, deterministic
    tie-break on the n-gram string).

    Scale shape: per-block partial counts (one vectorized value_counts per
    batch — the shuffle ships (ngram, partial_cnt) rows, never text) →
    groupby sum → per-block top-k truncation (a global top-k row must be in
    its block's top-k) → final sort over ≤ k × blocks candidate rows only,
    so the ordering step never sees the full distinct-ngram table.
    """
    from ray.data.aggregate import Sum

    ds = _docs(sf_dir, columns=["text"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        words = df["text"].str.split(" ")
        lens = words.str.len().to_numpy(dtype=np.int64)
        empty = pd.DataFrame({"ngram": pd.Series(dtype="object"),
                              "cnt": pd.Series(dtype="int64")})
        if lens.sum() == 0:
            return empty
        flat = np.concatenate([np.asarray(w, dtype=object) for w in words])
        doc_idx = np.repeat(np.arange(len(df), dtype=np.int64), lens)
        m = len(flat) - (n - 1)
        if m <= 0:
            return empty
        # an n-gram is valid when all n words come from the same doc
        valid = doc_idx[: m] == doc_idx[n - 1:]
        # count in integer space: factorize words once, pack each n-gram's
        # word codes into one int64 key, np.unique the keys, and build the
        # n-gram STRING only once per distinct key — the per-occurrence
        # Python string concat this replaces dominated the stage wall.
        codes, uniq_words = pd.factorize(pd.Series(flat), sort=False)
        codes = codes.astype(np.int64)
        base = np.int64(max(len(uniq_words), 1))
        uw = np.asarray(uniq_words, dtype=object)
        if n * np.log2(float(base) + 1) < 62:
            keys = codes[:m][valid].copy()
            for i in range(1, n):
                keys = keys * base + codes[i: m + i][valid]
            if len(keys) == 0:
                return empty
            uk, cnts = np.unique(keys, return_counts=True)
            # unpack distinct keys back to word codes (last word first)
            parts = []
            rem = uk.copy()
            for _ in range(n):
                parts.append(rem % base)
                rem //= base
            parts.reverse()
        else:
            # packed key would overflow int64: unique over the code columns
            cols = np.stack([codes[i: m + i][valid] for i in range(n)],
                            axis=1)
            if len(cols) == 0:
                return empty
            uk, cnts = np.unique(cols, axis=0, return_counts=True)
            parts = [uk[:, i] for i in range(n)]
        grams = uw[parts[0]]
        for p in parts[1:]:
            grams = grams + " "
            grams = grams + uw[p]
        return pd.DataFrame({"ngram": grams,
                             "cnt": cnts.astype(np.int64)})

    partials = ds.map_batches(partial, batch_format="pandas").materialize()

    # Adaptive finish: the distributed groupby's shuffle has seconds of
    # fixed overhead, so when the (ngram, partial_cnt) table is small —
    # vocabulary-bounded, typically ≪ corpus size — sum it on the driver;
    # past the threshold, run the full distributed combine.
    if partials.count() <= 2_000_000:
        pdf = partials.to_pandas()
        if pdf.empty:
            return ray.data.from_pandas(pdf)
        agg = pdf.groupby("ngram", as_index=False)["cnt"].sum()
        return ray.data.from_pandas(
            agg.sort_values(["cnt", "ngram"], ascending=[False, True])
            .head(k).reset_index(drop=True))

    from cmc_knowledge_graph_text2ttl_ray.functions.cluster import (
        coarse_group_reduce,
    )

    def combine_topk(g: pd.DataFrame) -> pd.DataFrame:
        # groups are complete per coarse partition: sum, then truncate to
        # the partition's top-k (a global top-k row must be in its
        # partition's top-k)
        s = g.groupby("ngram", as_index=False)["cnt"].sum()
        return s.sort_values(["cnt", "ngram"],
                             ascending=[False, True]).head(k)

    return (
        coarse_group_reduce(partials, ["ngram"], combine_topk)
        .sort(["cnt", "ngram"], descending=[True, False])
        .limit(k)
    )


def inverted_index(sf_dir: str):
    """Term → (document frequency, sorted posting list) over the corpus —
    the retrieval-index build step as a Ray pipeline.

    Scale shape: each block emits DISTINCT (term, doc_id) pairs (one
    vectorized explode + drop_duplicates — raw positions never shuffle);
    postings assemble in one ``groupby(term)`` with a vectorized in-group
    sort. Contract: one term's postings fit one group — true for any
    index that stores a flat posting list; past that, shard the index by
    doc-id range per partition (the IVF layout in similarity.py shows the
    partitioned-parquet pattern) rather than growing a single list."""

    ds = _docs(sf_dir, columns=["doc_id", "text"])

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        words = df["text"].str.split(" ")
        lens = words.str.len().to_numpy(dtype=np.int64)
        if lens.sum() == 0:
            return pd.DataFrame({"term": pd.Series(dtype="object"),
                                 "doc_id": pd.Series(dtype="int64")})
        flat = np.concatenate([np.asarray(w, dtype=object) for w in words])
        out = pd.DataFrame({
            "term": flat,
            "doc_id": np.repeat(df["doc_id"].to_numpy(dtype=np.int64), lens),
        })
        return out.drop_duplicates()

    def assemble(g: pd.DataFrame) -> pd.DataFrame:
        # ALL terms of the coarse partition in one vectorized pass
        g = g.drop_duplicates().sort_values(["term", "doc_id"])
        ids = g["doc_id"].astype(str)
        agg = ids.groupby(g["term"], sort=False).agg(",".join)
        dfs = g.groupby("term", sort=False).size()
        return pd.DataFrame({
            "term": agg.index.astype(object),
            "df": dfs.to_numpy(dtype=np.int64),
            "postings": agg.to_numpy(dtype=object),
        })

    from cmc_knowledge_graph_text2ttl_ray.functions.cluster import (
        coarse_group_reduce,
    )

    return coarse_group_reduce(
        ds.map_batches(pairs, batch_format="pandas"),
        ["term"], assemble,
    )


def bm25_topk(sf_dir: str, query: str = "spark merge window", k: int = 10,
              k1: float = 1.2, b: float = 0.75):
    """BM25 retrieval: top-k documents for a bag-of-words query.

    Okapi BM25 (Robertson & Zaragoza 2009), idf = ln((N-df+.5)/(df+.5)+1).

    Scale shape: corpus stats (N, avgdl) are one streaming aggregate; df
    is computed for the QUERY'S terms only (per-block distinct pairs →
    tiny groupby) and broadcast as an idf dict; scoring is then a single
    lineage-free pass — per block a vectorized explode/filter/pivot gives
    each doc's tf vector, blocks emit only their local top-k, and the
    final exact top-k sorts ≤ k × blocks candidate rows."""
    import ray
    from ray.data.aggregate import Count, Sum

    terms = sorted(set(query.split()))
    ds = _docs(sf_dir, columns=["doc_id", "text"])

    def len_partial(df: pd.DataFrame) -> pd.DataFrame:
        dl = df["text"].str.split(" ").str.len()
        return pd.DataFrame({"n": [len(df)], "dl_sum": [int(dl.sum())]})

    tot = ds.map_batches(len_partial, batch_format="pandas").sum(
        ["n", "dl_sum"])
    n_docs = int(tot["sum(n)"])
    if n_docs == 0:
        return pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                             "score": pd.Series(dtype="float64")})
    avgdl = tot["sum(dl_sum)"] / n_docs

    def df_pairs(df: pd.DataFrame) -> pd.DataFrame:
        words = df["text"].str.split(" ")
        # null texts yield NaN lengths; guard like the sibling explode UDFs
        lens = words.str.len().fillna(0).astype(np.int64).to_numpy()
        arrays = [np.asarray(w, dtype=object) for w in words
                  if isinstance(w, list) and len(w)]
        if not arrays:
            return pd.DataFrame({"term": pd.Series(dtype=object),
                                 "doc_id": pd.Series(dtype="int64")})
        out = pd.DataFrame({
            "term": np.concatenate(arrays),
            "doc_id": np.repeat(df["doc_id"].to_numpy(dtype=np.int64),
                                lens),
        })
        return out[out["term"].isin(terms)].drop_duplicates()

    from cmc_knowledge_graph_text2ttl_ray.functions.cluster import (
        coarse_group_reduce,
    )

    df_tbl = (
        coarse_group_reduce(
            ds.map_batches(df_pairs, batch_format="pandas"),
            ["term"],
            lambda g: g.groupby("term", as_index=False)
            .size().rename(columns={"size": "df"}),
        )
        .to_pandas()
    )
    idf = {t: float(np.log((n_docs - d + 0.5) / (d + 0.5) + 1.0))
           for t, d in zip(df_tbl["term"], df_tbl["df"])}
    idf_ref = ray.put(idf)

    def score_block(df: pd.DataFrame) -> pd.DataFrame:
        idfs = ray.get(idf_ref)
        words = df["text"].str.split(" ")
        dl = words.str.len().to_numpy(dtype=np.float64)
        lens = words.str.len().to_numpy(dtype=np.int64)
        flat = np.concatenate([np.asarray(w, dtype=object) for w in words]) \
            if lens.sum() else np.array([], dtype=object)
        row_idx = np.repeat(np.arange(len(df), dtype=np.int64), lens)
        score = np.zeros(len(df), dtype=np.float64)
        denom_norm = k1 * (1.0 - b + b * dl / avgdl)
        for t, w_idf in idfs.items():
            tf = np.bincount(row_idx[flat == t], minlength=len(df))
            s = w_idf * tf * (k1 + 1.0) / (tf + denom_norm)
            score += np.where(tf > 0, s, 0.0)
        out = pd.DataFrame({"doc_id": df["doc_id"].astype("int64"),
                            "score": score})
        out = out[out["score"] > 0]
        return out.sort_values(["score", "doc_id"],
                               ascending=[False, True]).head(k)

    res = (
        ds.map_batches(score_block, batch_format="pandas")
        .sort(["score", "doc_id"], descending=[True, False])
        .limit(k)
        .to_pandas()
    )
    res["score"] = round_half_away(res["score"], 4)
    return res


def quality_deciles(sf_dir: str, qs=tuple(i / 10 for i in range(1, 10))):
    """Decile bucketing over document length — the quality-resampling
    primitive (bucket a corpus by a score, then sample per bucket).

    Scale shape: two bounded driver round-trips, no all-to-all. (1) each
    block emits a (n_chars → count) histogram — bounded by DISTINCT
    lengths, not rows; the driver merges them and reads the exact
    ``percentile_disc`` thresholds off the cumulative distribution.
    (2) thresholds broadcast back; each block buckets its rows vectorized
    (searchsorted) and emits ≤ 10 partial (decile, n, sum) rows; the
    driver sums them. Returns (decile, n_docs, avg_chars) — decile d =
    1 + #thresholds strictly below the value."""
    import ray

    ds = _docs(sf_dir, columns=["text"])

    def hist(t: pa.Table) -> pa.Table:
        n = pc.utf8_length(t["text"]).cast(pa.int64())
        vc = n.combine_chunks().value_counts()
        return pa.table({"n_chars": vc.field("values"),
                         "cnt": vc.field("counts").cast(pa.int64())})

    h = (ds.map_batches(hist, batch_format="pyarrow").to_pandas()
         .groupby("n_chars", as_index=False)["cnt"].sum()
         .sort_values("n_chars"))
    if h.empty:
        return pd.DataFrame({"decile": pd.Series(dtype="int64"),
                             "n_docs": pd.Series(dtype="int64"),
                             "avg_chars": pd.Series(dtype="float64")})
    vals = h["n_chars"].to_numpy(np.int64)
    cum = h["cnt"].to_numpy(np.int64).cumsum()
    total = int(cum[-1])
    # percentile_disc: value at rank ceil(q*n) (1-based)
    ranks = np.maximum(1, np.ceil(np.asarray(qs) * total).astype(np.int64))
    thresholds = vals[np.searchsorted(cum, ranks)]
    thr_ref = ray.put(np.asarray(thresholds, dtype=np.int64))

    def partial(t: pa.Table) -> pa.Table:
        thr = ray.get(thr_ref)
        n = pc.utf8_length(t["text"]).cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        # decile = 1 + #thresholds strictly below the value
        dec = 1 + np.searchsorted(thr, n, side="left")
        # a value equal to a threshold belongs to that threshold's bucket:
        # side="left" counts thresholds < value... but equal thresholds
        # must not push the value up a bucket, which side="left" ensures.
        uniq, inv = np.unique(dec, return_inverse=True)
        cnt = np.bincount(inv, minlength=len(uniq)).astype(np.int64)
        s = np.zeros(len(uniq), dtype=np.int64)
        np.add.at(s, inv, n)
        return pa.table({"decile": pa.array(uniq, pa.int64()),
                         "n": pa.array(cnt, pa.int64()),
                         "s": pa.array(s, pa.int64())})

    parts = (ds.map_batches(partial, batch_format="pyarrow").to_pandas()
             .groupby("decile", as_index=False)[["n", "s"]].sum())
    return pd.DataFrame({
        "decile": parts["decile"].astype("int64"),
        "n_docs": parts["n"].astype("int64"),
        "avg_chars": round_half_away(parts["s"] / parts["n"], 2),
    }).sort_values("decile").reset_index(drop=True)


def weighted_sample(sf_dir: str, k: int = 50):
    """Deterministic weighted sampling WITHOUT replacement
    (Efraimidis-Spirakis A-Res): weight = document length, uniform u drawn
    from md5(doc_id) so every run and every cluster size draws the same
    sample, selection key = u^(1/w), global top-k by key.

    Scale shape: the key is computed per block; each block keeps its local
    top-k (a global winner must be in its block's top-k), so the final
    exact sort sees ≤ k × blocks rows — the distributed-reservoir shape.
    No shuffle of the corpus, ever."""
    ds = _docs(sf_dir, columns=["doc_id", "text"])

    def keyed(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                                 "n_chars": pd.Series(dtype="int64"),
                                 "sel_key": pd.Series(dtype="float64")})
        u = (df["doc_id"].map(
            lambda d: int(hashlib.md5(str(d).encode()).hexdigest()[:8], 16))
            .to_numpy(np.float64))
        u = u / 4294967296.0  # 2^32: u ∈ [0, 1)
        w = df["text"].str.len().to_numpy(np.float64)
        key = u ** (1.0 / np.maximum(w, 1.0))
        out = pd.DataFrame({"doc_id": df["doc_id"].astype("int64"),
                            "n_chars": w.astype(np.int64),
                            "sel_key": key})
        return out.sort_values(["sel_key", "doc_id"],
                               ascending=[False, True]).head(k)

    return (ds.map_batches(keyed, batch_format="pandas")
            .sort(["sel_key", "doc_id"], descending=[True, False])
            .limit(k)
            .select_columns(["doc_id", "n_chars"]))


def source_stats(sf_dir: str):
    """Per-source corpus profile: doc count, mean length, distinct langs —
    the domain-level triage table a crawl-corpus curator reads first.

    Scale shape: ``source`` is low-cardinality (a domain-bucket label), so
    one scan emits per-block partials (count, char sum, per-source lang
    set) and a tiny driver combine finishes — no all-to-all, the fact
    table streams once."""
    from cmc_knowledge_graph_text2ttl_ray.functions.rounding import (
        round_half_away,
    )

    ds = _docs(sf_dir, columns=["source", "n_chars", "lang"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("source")
        out = g.agg(n_docs=("n_chars", "size"), sum_chars=("n_chars", "sum"))
        out["langs"] = g["lang"].agg(lambda s: "\x00".join(sorted(set(s))))
        return out.reset_index()

    parts = ds.map_batches(partial, batch_format="pandas").to_pandas()
    if parts.empty:
        import pyarrow as _pa

        return pd.DataFrame({"source": pd.Series(dtype=object),
                             "n_docs": pd.Series(dtype="int64"),
                             "avg_chars": pd.Series(dtype="float64"),
                             "n_langs": pd.Series(dtype="int64")})
    g = parts.groupby("source")
    out = g.agg(n_docs=("n_docs", "sum"), sum_chars=("sum_chars", "sum"))
    out["n_langs"] = g["langs"].agg(
        lambda s: len(set.union(*(set(x.split("\x00")) for x in s))))
    out = out.reset_index()
    out["avg_chars"] = round_half_away(
        out["sum_chars"].to_numpy(np.float64) / out["n_docs"].to_numpy(), 2)
    return (out[["source", "n_docs", "avg_chars", "n_langs"]]
            .astype({"n_docs": "int64", "n_langs": "int64"})
            .sort_values("source").reset_index(drop=True))


def url_dedup(sf_dir: str):
    """Canonical-URL dedup — the first (and cheapest) dedup pass of every
    crawl pipeline: canonicalize each page URL (RFC 3986 syntax rules +
    tracking-param strip, see ``functions/url.py``), then count duplicates
    and keep the first doc per canonical URL.

    The documents table carries no URL column, so each doc's messy URL is
    derived deterministically from ``doc_id`` (three variant families:
    tracking params + fragment + mixed case / unsorted params + default
    port / trailing slash) — the oracle states the *expected canonical
    form* directly, so the normalizer is verified end-to-end.

    Scale shape: URL synthesis + canonicalization are one streaming scan;
    only (canonical_url, doc_id) pairs shuffle through ONE coarse exchange
    keyed by the canonical URL (hash-partitioned, skew-free: URL keys are
    near-unique)."""
    from cmc_knowledge_graph_text2ttl_ray.functions.cluster import (
        coarse_group_reduce,
    )
    from cmc_knowledge_graph_text2ttl_ray.functions.url import (
        canonicalize_urls,
    )

    ds = _docs(sf_dir, columns=["doc_id"])

    def messy(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["doc_id"].to_numpy(np.int64)
        urls = []
        for i in ids:
            host, path, v = int(i) % 50, int(i) % 1000, int(i) % 3
            if v == 0:
                u = (f"HTTP://Site{host}.Example.COM/path/{path}"
                     f"?utm_source=x&b=2&a=1#frag")
            elif v == 1:
                u = f"http://site{host}.example.com:80/path/{path}?b=2&a=1"
            else:
                u = f"http://Site{host}.example.com//path//{path}/"
            urls.append(u)
        pairs = pd.DataFrame({"doc_id": ids,
                              "canonical_url": canonicalize_urls(urls)})
        return (pairs.groupby("canonical_url", as_index=False)
                .agg(n_dups=("doc_id", "size"),
                     first_doc_id=("doc_id", "min")))

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        return (g.groupby("canonical_url", as_index=False)
                .agg(n_dups=("n_dups", "sum"),
                     first_doc_id=("first_doc_id", "min")))

    out = coarse_group_reduce(
        ds.map_batches(messy, batch_format="pandas"),
        ["canonical_url"], combine,
    ).to_pandas()
    return (out.astype({"n_dups": "int64", "first_doc_id": "int64"})
            .sort_values("canonical_url").reset_index(drop=True))


def source_quota_sample(sf_dir: str, quota: int = 20):
    """Per-source quota sampling — cap each source's contribution at
    ``quota`` docs, chosen deterministically by md5(doc_id) order (the
    standard down-weighting of over-represented domains when mixing a
    training corpus; hash order makes the pick reproducible at any
    cluster size, no RNG state).

    Scale shape: each block keeps at most ``quota`` candidate rows per
    source (a vectorized groupby head), so at most
    ``quota × n_sources × n_blocks`` small rows shuffle through the final
    per-source selection — the fact table itself never moves."""
    ds = _docs(sf_dir, columns=["doc_id", "source"])

    def keyed_topn(df: pd.DataFrame) -> pd.DataFrame:
        key = df["doc_id"].map(
            lambda d: hashlib.md5(str(d).encode()).hexdigest())
        d = pd.DataFrame({"source": df["source"],
                          "doc_id": df["doc_id"].astype("int64"),
                          "sel_key": key})
        d = d.sort_values(["source", "sel_key", "doc_id"], kind="stable")
        return d.groupby("source", sort=False).head(quota)

    parts = ds.map_batches(keyed_topn, batch_format="pandas").to_pandas()
    if parts.empty:
        return pd.DataFrame({"source": pd.Series(dtype=object),
                             "doc_id": pd.Series(dtype="int64")})
    parts = parts.sort_values(["source", "sel_key", "doc_id"], kind="stable")
    out = parts.groupby("source", sort=False).head(quota)
    return (out[["source", "doc_id"]]
            .sort_values(["source", "doc_id"]).reset_index(drop=True))


def temperature_sample(sf_dir: str, alpha: float = 0.5,
                       target_frac: float = 0.5):
    """Temperature-based source mixing: sample each source with
    probability ∝ n_s^alpha (alpha < 1 up-weights small sources, the
    standard multi-source pretraining mix), scaled so the expected total
    is ``target_frac`` of the corpus; per-doc selection is a
    deterministic md5 threshold — reproducible at any cluster size, no
    RNG state. Returns the selected ``(source, doc_id)`` rows.

    Scale shape: one small per-source count groupby (sources ≪ rows) →
    thresholds broadcast via ``ray.put`` → ONE streaming filter scan.
    The corpus never shuffles.
    """
    import ray

    counts = (_docs(sf_dir, columns=["source"])
              .groupby("source").count().to_pandas())
    if counts.empty:
        return pd.DataFrame({"source": pd.Series(dtype=object),
                             "doc_id": pd.Series(dtype="int64")})
    n = counts["count()"].to_numpy(np.float64)
    wgt = np.power(n, alpha)
    total = n.sum()
    p = np.minimum(1.0, (wgt / wgt.sum()) * total * target_frac / n)
    thresholds = {
        s: ("g" if ps >= 1.0 else format(int(ps * 16**8), "08x"))
        for s, ps in zip(counts["source"], p)
    }
    thr_ref = ray.put(thresholds)

    def pick(df: pd.DataFrame) -> pd.DataFrame:
        thr = ray.get(thr_ref)
        h = df["doc_id"].map(
            lambda d: hashlib.md5(f"t:{d}".encode()).hexdigest()[:8])
        keep = h < df["source"].map(thr).fillna("00000000")
        d = df[keep.to_numpy()]
        return pd.DataFrame({"source": d["source"],
                             "doc_id": d["doc_id"].astype("int64")})

    return _docs(sf_dir, columns=["doc_id", "source"]) \
        .map_batches(pick, batch_format="pandas")
