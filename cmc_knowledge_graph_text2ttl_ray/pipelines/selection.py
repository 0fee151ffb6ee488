"""Training-data selection operators: a distributed logistic-regression
quality classifier and DSIR-style importance resampling.

Both are the standard "pick the good subset of the web" components of a
large-scale pretraining pipeline (a hashed-feature linear quality filter,
and Data Selection via Importance Resampling — Xie et al. 2023,
arXiv:2302.03169 — which weights raw documents by the likelihood ratio of
a target-domain hashed n-gram model over the raw-corpus model).

Scale shape (the part that matters at 100 TB):

- the CORPUS never shuffles — every training iteration and every scoring
  pass is a streaming ``map_batches`` over the documents table;
- what does move is bounded by the FEATURE space, not the corpus: per-batch
  sparse gradient contributions / n-gram counts are pre-summed inside the
  batch, exchanged with ``coarse_group_reduce`` (hash-partitioned, one
  vectorized combine per partition) and collapse to ≤ ``n_features`` rows
  before the driver folds them into the weight vector;
- model state (weight vector, log-ratio table) is broadcast once per
  iteration via ``ray.put`` — a few MB read by every task, never
  re-shipped per batch.

Labels for the demo ``queries()`` entry are synthetic-but-text-derived
(see :func:`quality_labels`): the engine's job is the distributed
machinery; any (doc_id, text, label) dataset plugs into
:func:`train_quality_classifier` unchanged.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray
import ray.data

from cmc_knowledge_graph_text2ttl_ray.functions.cluster import coarse_group_reduce
from cmc_knowledge_graph_text2ttl_ray.functions.rounding import round_half_away

__all__ = [
    "hashed_token_features",
    "quality_labels",
    "train_quality_classifier",
    "classifier_score_batch",
    "quality_classifier_scores",
    "dsir_logratio_model",
    "dsir_weights",
    "dsir_topk",
]


def _docs(sf_dir: str, columns=None):
    return ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=columns)


def hashed_token_features(texts: pd.Series, n_features: int
                          ) -> tuple[np.ndarray, np.ndarray]:
    """(doc_idx, feature_bucket) pairs for every hashed token OCCURRENCE
    (count features — a per-occurrence pair contributes weight 1, so a
    count-structured signal stays linearly separable). Deterministic
    (pandas uint64 hashing, fixed default key), C-speed: one explode +
    one hash pass."""
    toks = texts.fillna("").str.split()
    lens = toks.str.len().fillna(0).astype(np.int64).to_numpy()
    arrays = [np.asarray(t, dtype=object) for t in toks
              if isinstance(t, list) and len(t)]
    if not arrays:
        return (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64))
    flat = pd.Series(np.concatenate(arrays))
    feat = (pd.util.hash_pandas_object(flat, index=False).to_numpy(np.uint64)
            % np.uint64(n_features)).astype(np.int64)
    doc_idx = np.repeat(np.arange(len(texts), dtype=np.int64), lens)
    return doc_idx, feat


def quality_labels(texts: pd.Series, min_tokens: int = 56) -> np.ndarray:
    """Heuristic bootstrap label: 1 when the doc has ≥ ``min_tokens``
    whitespace tokens (the default is the sf-corpus median). This mirrors
    how production pipelines actually train linear quality filters —
    label with a heuristic or an expensive signal, then learn a cheap
    hashed-feature model that applies at full-corpus scale. Learnable
    from standardized count features, so the trainer's convergence is
    testable on the fixed synthetic corpus."""
    n = texts.fillna("").str.split().str.len().fillna(0).to_numpy()
    return (n >= min_tokens).astype(np.int64)


def _sigmoid(z: np.ndarray) -> np.ndarray:
    out = np.empty_like(z)
    pos = z >= 0
    out[pos] = 1.0 / (1.0 + np.exp(-z[pos]))
    ez = np.exp(z[~pos])
    out[~pos] = ez / (1.0 + ez)
    return out


def _feature_stats(ds, n_features: int, n_total: int
                   ) -> tuple[np.ndarray, np.ndarray]:
    """Per-feature (mean, std) of the per-doc COUNT over the whole
    corpus, computed distributed: in-batch (feature, Σc, Σc²) partials →
    coarse reduce → ≤ n_features rows to the driver. Docs that lack a
    feature contribute count 0 (the moments are over all docs)."""

    def partials(df: pd.DataFrame) -> pd.DataFrame:
        di, feat = hashed_token_features(df["text"], n_features)
        if not len(feat):
            return pd.DataFrame({"feat": pd.Series(dtype="int64"),
                                 "s1": pd.Series(dtype="float64"),
                                 "s2": pd.Series(dtype="float64")})
        packed, cnt = np.unique(di * np.int64(n_features) + feat,
                                return_counts=True)
        fu = (packed % np.int64(n_features)).astype(np.int64)
        c = cnt.astype(np.float64)
        out = pd.DataFrame({"feat": fu, "s1": c, "s2": c * c})
        return out.groupby("feat", as_index=False).sum()

    red = coarse_group_reduce(
        ds.map_batches(partials, batch_format="pandas"),
        ["feat"],
        lambda p: p.groupby("feat", as_index=False)[["s1", "s2"]].sum(),
        n_rows_hint=n_features,
    ).to_pandas()
    mean = np.zeros(n_features, dtype=np.float64)
    var = np.zeros(n_features, dtype=np.float64)
    f = red["feat"].to_numpy(np.int64)
    mean[f] = red["s1"].to_numpy(np.float64) / max(n_total, 1)
    var[f] = red["s2"].to_numpy(np.float64) / max(n_total, 1) - mean[f] ** 2
    std = np.sqrt(np.maximum(var, 1e-12))
    std[mean == 0] = 1.0  # unseen features: identity transform
    return mean, std



def _train_local(di: np.ndarray, feat: np.ndarray, y: np.ndarray,
                 n_features: int, iters: int, lr: float, l2: float) -> dict:
    """Same standardized full-batch GD as the distributed loop, run on
    collected (doc_idx, feature) occurrence pairs — one numpy pass per
    iteration instead of one Ray execution per iteration."""
    n_total = len(y)
    # per-(doc, feat) counts → per-feature moments over ALL docs
    mean = np.zeros(n_features, dtype=np.float64)
    var = np.zeros(n_features, dtype=np.float64)
    if len(feat):
        packed, cnt = np.unique(di * np.int64(n_features) + feat,
                                return_counts=True)
        fu = (packed % np.int64(n_features)).astype(np.int64)
        c = cnt.astype(np.float64)
        np.add.at(mean, fu, c)
        np.add.at(var, fu, c * c)
    mean /= max(n_total, 1)
    var = var / max(n_total, 1) - mean ** 2
    std = np.sqrt(np.maximum(var, 1e-12))
    std[mean == 0] = 1.0

    w = np.zeros(n_features, dtype=np.float64)
    bias = 0.0
    order = np.argsort(feat, kind="stable") if len(feat) else None
    fs = feat[order] if len(feat) else feat
    dio = di[order] if len(feat) else di
    fu2, start = (np.unique(fs, return_index=True) if len(feat)
                  else (np.zeros(0, np.int64), np.zeros(0, np.int64)))
    yf = y.astype(np.float64)
    for _ in range(iters):
        offset = float(bias - (mean / std) @ w)
        ws = w / std
        z = np.full(n_total, offset, dtype=np.float64)
        if len(feat):
            np.add.at(z, di, ws[feat])
        err = _sigmoid(z) - yf
        acc = np.zeros(n_features, dtype=np.float64)
        if len(feat):
            acc[fu2] = np.add.reduceat(err[dio], start)
        err_sum = err.sum()
        grad = acc / std - (mean / std) * err_sum
        grad /= n_total
        grad += l2 * w
        w = w - lr * grad
        bias -= lr * err_sum / n_total
    return {"w": w, "bias": bias, "mean": mean, "std": std,
            "n_features": n_features}


def train_quality_classifier(
    ds,
    *,
    label_fn=quality_labels,
    n_features: int = 1 << 18,
    iters: int = 10,
    lr: float = 5.0,
    l2: float = 1e-6,
    driver_threshold_docs: int = 50_000,
    force_distributed: bool = False,
) -> dict:
    """Distributed full-batch logistic regression on STANDARDIZED hashed
    token-count features ((c − μ_f)/σ_f — raw counts oversaturate the
    sigmoid after one step and full-batch GD stalls; measured on the sf
    corpus: 0.50 accuracy raw vs 0.996+ standardized at 10 iterations).

    Returns the model dict ``{"w", "bias", "mean", "std", "n_features"}``.

    Scale shape: one stats pass + ``iters`` gradient passes, each a
    streaming ``map_batches`` over the corpus; every exchange is bounded
    by the feature space (sparse per-batch pre-summed pairs through
    ``coarse_group_reduce``); weights/stats broadcast per iteration via
    ``ray.put``; driver memory O(n_features). The standardization offset
    ``Σ_f (μ_f/σ_f)·w_f`` and its gradient correction are scalar algebra
    applied on the driver — the tasks only ever see sparse occurrences.
    """
    n_total = int(ds.count())
    model = {"w": np.zeros(n_features, dtype=np.float64), "bias": 0.0,
             "mean": np.zeros(n_features), "std": np.ones(n_features),
             "n_features": n_features}
    if n_total == 0:
        return model
    if n_total <= driver_threshold_docs and not force_distributed:
        # collect (doc_id, feature) occurrence pairs ONCE and iterate
        # locally: each distributed iteration costs a full Ray execution
        # (~2-4 s of scheduling/actor overhead) that dwarfs the math on
        # small corpora (measured: 22-48 s distributed vs <1 s local at
        # 500 docs). Keyed by doc_id so the result is independent of
        # block arrival order.
        def pairs_and_labels(df: pd.DataFrame) -> pd.DataFrame:
            di, feat = hashed_token_features(df["text"], n_features)
            y = label_fn(df["text"]).astype(np.int64)
            ids = df["doc_id"].to_numpy(np.int64)
            # label rows use feat = -1; occurrence rows carry y = -1
            return pd.DataFrame({
                "doc": np.concatenate([ids[di] if len(feat)
                                       else np.zeros(0, np.int64), ids]),
                "feat": np.concatenate([feat, np.full(len(df), -1,
                                                      np.int64)]),
                "y": np.concatenate([np.full(len(feat), -1, np.int64), y]),
            })

        allp = ds.map_batches(pairs_and_labels,
                              batch_format="pandas").to_pandas()
        if allp.empty:
            return model
        lab = allp[allp["feat"] == -1].sort_values("doc")
        occ = allp[allp["feat"] != -1].sort_values(
            ["doc", "feat"], kind="stable")
        doc_ids = lab["doc"].to_numpy(np.int64)
        di_local = np.searchsorted(doc_ids, occ["doc"].to_numpy(np.int64))
        return _train_local(di_local, occ["feat"].to_numpy(np.int64),
                            lab["y"].to_numpy(np.int64),
                            n_features, iters, lr, l2)

    mean, std = _feature_stats(ds, n_features, n_total)
    model["mean"], model["std"] = mean, std
    w = np.zeros(n_features, dtype=np.float64)
    bias = 0.0

    for _ in range(iters):
        # z_doc = Σ_occ w_f/σ_f + (bias − Σ_f μ_f/σ_f·w_f): the second
        # term is one scalar, precomputed here and shipped with the pack
        offset = float(bias - (mean / std) @ w)
        pack_ref = ray.put((w / std, offset))

        def grad_pairs(df: pd.DataFrame) -> pd.DataFrame:
            ws, off = ray.get(pack_ref)
            y = label_fn(df["text"]).astype(np.float64)
            di, feat = hashed_token_features(df["text"], n_features)
            z = np.full(len(df), off, dtype=np.float64)
            if len(feat):
                np.add.at(z, di, ws[feat])
            err = _sigmoid(z) - y
            g = np.zeros(0, dtype=np.float64)
            fu = np.zeros(0, dtype=np.int64)
            if len(feat):
                order = np.argsort(feat, kind="stable")
                fs, es = feat[order], err[di[order]]
                fu, start = np.unique(fs, return_index=True)
                g = np.add.reduceat(es, start)
            # the error sum rides along as feature id n_features — it is
            # both the bias gradient and the μ/σ correction input
            return pd.DataFrame({
                "feat": np.concatenate([fu, [np.int64(n_features)]]),
                "g": np.concatenate([g, [err.sum()]]),
            })

        reduced = coarse_group_reduce(
            ds.map_batches(grad_pairs, batch_format="pandas"),
            ["feat"],
            lambda p: p.groupby("feat", as_index=False)["g"].sum(),
            n_rows_hint=n_features,
        ).to_pandas()
        acc = np.zeros(n_features + 1, dtype=np.float64)
        acc[reduced["feat"].to_numpy(np.int64)] = \
            reduced["g"].to_numpy(np.float64)
        err_sum = acc[n_features]
        grad = acc[:n_features] / std - (mean / std) * err_sum
        grad /= n_total
        grad += l2 * w
        w = w - lr * grad
        bias -= lr * err_sum / n_total
    model["w"], model["bias"] = w, bias
    return model


def classifier_score_batch(model: dict, texts: pd.Series) -> np.ndarray:
    """Sigmoid probabilities for one batch under a trained model."""
    n_features = model["n_features"]
    ws = model["w"] / model["std"]
    off = model["bias"] - (model["mean"] / model["std"]) @ model["w"]
    di, feat = hashed_token_features(texts, n_features)
    z = np.full(len(texts), off, dtype=np.float64)
    if len(feat):
        np.add.at(z, di, ws[feat])
    return _sigmoid(z)


def quality_classifier_scores(
    sf_dir: str,
    *,
    n_features: int = 1 << 18,
    iters: int = 10,
    lr: float = 5.0,
):
    """Train on the documents table, then score it in one streaming pass:
    rows ``(doc_id, label, score, pred)``. ``score`` is the sigmoid
    probability rounded half-away (DuckDB comparability)."""
    ds = _docs(sf_dir, columns=["doc_id", "text"])
    model = train_quality_classifier(ds, n_features=n_features,
                                     iters=iters, lr=lr)
    model_ref = ray.put(model)

    def score(df: pd.DataFrame) -> pd.DataFrame:
        m = ray.get(model_ref)
        p = classifier_score_batch(m, df["text"])
        return pd.DataFrame({
            "doc_id": df["doc_id"].astype("int64"),
            "label": quality_labels(df["text"]),
            "score": round_half_away(p, 6),
            "pred": (p >= 0.5).astype(np.int64),
        })

    return ds.map_batches(score, batch_format="pandas")


# ------------------------------------------------------------------ DSIR


def _ngram_buckets(texts: pd.Series, n_buckets: int, ngram: int
                   ) -> tuple[np.ndarray, np.ndarray]:
    """(doc_idx, bucket) for every word n-gram occurrence (with
    repetition — DSIR models are count-based). Fully vectorized: tokens
    are hashed individually once, and an n-gram's bucket combines the
    token hashes of a sliding window (no gram strings are built)."""
    toks = texts.fillna("").str.split()
    lens = toks.str.len().fillna(0).astype(np.int64).to_numpy()
    arrays = [np.asarray(t, dtype=object) for t in toks
              if isinstance(t, list) and len(t)]
    if not arrays:
        return (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64))
    flat = pd.Series(np.concatenate(arrays))
    h = pd.util.hash_pandas_object(flat, index=False).to_numpy(np.uint64)
    doc_idx = np.repeat(np.arange(len(texts), dtype=np.int64), lens)
    if ngram <= 1:
        return doc_idx, (h % np.uint64(n_buckets)).astype(np.int64)
    span = ngram - 1
    if len(h) <= span:
        return (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64))
    # windows fully inside one document (doc_idx is block-sorted)
    valid = doc_idx[:-span] == doc_idx[span:]
    combined = h[: len(h) - span].copy()
    prime = np.uint64(1099511628211)  # FNV-64 prime
    for j in range(1, ngram):
        combined = combined * prime + h[j : len(h) - span + j]
    return (doc_idx[:-span][valid],
            (combined[valid] % np.uint64(n_buckets)).astype(np.int64))


def _hashed_ngram_counts(ds, n_buckets: int, ngram: int) -> np.ndarray:
    """Corpus-wide hashed n-gram count vector (length ``n_buckets``),
    computed distributed: in-batch bincount partials → coarse reduce."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        _, b = _ngram_buckets(df["text"], n_buckets, ngram)
        if not len(b):
            return pd.DataFrame({"bucket": pd.Series(dtype="int64"),
                                 "n": pd.Series(dtype="int64")})
        v, c = np.unique(b, return_counts=True)
        return pd.DataFrame({"bucket": v, "n": c.astype(np.int64)})

    red = coarse_group_reduce(
        ds.map_batches(partial, batch_format="pandas"),
        ["bucket"],
        lambda p: p.groupby("bucket", as_index=False)["n"].sum(),
        n_rows_hint=n_buckets,
    ).to_pandas()
    out = np.zeros(n_buckets, dtype=np.float64)
    if len(red) and "bucket" in red.columns:  # empty target → zero counts
        out[red["bucket"].to_numpy(np.int64)] = red["n"].to_numpy(np.float64)
    return out


def _logratio(t: np.ndarray, r: np.ndarray, n_buckets: int) -> np.ndarray:
    logp_t = np.log(t + 1.0) - np.log(t.sum() + n_buckets)
    logp_r = np.log(r + 1.0) - np.log(r.sum() + n_buckets)
    return logp_t - logp_r


def dsir_logratio_model(target_ds, raw_ds, *, n_buckets: int = 1 << 16,
                        ngram: int = 2) -> np.ndarray:
    """log p_target(bucket) − log p_raw(bucket) with add-one smoothing —
    the broadcastable DSIR scoring table (a float64 vector, ~0.5 MB at
    the default 2^16 buckets). Two-dataset form for when the target is a
    SEPARATE corpus; when the target is a flagged subset of the raw
    corpus, :func:`dsir_weights` computes both histograms in ONE scan."""
    t = _hashed_ngram_counts(target_ds, n_buckets, ngram)
    r = _hashed_ngram_counts(raw_ds, n_buckets, ngram)
    return _logratio(t, r, n_buckets)


def _dsir_fused_counts(raw_ds, target_source: str, n_buckets: int,
                       ngram: int) -> tuple[np.ndarray, np.ndarray]:
    """(target_counts, raw_counts) from ONE pass over the corpus: each
    batch hashes its n-grams once and emits per-bucket (n_raw, n_target)
    partials — halving both the corpus reads and the hashing work of the
    separate-histogram plan (target docs were hashed twice). The reduce
    is the same bounded coarse exchange (≤ n_buckets rows)."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        di, b = _ngram_buckets(df["text"], n_buckets, ngram)
        if not len(b):
            return pd.DataFrame({"bucket": pd.Series(dtype="int64"),
                                 "n_raw": pd.Series(dtype="int64"),
                                 "n_target": pd.Series(dtype="int64")})
        is_t = (df["source"] == target_source).to_numpy()
        v, inv = np.unique(b, return_inverse=True)
        return pd.DataFrame({
            "bucket": v,
            "n_raw": np.bincount(inv).astype(np.int64),
            "n_target": np.bincount(
                inv, weights=is_t[di].astype(np.float64)).astype(np.int64),
        })

    red = coarse_group_reduce(
        raw_ds.map_batches(partial, batch_format="pandas"),
        ["bucket"],
        lambda p: p.groupby("bucket", as_index=False)[
            ["n_raw", "n_target"]].sum(),
        n_rows_hint=n_buckets,
    ).to_pandas()
    t = np.zeros(n_buckets, dtype=np.float64)
    r = np.zeros(n_buckets, dtype=np.float64)
    if len(red) and "bucket" in red.columns:
        idx = red["bucket"].to_numpy(np.int64)
        r[idx] = red["n_raw"].to_numpy(np.float64)
        t[idx] = red["n_target"].to_numpy(np.float64)
    return t, r


def dsir_weights(
    sf_dir: str,
    *,
    target_source: str = "src0",
    n_buckets: int = 1 << 16,
    ngram: int = 2,
):
    """Per-document DSIR importance weights against a target domain —
    here the docs whose ``source`` equals ``target_source`` (stand-in for
    "a sample of the domain you want more of"). Rows:
    ``(doc_id, n_grams, log_weight)`` where ``log_weight`` is the mean
    per-gram log likelihood ratio (length-normalized, as in the paper's
    practical variant).

    Scale shape: the target here is a flagged subset of the corpus, so
    BOTH histograms come from :func:`_dsir_fused_counts`' single scan
    (was: separate target + raw passes — two corpus reads and double
    hashing of the target docs); scoring is the only other read."""
    raw = _docs(sf_dir, columns=["doc_id", "text", "source"])
    t, r = _dsir_fused_counts(raw, target_source, n_buckets, ngram)
    model = _logratio(t, r, n_buckets)
    model_ref = ray.put(model)

    def score(df: pd.DataFrame) -> pd.DataFrame:
        m = ray.get(model_ref)
        di, b = _ngram_buckets(df["text"], n_buckets, ngram)
        s = np.zeros(len(df), dtype=np.float64)
        c = np.zeros(len(df), dtype=np.int64)
        if len(b):
            np.add.at(s, di, m[b])
            np.add.at(c, di, 1)
        lw = np.where(c > 0, s / np.maximum(c, 1), 0.0)
        return pd.DataFrame({
            "doc_id": df["doc_id"].astype("int64"),
            "n_grams": c,
            "log_weight": round_half_away(lw, 6),
        })

    return raw.map_batches(score, batch_format="pandas")


def dsir_topk(sf_dir: str, k: int = 100, **kwargs):
    """The selection step: keep the k documents with the highest DSIR
    importance weight (deterministic doc_id tiebreak). A per-block top-k
    combiner runs before the global sort, so the exchange carries at most
    ``k × num_blocks`` rows."""
    scored = dsir_weights(sf_dir, **kwargs)

    def block_topk(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(["log_weight", "doc_id"],
                              ascending=[False, True]).head(k)

    return (scored.map_batches(block_topk, batch_format="pandas")
            .sort(["log_weight", "doc_id"], descending=[True, False])
            .limit(k))
