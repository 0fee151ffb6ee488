"""Mergeable sketches over Datasets — HyperLogLog distinct counting.

The exact-distinct path (``groupby``/``unique``) shuffles one row per
distinct key; at 100 TB with high-cardinality keys that exchange dominates.
A HyperLogLog register array is a CONSTANT-size (2^p bytes) mergeable
summary: every block contributes one register row, the merge is an
element-wise max — no shuffle of keys at all, and the result streams into
the driver as n_blocks × 2^p bytes.

Hashing is ``pandas.util.hash_array`` (SipHash with pandas' fixed default
key) — deterministic across processes, batches and cluster sizes, so the
estimate is reproducible run-to-run.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data

__all__ = ["hll_distinct", "events_distinct_users", "events_users_hll",
           "events_users_hll_check", "cm_sketch",
           "events_type_count_cm_check", "events_value_tdigest_check",
           "events_type_distinct_users", "tdigest_build",
           "tdigest_quantile", "events_value_quantiles_tdigest",
           "events_type_quantiles_tdigest",
           "mg_heavy_hitters", "docs_heavy_words_sketch",
           "docs_heavy_words_mg_check",
           "grouped_hll_distinct", "events_type_users_hll",
           "grouped_mg_heavy_hitters", "docs_heavy_words_by_lang",
           "bloom_build", "bloom_contains", "events_user_bloom_check"]


def _hll_partial(values: np.ndarray, p: int) -> np.ndarray:
    """Register array (2^p uint8) for one batch, fully vectorized."""
    m = 1 << p
    regs = np.zeros(m, dtype=np.uint8)
    if len(values) == 0:
        return regs
    h = pd.util.hash_array(values).astype(np.uint64)
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    rest = (h << np.uint64(p)) | (np.uint64(1) << np.uint64(p - 1))
    # rank = leading zeros of the remaining bits + 1 (capped by the sentinel
    # bit planted above so empty-suffix hashes stay finite)
    # leading zeros via bit_length: lz = 64 - bit_length(rest)
    bl = np.zeros(len(rest), dtype=np.int64)
    r = rest.copy()
    for shift in (32, 16, 8, 4, 2, 1):
        mask = r >= (np.uint64(1) << np.uint64(shift))
        bl[mask] += shift
        r[mask] >>= np.uint64(shift)
    bl += (r > 0).astype(np.int64)
    rank = (64 - bl + 1).astype(np.uint8)
    np.maximum.at(regs, idx, rank)
    return regs


def _hll_estimate(regs: np.ndarray) -> float:
    """Standard HLL estimator with small-range (linear counting) and
    large-range corrections (Flajolet et al. 2007)."""
    m = float(len(regs))
    alpha = 0.7213 / (1.0 + 1.079 / m)
    est = alpha * m * m / np.sum(np.exp2(-regs.astype(np.float64)))
    zeros = int(np.count_nonzero(regs == 0))
    if est <= 2.5 * m and zeros:
        return m * np.log(m / zeros)
    if est > (1 << 32) / 30.0:
        return -(1 << 32) * np.log(1.0 - est / (1 << 32))
    return float(est)


def hll_distinct(ds, column: str, p: int = 12) -> dict:
    """Approximate distinct count of ``ds[column]``.

    Returns ``{"estimate": float, "n_registers": 2**p}``. Relative error is
    ~1.04/sqrt(2^p) (≈1.6% at p=12). One register row per block leaves the
    workers; the merge is a vectorized element-wise max on the driver."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        regs = _hll_partial(df[column].to_numpy(), p)
        return pd.DataFrame({"regs": [regs.tobytes()]})

    rows = ds.map_batches(partial, batch_format="pandas").take_all()
    merged = np.zeros(1 << p, dtype=np.uint8)
    for r in rows:
        merged = np.maximum(merged, np.frombuffer(r["regs"], dtype=np.uint8))
    return {"estimate": _hll_estimate(merged), "n_registers": 1 << p}


def events_distinct_users(sf_dir: str):
    """Exact distinct user count (the oracle-checked companion): per-block
    unique → one small groupby — only distinct keys shuffle."""
    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["user_id"])

    def uniq(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"user_id": df["user_id"].unique()})

    n = (ds.map_batches(uniq, batch_format="pandas")
         .groupby("user_id").count().count())
    return pd.DataFrame({"n_users": [int(n)]})


def events_users_hll(sf_dir: str, p: int = 12):
    """HLL estimate of distinct users + its guaranteed error envelope vs
    register count (rows-only: approximate by design)."""
    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["user_id"])
    out = hll_distinct(ds, "user_id", p=p)
    return pd.DataFrame({
        "n_users_est": [round(out["estimate"], 1)],
        "n_registers": [out["n_registers"]],
    })


def events_users_hll_check(sf_dir: str, p: int = 12):
    """Driver-verifiable HLL row: the exact distinct count (distributed,
    per-block unique → one small groupby) PLUS a boolean asserting the HLL
    estimate landed inside its 3-sigma error envelope (3 × 1.04/sqrt(2^p)
    ≈ 4.9% at p=12). The hash is deterministic (fixed SipHash key), so the
    estimate — and therefore the boolean — is a pure function of the data:
    the DuckDB oracle emits ``COUNT(DISTINCT …)`` and literal ``TRUE``, and
    a hash mismatch means the sketch plumbing drifted out of bound."""
    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["user_id"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        regs = _hll_partial(df["user_id"].to_numpy(), p)
        return pd.DataFrame({
            "regs": [regs.tobytes()],
            "user_id": [df["user_id"].unique()],
        })

    # one pass computes both: constant-size registers AND per-block
    # distinct keys (the exact path's exchange is distinct-keys-only)
    both = ds.map_batches(partial, batch_format="pandas")

    def split_exact(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"user_id": np.concatenate(list(df["user_id"]))
             if len(df) else np.array([], dtype=object)})

    mat = both.materialize()
    n_exact = int(mat.map_batches(split_exact, batch_format="pandas")
                  .groupby("user_id").count().count())
    merged = np.zeros(1 << p, dtype=np.uint8)
    for r in mat.select_columns(["regs"]).take_all():
        merged = np.maximum(merged, np.frombuffer(r["regs"], dtype=np.uint8))
    est = _hll_estimate(merged)
    bound = 3.0 * 1.04 / np.sqrt(float(1 << p))
    return pd.DataFrame({
        "n_users_exact": pd.Series([n_exact], dtype="int64"),
        "hll_within_bound": [bool(abs(est - n_exact) <= bound * n_exact)],
    })


def events_type_distinct_users(sf_dir: str):
    """Exact COUNT(DISTINCT user) per event type — the grouped companion
    to :func:`events_distinct_users`. Per-block distinct (type, user)
    pairs collapse before the exchange; the pair-level groupby dedups
    globally and the per-type count runs over the already-tiny distinct
    table. For approximate-at-scale, the HLL partials in this module
    group the registers by type the same way."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data
    from ray.data.aggregate import Count

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["event_type", "user_id"])

    def distinct_block(t: pa.Table) -> pa.Table:
        return t.group_by(["event_type", "user_id"]).aggregate([])

    pairs = (
        ds.map_batches(distinct_block, batch_format="pyarrow")
        .groupby(["event_type", "user_id"])
        .aggregate(Count(alias_name="_c"))
        .drop_columns(["_c"])
    )
    out = pairs.groupby("event_type").aggregate(
        Count(alias_name="n_users")).to_pandas()
    out["n_users"] = out["n_users"].astype("int64")
    return out.sort_values("event_type").reset_index(drop=True)


# ----------------------------------------------------------- t-digest


def _tdigest_compress(means: np.ndarray, weights: np.ndarray,
                      delta: int) -> tuple[np.ndarray, np.ndarray]:
    """Compress sorted (mean, weight) centroids to ≤ ~delta centroids by
    k1-scale bucketing (Dunning's t-digest, arXiv:1902.04023): points
    whose quantile midpoints fall in the same k-index merge. Fully
    vectorized (no per-centroid Python loop) and deterministic for a
    given sorted input."""
    total = weights.sum()
    if total <= 0 or len(means) == 0:
        return means[:0], weights[:0]
    cum = np.cumsum(weights)
    q_mid = (cum - weights / 2.0) / total
    # k1 scale: k(q) = delta/(2π)·asin(2q−1); equal-k points merge
    k = np.floor(delta / (2 * np.pi)
                 * np.arcsin(np.clip(2.0 * q_mid - 1.0, -1.0, 1.0)))
    # group consecutive equal-k runs
    boundaries = np.flatnonzero(np.diff(k) != 0) + 1
    starts = np.concatenate([[0], boundaries])
    w_out = np.add.reduceat(weights, starts)
    m_out = np.add.reduceat(means * weights, starts) / w_out
    return m_out, w_out


def tdigest_build(ds, column: str, delta: int = 200):
    """Distributed t-digest over a numeric column: each block compresses
    its values to ≤ ~delta centroids (one vectorized sort + reduceat),
    the driver merges n_blocks × delta centroid rows with one final
    compress. The exchange is CONSTANT per block — no value shuffles —
    which is the whole point versus exact quantiles at 100 TB.

    Returns ``(means, weights, total_n)``.
    """
    import pandas as pd

    def block_digest(df: pd.DataFrame) -> pd.DataFrame:
        v = pd.to_numeric(df[column], errors="coerce").to_numpy(np.float64)
        v = v[~np.isnan(v)]
        if not len(v):
            return pd.DataFrame({"mean": pd.Series(dtype="float64"),
                                 "weight": pd.Series(dtype="float64")})
        v.sort()
        m, w = _tdigest_compress(v, np.ones_like(v), delta)
        return pd.DataFrame({"mean": m, "weight": w})

    cents = ds.map_batches(block_digest,
                           batch_format="pandas").to_pandas()
    if cents.empty:
        return (np.empty(0), np.empty(0), 0)
    cents = cents.sort_values("mean", kind="stable")
    m, w = _tdigest_compress(cents["mean"].to_numpy(),
                             cents["weight"].to_numpy(), delta)
    return m, w, int(round(w.sum()))


def tdigest_quantile(means: np.ndarray, weights: np.ndarray,
                     qs) -> np.ndarray:
    """Quantile estimates by linear interpolation between centroid
    means at their cumulative-weight midpoints."""
    qs = np.atleast_1d(np.asarray(qs, dtype=np.float64))
    if len(means) == 0:
        return np.full(len(qs), np.nan)
    total = weights.sum()
    cum = np.cumsum(weights) - weights / 2.0
    return np.interp(qs * total, cum, means,
                     left=means[0], right=means[-1])


def events_value_quantiles_tdigest(sf_dir: str, delta: int = 200,
                                   qs=(0.01, 0.1, 0.25, 0.5, 0.75,
                                       0.9, 0.99)):
    """Approximate event-value quantiles from a single streaming pass —
    the sketch companion to the exact multi-pass
    ``events_value_quantiles``. Rows ``(q, value_est)``; accuracy is
    rank-error bounded by the delta parameter (tested against the exact
    path)."""
    import pandas as pd
    from cmc_knowledge_graph_text2ttl_ray.functions.rounding import round_half_away

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["value"])
    m, w, _n = tdigest_build(ds, "value", delta)
    est = tdigest_quantile(m, w, qs)
    return pd.DataFrame({"q": np.asarray(qs, dtype=np.float64),
                         "value_est": round_half_away(est, 6)})


def events_value_tdigest_check(sf_dir: str, delta: int = 200,
                               qs=(0.25, 0.5, 0.75, 0.9, 0.99),
                               max_rank_err: float = 0.01):
    """Driver-verifiable check row for the t-digest path (the quantile
    analogue of :func:`events_users_hll_check`): estimates each quantile
    with the sketch, then measures the estimate's EXACT rank with one
    vectorized counting pass — ``|rank(est) - q| ≤ max_rank_err`` is the
    t-digest guarantee a SQL oracle can assert as TRUE, and ``n_events``
    anchors the row to the exact data."""
    import ray

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["value"])
    m, w, n = tdigest_build(ds, "value", delta)
    est = np.asarray(tdigest_quantile(m, w, qs), dtype=np.float64)
    est_ref = ray.put(est)

    def rank_counts(df: pd.DataFrame) -> pd.DataFrame:
        v = np.sort(df["value"].to_numpy(np.float64))
        le = np.searchsorted(v, ray.get(est_ref), side="right")
        return pd.DataFrame({"qi": np.arange(len(le), dtype=np.int64),
                             "n_le": le.astype(np.int64)})

    totals = (ds.map_batches(rank_counts, batch_format="pandas")
              .groupby("qi").sum("n_le").to_pandas()
              .sort_values("qi"))
    ranks = totals["sum(n_le)"].to_numpy(np.float64) / max(n, 1)
    ok = np.abs(ranks - np.asarray(qs, dtype=np.float64)) <= max_rank_err
    return pd.DataFrame({
        "q": np.asarray(qs, dtype=np.float64),
        "n_events": pd.Series([int(n)] * len(qs), dtype="int64"),
        "rank_within_bound": ok,
    })


def events_type_quantiles_tdigest(sf_dir: str, delta: int = 200,
                                  qs=(0.25, 0.5, 0.75, 0.9, 0.99)):
    """Grouped t-digest: approximate per-event-type value quantiles in a
    single streaming pass. Per block, each type's values compress to
    ≤ ~delta centroid rows; the merge is one exchange of
    (type, mean, weight) rows — bounded by types × blocks × delta, never
    by event count — and the final compress + interpolation runs inside
    the per-type combine. The constant-exchange grouped companion to the
    exact multi-pass ``events_type_quantiles``."""
    import pandas as pd
    from cmc_knowledge_graph_text2ttl_ray.functions.cluster import (
        coarse_group_reduce,
    )
    from cmc_knowledge_graph_text2ttl_ray.functions.rounding import round_half_away

    qs_arr = np.asarray(qs, dtype=np.float64)
    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["event_type", "value"])

    def block_digests(df: pd.DataFrame) -> pd.DataFrame:
        out = []
        for etype, g in df.groupby("event_type", sort=False):
            v = pd.to_numeric(g["value"], errors="coerce") \
                .to_numpy(np.float64)
            v = v[~np.isnan(v)]
            if not len(v):
                continue
            v.sort()
            m, w = _tdigest_compress(v, np.ones_like(v), delta)
            out.append(pd.DataFrame({"event_type": etype, "mean": m,
                                     "weight": w}))
        if not out:
            return pd.DataFrame({"event_type": pd.Series(dtype=object),
                                 "mean": pd.Series(dtype="float64"),
                                 "weight": pd.Series(dtype="float64")})
        return pd.concat(out, ignore_index=True)

    def combine(part: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for etype, g in part.groupby("event_type", sort=False):
            g = g.sort_values("mean", kind="stable")
            m, w = _tdigest_compress(g["mean"].to_numpy(),
                                     g["weight"].to_numpy(), delta)
            est = tdigest_quantile(m, w, qs_arr)
            rows.append(pd.DataFrame({
                "event_type": etype, "q": qs_arr,
                "value_est": round_half_away(est, 6)}))
        if not rows:
            return pd.DataFrame({"event_type": pd.Series(dtype=object),
                                 "q": pd.Series(dtype="float64"),
                                 "value_est": pd.Series(dtype="float64")})
        return pd.concat(rows, ignore_index=True)

    out = coarse_group_reduce(
        ds.map_batches(block_digests, batch_format="pandas"),
        ["event_type"], combine).to_pandas()
    return out.sort_values(["event_type", "q"]).reset_index(drop=True)


# ---------------------------------------------------------------- Misra-Gries

def _mg_trim(items: np.ndarray, counts: np.ndarray, k: int):
    """Trim an exact (item, count) table to ≤ k Misra-Gries counters:
    subtract the (k+1)-th largest count from everything, drop ≤ 0. The
    subtracted amount accumulates as the summary's error bound."""
    if len(items) <= k:
        return items, counts, 0
    order = np.argsort(counts)[::-1]
    dec = int(counts[order[k]])
    keep = order[:k]
    new_counts = counts[keep] - dec
    pos = new_counts > 0
    return items[keep][pos], new_counts[pos], dec


_CM_MULT = np.array([0x9E3779B97F4A7C15, 0xC2B2AE3D27D4EB4F,
                     0x165667B19E3779F9, 0x27D4EB2F165667C5,
                     0x85EBCA6B2545F491, 0xCB9E8D57A4B1D3F7],
                    dtype=np.uint64)


def _cm_rows(h: np.ndarray, width: int, depth: int):
    """Yield (row, column-index array) per hash row — one multiply-SHIFT
    per depth over the base SipHash, all vectorized. High bits, not
    ``mod width``: with a power-of-two width an odd multiplier is a
    bijection mod width, so low bits would make every row collide
    identically and depth would buy no independence."""
    k = int(width).bit_length() - 1
    if (1 << k) != width:
        raise ValueError("Count-Min width must be a power of two")
    shift = np.uint64(64 - k)
    for d in range(depth):
        hd = (h + np.uint64(d)) * _CM_MULT[d % len(_CM_MULT)]
        yield d, (hd >> shift).astype(np.int64)


def _cm_partial(values: np.ndarray, width: int, depth: int) -> np.ndarray:
    """Count-Min table (depth × width int64) for one batch."""
    tbl = np.zeros((depth, width), dtype=np.int64)
    if len(values) == 0:
        return tbl
    h = pd.util.hash_array(values).astype(np.uint64)
    for d, idx in _cm_rows(h, width, depth):
        tbl[d] = np.bincount(idx, minlength=width)
    return tbl


def _cm_estimate(tbl: np.ndarray, queries: np.ndarray, width: int,
                 depth: int) -> np.ndarray:
    """Point-frequency estimates (min over rows): always ≥ the true count,
    and ≤ true + (e/width)·N with probability 1 − e^−depth."""
    if len(queries) == 0:
        return np.zeros(0, dtype=np.int64)
    h = pd.util.hash_array(queries).astype(np.uint64)
    est = None
    for d, idx in _cm_rows(h, width, depth):
        e = tbl[d, idx]
        est = e if est is None else np.minimum(est, e)
    return est


def cm_sketch(ds, column: str, width: int = 2048, depth: int = 4):
    """Distributed Count-Min sketch of ``ds[column]`` (Cormode &
    Muthukrishnan 2005): each block contributes ONE constant-size
    (depth × width) counter table; the merge is element-wise sum — like
    :func:`hll_distinct`, no key ever shuffles and the driver sees
    n_blocks × (depth·width·8) bytes regardless of cardinality.

    Returns ``(table, n_total)``; query with :func:`_cm_estimate`."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        vals = df[column].to_numpy(object)
        vals = vals[pd.notna(vals)]
        tbl = _cm_partial(vals, width, depth)
        return pd.DataFrame({"tbl": [tbl.tobytes()],
                             "n": [np.int64(len(vals))]})

    rows = ds.map_batches(partial, batch_format="pandas").take_all()
    merged = np.zeros((depth, width), dtype=np.int64)
    n_total = 0
    for r in rows:
        merged += np.frombuffer(r["tbl"], dtype=np.int64) \
            .reshape(depth, width)
        n_total += int(r["n"])
    return merged, n_total


def events_type_count_cm_check(sf_dir: str, width: int = 2048,
                               depth: int = 4):
    """Driver-verifiable Count-Min row: exact per-type counts (tiny group
    cardinality → ordinary distributed aggregate) PLUS a boolean asserting
    the CM point estimate respects both sketch guarantees — est ≥ exact
    (structural) and est ≤ exact + ceil((e/width)·N) (the ε-bound). The
    hash is deterministic, so the boolean is a pure function of the data
    and the DuckDB oracle emits ``COUNT(*)`` + literal ``TRUE``."""
    import math

    from ray.data.aggregate import Count

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["event_type"])
    exact = ds.groupby("event_type") \
        .aggregate(Count(alias_name="n_events")).to_pandas() \
        .sort_values("event_type").reset_index(drop=True)
    tbl, n_total = cm_sketch(ds, "event_type", width=width, depth=depth)
    est = _cm_estimate(tbl, exact["event_type"].to_numpy(object),
                       width, depth)
    bound = math.ceil(math.e / width * n_total)
    true = exact["n_events"].to_numpy(np.int64)
    ok = (est >= true) & (est <= true + bound)
    return pd.DataFrame({
        "event_type": exact["event_type"],
        "n_events": pd.Series(true, dtype="int64"),
        "cm_within_bound": ok,
    })


def mg_heavy_hitters(ds, column: str, k: int = 64,
                     list_column: bool = False):
    """Misra-Gries heavy hitters over ``column``: a CONSTANT-size (≤ k
    counters) mergeable summary per block, merged on the driver. Returns a
    DataFrame ``(item, min_count, max_count)`` sorted by max_count desc —
    every item with true frequency > n/(k+1) is guaranteed present, and
    ``min_count ≤ true ≤ max_count`` with ``max_count - min_count ≤
    n/(k+1)``.

    Scale shape: the exact top-k path (``docs_heavy_words``) shuffles one
    row per DISTINCT key; this exchanges ≤ k rows per block regardless of
    cardinality — the sketch of choice for vocabulary-scale keys at 100 TB.
    With ``list_column`` the column holds lists (e.g. pre-split tokens)
    and each element counts once.
    """

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        col = df[column]
        if list_column:
            vals = np.concatenate([np.asarray(v, dtype=object)
                                   for v in col]) if len(col) else \
                np.array([], dtype=object)
        else:
            vals = col.to_numpy(object)
        if len(vals):
            vals = vals[pd.notna(vals)]  # np.unique can't sort None vs str
        n = len(vals)
        if n == 0:
            return pd.DataFrame({"item": pd.Series(dtype=object),
                                 "cnt": pd.Series(dtype="int64"),
                                 "err": pd.Series(dtype="int64")})
        uniq, counts = np.unique(vals, return_counts=True)
        items, counts, dec = _mg_trim(uniq, counts.astype(np.int64), k)
        # one MARKER row (item=None) per block carries that block's
        # accumulated decrement — summing markers recovers the exact
        # total error without relying on any per-block grouping key
        return pd.DataFrame({
            "item": np.concatenate([items, [None]]),
            "cnt": np.concatenate([counts, [0]]).astype(np.int64),
            "err": np.concatenate([np.zeros(len(items), np.int64),
                                   [dec]]).astype(np.int64),
        })

    # each block contributes ≤ k rows + its (err, n) scalars — the driver
    # sees blocks × k rows, never the distinct-key table
    summ = ds.map_batches(partial, batch_format="pandas").to_pandas()
    if summ.empty:
        return pd.DataFrame({"item": pd.Series(dtype=object),
                             "min_count": pd.Series(dtype="int64"),
                             "max_count": pd.Series(dtype="int64")})
    base_err = int(summ[summ["item"].isna()]["err"].sum())
    summ = summ[summ["item"].notna()]
    if summ.empty:
        return pd.DataFrame({"item": pd.Series(dtype=object),
                             "min_count": pd.Series(dtype="int64"),
                             "max_count": pd.Series(dtype="int64")})
    merged = summ.groupby("item", sort=False)["cnt"].sum()
    items = merged.index.to_numpy(object)
    counts = merged.to_numpy(np.int64)
    items, counts, dec = _mg_trim(items, counts, k)
    total_err = base_err + dec
    out = pd.DataFrame({
        "item": items,
        "min_count": counts,
        "max_count": counts + total_err,
    }).sort_values(["max_count", "item"],
                   ascending=[False, True]).reset_index(drop=True)
    return out


def docs_heavy_words_sketch(sf_dir: str, k: int = 64):
    """Heavy words over the documents table via the Misra-Gries sketch
    (the constant-exchange companion to the exact ``docs_heavy_words``)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["text"])

    def words(t: pa.Table) -> pd.DataFrame:
        toks = pc.list_flatten(pc.split_pattern_regex(
            pc.utf8_trim_whitespace(t["text"]), r"\s+"))
        toks = toks.filter(pc.not_equal(toks, ""))
        return pd.DataFrame({"word": toks.to_numpy(zero_copy_only=False)})

    return mg_heavy_hitters(ds.map_batches(words, batch_format="pyarrow"),
                            "word", k=k)


def docs_heavy_words_mg_check(sf_dir: str, k: int = 64):
    """Driver-verifiable check row for the Misra-Gries path (the sketch
    analogue of :func:`events_users_hll_check`): runs the sketch AND the
    exact distributed word count, then emits the MG guarantees as exact
    integers a SQL oracle can assert —

    - ``mandatory_missing``: words with true frequency > n/(k+1) absent
      from the sketch (MG guarantee: always 0);
    - ``containment_violations``: sketch items whose true count falls
      outside [min_count, max_count] (always 0);
    - ``n_words``: the exact corpus token count (hash-compared to SQL).

    The exact side is a vocabulary-bounded coarse reduce (this is a
    VERIFICATION op — the point of the sketch in production is to skip
    exactly this pass); only the ≤ 2k+1 flagged rows reach the driver.
    """
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray

    from cmc_knowledge_graph_text2ttl_ray.functions.cluster import (
        coarse_group_reduce,
        parquet_rows_hint,
        sorted_lookup,
    )

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["text"])

    def words(t: pa.Table) -> pd.DataFrame:
        toks = pc.list_flatten(pc.split_pattern_regex(
            pc.utf8_trim_whitespace(t["text"]), r"\s+"))
        toks = toks.filter(pc.not_equal(toks, ""))
        return pd.DataFrame({"word": toks.to_numpy(zero_copy_only=False)})

    words_ds = ds.map_batches(words, batch_format="pyarrow")
    sk = mg_heavy_hitters(words_ds, "word", k=k)

    def block_counts(df: pd.DataFrame) -> pd.DataFrame:
        vc = df["word"].value_counts()
        return pd.DataFrame({"word": vc.index.to_numpy(object),
                             "cnt": vc.to_numpy(np.int64)})

    exact = coarse_group_reduce(
        words_ds.map_batches(block_counts, batch_format="pandas"),
        ["word"],
        lambda g: g.groupby("word", as_index=False)["cnt"].sum(),
        n_rows_hint=parquet_rows_hint(f"{sf_dir}/documents.parquet",
                                      "text", per_row_bytes=24),
    ).materialize()  # two consumers (total + flag scan); vocab-bounded
    n_words = int(exact.sum("cnt"))
    thresh = n_words / (k + 1)
    items_ref = ray.put(np.sort(sk["item"].to_numpy(dtype=object)))

    def flag(df: pd.DataFrame) -> pd.DataFrame:
        in_sk, _ = sorted_lookup(ray.get(items_ref),
                                 df["word"].to_numpy(object))
        mandatory = df["cnt"].to_numpy(np.int64) > thresh
        keep = in_sk | mandatory
        out = df[keep].copy()
        out["in_sketch"] = in_sk[keep]
        return out

    flagged = exact.map_batches(flag, batch_format="pandas").to_pandas()
    missing = int(((flagged["cnt"] > thresh)
                   & ~flagged["in_sketch"]).sum())
    exact_of = dict(zip(flagged["word"], flagged["cnt"]))
    viol = int(sum(
        not (lo <= exact_of.get(item, 0) <= hi)
        for item, lo, hi in zip(sk["item"], sk["min_count"],
                                sk["max_count"])))
    return pd.DataFrame({"k": pd.Series([k], dtype="int64"),
                         "n_words": pd.Series([n_words], dtype="int64"),
                         "mandatory_missing": pd.Series([missing],
                                                        dtype="int64"),
                         "containment_violations": pd.Series([viol],
                                                             dtype="int64")})


def grouped_hll_distinct(ds, group_col: str, value_col: str, p: int = 12):
    """Approximate COUNT(DISTINCT value) PER GROUP via HyperLogLog: each
    block contributes one ``2^p``-byte register row per group it saw, the
    per-group merge is an element-wise max. The exchange is
    (groups-seen-per-block × 2^p bytes) — independent of value
    cardinality, the grouped companion to :func:`hll_distinct` and the
    scale path where the exact pair-distinct shuffle
    (:func:`events_type_distinct_users`) would move one row per distinct
    (group, value). The merge exchanges on ``hash(group) % num_coarse``
    (not per-group map_groups), so a billion-group keyspace costs the
    same per-row work as an enum-like one."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for g, sub in df.groupby(group_col, sort=False):
            regs = _hll_partial(sub[value_col].to_numpy(object), p)
            rows.append((g, regs.tobytes()))
        return pd.DataFrame({group_col: [r[0] for r in rows],
                             "regs": [r[1] for r in rows]})

    def merge_part(g: pd.DataFrame) -> pd.DataFrame:
        # all register rows of a group land in the same coarse partition;
        # per-group work here is a C-speed element-wise max over ≤#blocks
        # rows of 2^p bytes each
        out_g, out_est = [], []
        for gval, sub in g.groupby(group_col, sort=False):
            mat = np.stack([np.frombuffer(b, dtype=np.uint8)
                            for b in sub["regs"]])
            regs = mat.max(axis=0)
            out_g.append(gval)
            out_est.append(round(_hll_estimate(regs), 1))
        return pd.DataFrame({group_col: out_g, "n_distinct_est": out_est})

    from cmc_knowledge_graph_text2ttl_ray.functions.cluster import (
        coarse_group_reduce,
    )

    return coarse_group_reduce(
        ds.map_batches(partial, batch_format="pandas"),
        [group_col], merge_part)


def events_type_users_hll(sf_dir: str, p: int = 12):
    """Approximate distinct users per event type (HLL registers grouped
    by type) — sorted by type for deterministic output."""
    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["event_type", "user_id"])
    return grouped_hll_distinct(ds, "event_type", "user_id", p=p) \
        .sort("event_type")


def grouped_mg_heavy_hitters(ds, group_col: str, value_col: str,
                             k: int = 32):
    """Per-group Misra-Gries heavy hitters: ≤ k counters per (block,
    group) leave the workers — the grouped companion to
    :func:`mg_heavy_hitters` with the same guarantees applied per group
    (every item above n_g/(k+1) of ITS group's stream is present).
    Returns (group, item, min_count, max_count) sorted by group then
    max_count desc."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for g, sub in df.groupby(group_col, sort=False):
            vals = sub[value_col].to_numpy(object)
            vals = vals[pd.notna(vals)]
            if not len(vals):
                continue
            uniq, counts = np.unique(vals, return_counts=True)
            items, counts, dec = _mg_trim(uniq, counts.astype(np.int64), k)
            outs.append(pd.DataFrame({
                group_col: [g] * (len(items) + 1),
                "item": np.concatenate([items, [None]]),
                "cnt": np.concatenate([counts, [0]]).astype(np.int64),
                "err": np.concatenate([np.zeros(len(items), np.int64),
                                       [dec]]).astype(np.int64),
            }))
        if not outs:
            return pd.DataFrame({group_col: pd.Series(dtype=object),
                                 "item": pd.Series(dtype=object),
                                 "cnt": pd.Series(dtype="int64"),
                                 "err": pd.Series(dtype="int64")})
        return pd.concat(outs, ignore_index=True)

    def merge_part(part: pd.DataFrame) -> pd.DataFrame:
        # every (block, group) partial of a group lands in the same coarse
        # partition; merge runs in parallel across partitions so the driver
        # only ever sees the ≤ groups × k merged rows, never the
        # blocks × groups × (k+1) partial table
        results = []
        for g, sub in part.groupby(group_col, sort=False):
            base_err = int(sub[sub["item"].isna()]["err"].sum())
            rows = sub[sub["item"].notna()]
            if rows.empty:
                continue
            merged = rows.groupby("item", sort=False)["cnt"].sum()
            items, counts, dec = _mg_trim(
                merged.index.to_numpy(object), merged.to_numpy(np.int64), k)
            total_err = base_err + dec
            results.append(pd.DataFrame({
                group_col: [g] * len(items),
                "item": items,
                "min_count": counts,
                "max_count": counts + total_err,
            }))
        if not results:
            return pd.DataFrame({group_col: pd.Series(dtype=object),
                                 "item": pd.Series(dtype=object),
                                 "min_count": pd.Series(dtype="int64"),
                                 "max_count": pd.Series(dtype="int64")})
        return pd.concat(results, ignore_index=True)

    from cmc_knowledge_graph_text2ttl_ray.functions.cluster import (
        coarse_group_reduce,
    )

    out = coarse_group_reduce(
        ds.map_batches(partial, batch_format="pandas"),
        [group_col], merge_part).to_pandas()
    if out.empty:
        return pd.DataFrame({group_col: pd.Series(dtype=object),
                             "item": pd.Series(dtype=object),
                             "min_count": pd.Series(dtype="int64"),
                             "max_count": pd.Series(dtype="int64")})
    return out.sort_values([group_col, "max_count", "item"],
                           ascending=[True, False, True]) \
        .reset_index(drop=True)


def docs_heavy_words_by_lang(sf_dir: str, k: int = 16):
    """Heavy words per language via the grouped Misra-Gries sketch."""
    import pyarrow as pa
    import pyarrow.compute as pc

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["lang", "text"])

    def words(t: pa.Table) -> pd.DataFrame:
        toks = pc.split_pattern_regex(
            pc.utf8_trim_whitespace(t["text"]), r"\s+")
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        flat = pc.list_flatten(toks).to_numpy(zero_copy_only=False)
        lang = np.repeat(t["lang"].to_numpy(zero_copy_only=False), lens)
        df = pd.DataFrame({"lang": lang, "word": flat})
        return df[df["word"] != ""]

    return grouped_mg_heavy_hitters(
        ds.map_batches(words, batch_format="pyarrow"), "lang", "word", k=k)


def _bloom_hash_indexes(values: np.ndarray, k: int, n_bits: int):
    """Yields k vectorized bit-index arrays per value via double hashing
    (Kirsch & Mitzenmacher 2006): ``g_i = h1 + i*h2 mod m``. ``h1`` is
    pandas' fixed-key SipHash (deterministic across processes, batches and
    cluster sizes — same property the HLL/CM sketches rely on); ``h2`` is
    a murmur-style finalizer remix of ``h1``, forced odd so the probe
    sequence never collapses for power-of-two ``n_bits``."""
    h1 = pd.util.hash_array(values).astype(np.uint64)
    h2 = (h1 ^ (h1 >> np.uint64(33))) * np.uint64(0xFF51AFD7ED558CCD)
    h2 = (h2 ^ (h2 >> np.uint64(33))) * np.uint64(0xC4CEB9FE1A85EC53)
    h2 = (h2 ^ (h2 >> np.uint64(33))) | np.uint64(1)
    mask = np.uint64(n_bits - 1)
    for i in range(k):
        yield (h1 + np.uint64(i) * h2) & mask


def _bloom_partial(values: np.ndarray, n_bits: int, k: int) -> np.ndarray:
    """One block's bitmap partial: ``n_bits/64`` uint64 words."""
    words = np.zeros(n_bits >> 6, dtype=np.uint64)
    if len(values) == 0:
        return words
    for idx in _bloom_hash_indexes(values, k, n_bits):
        np.bitwise_or.at(words, (idx >> np.uint64(6)).astype(np.int64),
                         np.uint64(1) << (idx & np.uint64(63)))
    return words


def bloom_contains(values: np.ndarray, words: np.ndarray,
                   k: int) -> np.ndarray:
    """Vectorized membership probe against a built filter: True iff every
    one of the k bits is set. No false negatives, ever; false-positive
    probability ~ (1 - e^(-k·n/m))^k."""
    n_bits = len(words) << 6
    out = np.ones(len(values), dtype=bool)
    if len(values) == 0:
        return out
    for idx in _bloom_hash_indexes(values, k, n_bits):
        bits = (words[(idx >> np.uint64(6)).astype(np.int64)]
                >> (idx & np.uint64(63))) & np.uint64(1)
        out &= bits.astype(bool)
    return out


def bloom_build(ds, column: str, n_bits: int, k: int = 7,
                fanin: int = 32) -> np.ndarray:
    """Distributed Bloom filter over ``ds[column]`` — the mergeable
    membership sketch completing the family (HLL distinct, CM counts, MG
    heavy hitters, t-digest quantiles). Each block contributes ONE
    constant-size (``n_bits/8`` byte) bitmap; the merge is element-wise OR,
    so no key ever shuffles. An intermediate ``map_batches`` OR stage with
    fan-in ``fanin`` bounds driver bytes at n_blocks/fanin × n_bits/8 —
    for GB-scale filters raise ``fanin`` or stack a second reduce level.

    The built filter is the scale tool for membership pushdown: ``ray.put``
    it once and probe inside ``map_batches`` (see
    :func:`events_user_bloom_check`) instead of shuffling the corpus
    against the member set — the same broadcast-small-side discipline the
    decontamination pipeline uses, but constant-size even when the member
    set itself is too big to broadcast exactly.

    ``n_bits`` must be a power of two (index masking); duplicates in the
    build column are harmless (idempotent OR). The join-plan consumer of
    this idea lives in ``relational.py::bloom_semi_join_revenue`` (a
    2-probe int-key prefilter fused into a semi-join); this is the
    general-purpose family member: k probes, any hashable dtype,
    word-packed bitmap, tree merge.
    """
    if n_bits & (n_bits - 1) or n_bits < 64:
        raise ValueError("n_bits must be a power of two >= 64")

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        vals = df[column].to_numpy()
        vals = vals[pd.notna(vals)]
        return pd.DataFrame(
            {"bm": [_bloom_partial(vals, n_bits, k).tobytes()]})

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        acc = np.zeros(n_bits >> 6, dtype=np.uint64)
        for b in df["bm"]:
            acc |= np.frombuffer(b, dtype=np.uint64)
        return pd.DataFrame({"bm": [acc.tobytes()]})

    rows = (ds.map_batches(partial, batch_format="pandas")
            .map_batches(combine, batch_format="pandas", batch_size=fanin)
            .take_all())
    merged = np.zeros(n_bits >> 6, dtype=np.uint64)
    for r in rows:
        merged |= np.frombuffer(r["bm"], dtype=np.uint64)
    return merged


def events_user_bloom_check(sf_dir: str, k: int = 7,
                            bits_per_member: int = 16):
    """Driver-verifiable Bloom row: build the filter over DISTINCT EVEN
    user_ids, probe every distinct user_id. Two guarantees become exact
    integers/booleans: ``false_negatives`` is structurally 0 (a Bloom
    filter never misses a member), and — because the hash is deterministic
    — the measured false-positive rate on the odd ids is a pure function
    of the data, so ``fpr_within_bound`` (measured ≤ 3× theoretical +
    additive slack for small probe sets) is SQL-assertable as literal
    TRUE. The exact member/non-member counts pin the distinct plumbing.

    Scale shape: the distinct-id table (same bound as the exact-distinct
    op) is materialized once and reused for sizing, build and probe; the
    filter itself is broadcast via ``ray.put`` and probed per batch —
    per-batch count rows, not ids, return to the driver."""
    import math

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["user_id"])

    def uniq(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"user_id": df["user_id"].unique()})

    distinct = (ds.map_batches(uniq, batch_format="pandas")
                .groupby("user_id").count()
                .map_batches(lambda df: df[["user_id"]],
                             batch_format="pandas")
                .materialize())

    def count_members(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["user_id"].to_numpy()
        even = ids % 2 == 0
        return pd.DataFrame({"members": [np.int64(even.sum())],
                             "total": [np.int64(len(ids))]})

    counts = distinct.map_batches(count_members,
                                  batch_format="pandas").take_all()
    n_members = int(sum(r["members"] for r in counts))
    n_nonmembers = int(sum(r["total"] for r in counts)) - n_members

    n_bits = 1 << max(12, math.ceil(math.log2(
        bits_per_member * max(n_members, 1))))
    members = distinct.map_batches(
        lambda df: df[df["user_id"] % 2 == 0], batch_format="pandas")
    bm = bloom_build(members, "user_id", n_bits=n_bits, k=k)
    bm_ref = ray.put(bm)

    def probe(df: pd.DataFrame) -> pd.DataFrame:
        words = ray.get(bm_ref)
        ids = df["user_id"].to_numpy()
        hit = bloom_contains(ids, words, k)
        member = ids % 2 == 0
        return pd.DataFrame({
            "fn": [np.int64((member & ~hit).sum())],
            "fp": [np.int64((~member & hit).sum())],
        })

    probed = distinct.map_batches(probe, batch_format="pandas").take_all()
    false_negatives = int(sum(r["fn"] for r in probed))
    false_positives = int(sum(r["fp"] for r in probed))

    theory = (1.0 - math.exp(-k * n_members / n_bits)) ** k
    bound = 3.0 * theory + 8.0 / max(n_nonmembers, 1)
    measured = false_positives / max(n_nonmembers, 1)
    return pd.DataFrame({
        "n_members": pd.Series([n_members], dtype="int64"),
        "n_nonmembers": pd.Series([n_nonmembers], dtype="int64"),
        "false_negatives": pd.Series([false_negatives], dtype="int64"),
        "fpr_within_bound": [bool(measured <= bound)],
    })
