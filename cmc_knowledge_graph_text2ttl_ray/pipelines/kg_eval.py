"""Triple-set evaluation: distributed precision / recall / F1 between an
emitted triple set and a reference set.

The engine's acceptance metric is triple P/R vs the reference
implementation's output (see the repo north rule; the reference itself is
evaluated file-by-file, ``/root/reference`` has no set-level comparator).
This op makes that check a first-class distributed primitive: both sides
digest per block (md5 of the joined identity columns — the
``kg_fingerprint`` key), the 16-byte digests exchange ONCE co-located by
digest, and each partition counts its distinct-left / distinct-right /
intersection locally; the driver folds P partial count rows. Triple text
never shuffles, skew is impossible (digests are uniform), and the cost is
one pass over each side + one small exchange.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

__all__ = ["triple_set_pr", "triple_set_diff"]

_SEP = "\x1f"


def _digest_side(ds, cols, side: str):
    def pre(df: pd.DataFrame) -> pd.DataFrame:
        keys = df[cols[0]].astype(str)
        for c in cols[1:]:
            keys = keys + _SEP + df[c].astype(str)
        dig = pd.Series([hashlib.md5(k.encode("utf-8")).digest()
                         for k in keys], dtype="object")
        out = pd.DataFrame({"d": dig}).drop_duplicates()
        out["side"] = side
        return out

    return ds.map_batches(pre, batch_format="pandas")


def triple_set_pr(got, expected,
                  cols=("subject", "predicate", "object"),
                  num_coarse=None) -> pd.DataFrame:
    """One-row DataFrame ``(n_got, n_expected, n_common, prec, rec, f1)``
    comparing the DISTINCT triple sets of two datasets over ``cols``.

    ``prec`` = |got ∩ expected| / |got|, ``rec`` = … / |expected|, both
    rounded half-away-from-zero to 6 (DuckDB ``ROUND`` parity); ``f1`` is
    computed from the unrounded ratios then rounded. Empty sides yield
    0.0 ratios rather than NaN.
    """
    from cmc_knowledge_graph_text2ttl_ray.functions.cluster import (
        coarse_group_reduce,
    )
    from cmc_knowledge_graph_text2ttl_ray.functions.rounding import (
        round_half_away,
    )

    cols = list(cols)
    both = _digest_side(got, cols, "g").union(
        _digest_side(expected, cols, "e"))

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        piv = g.drop_duplicates().groupby("d")["side"].agg(frozenset)
        n_g = sum(1 for s in piv if "g" in s)
        n_e = sum(1 for s in piv if "e" in s)
        n_c = sum(1 for s in piv if len(s) == 2)
        return pd.DataFrame({"n_got": [n_g], "n_expected": [n_e],
                             "n_common": [n_c]})

    parts = coarse_group_reduce(both, ["d"], combine,
                                num_coarse=num_coarse).to_pandas()
    n_g = int(parts["n_got"].sum())
    n_e = int(parts["n_expected"].sum())
    n_c = int(parts["n_common"].sum())
    p = n_c / n_g if n_g else 0.0
    r = n_c / n_e if n_e else 0.0
    f1 = (2.0 * p * r / (p + r)) if (p + r) else 0.0
    rd = round_half_away(np.array([p, r, f1]), 6)
    return pd.DataFrame([{
        "n_got": n_g, "n_expected": n_e, "n_common": n_c,
        "prec": float(rd[0]), "rec": float(rd[1]), "f1": float(rd[2]),
    }])


def triple_set_diff(got, expected,
                    cols=("subject", "predicate", "object"),
                    broadcast_threshold: int = 2_000_000,
                    num_coarse=None, num_join_partitions: int | None = None):
    """Symmetric set diff of two triple datasets: rows present only in
    ``got`` come back with ``side='added'``, rows only in ``expected``
    with ``side='removed'`` (distinct-set semantics on both sides).

    Scale shape: stage 1 is the :func:`triple_set_pr` digest exchange —
    16-byte digests only, never triple text. The diff digest set is
    bounded by the CHANGE size, not the corpus: below
    ``broadcast_threshold`` it broadcasts via ``ray.put`` and each side
    re-digests locally to emit its members (zero joins); past it, each
    side inner-joins the diff table on the digest hex.
    """
    import ray
    import ray.data

    from cmc_knowledge_graph_text2ttl_ray.functions.cluster import (
        coarse_group_reduce,
        default_join_partitions,
    )

    cols = list(cols)
    both = _digest_side(got, cols, "g").union(
        _digest_side(expected, cols, "e"))

    def only_one_side(g: pd.DataFrame) -> pd.DataFrame:
        piv = g.drop_duplicates().groupby("d")["side"].agg(frozenset)
        solo = piv[piv.map(len) == 1]
        return pd.DataFrame({
            "k": [d.hex() for d in solo.index],
            "side": ["added" if "g" in s else "removed"
                     for s in solo.values],
        })

    # materialize: the diff table is CHANGE-sized and is consumed twice
    # (count gate + broadcast/join) — without the pin the whole digest
    # exchange would re-execute per consumer
    diff = coarse_group_reduce(both, ["d"], only_one_side,
                               num_coarse=num_coarse).materialize()
    diff_n = diff.count()

    def redigest(df: pd.DataFrame) -> pd.DataFrame:
        keys = df[cols[0]].astype(str)
        for c in cols[1:]:
            keys = keys + _SEP + df[c].astype(str)
        out = df[cols].copy()
        out["k"] = [hashlib.md5(x.encode("utf-8")).hexdigest()
                    for x in keys]
        return out.drop_duplicates(subset=["k"])

    # both paths finish with ONE diff-sized dedup exchange on the digest:
    # the same distinct triple may sit in several input blocks, and the
    # per-block dedup in redigest cannot see across them
    def _dedup_out(rows):
        return coarse_group_reduce(
            rows, ["k"],
            lambda g: g.drop_duplicates(subset=["k"])
                       .drop(columns=["k"]),
        )

    if diff_n <= broadcast_threshold:
        want = {r["k"]: r["side"] for r in diff.take_all()}
        want_ref = ray.put(want)

        def pick(side_label):
            def fn(df: pd.DataFrame) -> pd.DataFrame:
                w = ray.get(want_ref)
                out = redigest(df)
                sides = out["k"].map(w)
                out = out[sides == side_label]
                out.insert(0, "side", side_label)
                return out
            return fn

        rows = got.map_batches(pick("added"), batch_format="pandas") \
            .union(expected.map_batches(pick("removed"),
                                        batch_format="pandas"))
        return _dedup_out(rows)

    if num_join_partitions is None:
        num_join_partitions = default_join_partitions()
    nparts = max(1, min(num_join_partitions, (diff_n + 49_999) // 50_000))

    def labeled(side_label):
        def fn(df: pd.DataFrame) -> pd.DataFrame:
            out = redigest(df)
            out["src"] = side_label
            return out
        return fn

    rows = got.map_batches(labeled("added"), batch_format="pandas").union(
        expected.map_batches(labeled("removed"), batch_format="pandas"))
    joined = rows.join(diff, join_type="inner",
                       num_partitions=nparts, on=("k",))

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        # a digest can only match its own side's diff row; keep the label
        df = df[df["src"] == df["side"]]
        return df[["side"] + cols + ["k"]].copy()

    return _dedup_out(joined.map_batches(finish, batch_format="pandas"))
