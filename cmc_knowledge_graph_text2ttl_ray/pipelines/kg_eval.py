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

__all__ = ["triple_set_pr"]

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
