"""Content fingerprints of a KG: order-independent set hashes.

A deterministic 64-bit fingerprint of the DISTINCT triple set (and a
per-named-graph variant) gives O(1) change detection between pipeline
runs — compare fingerprints before shipping a diff or re-uploading, and
verify replicas without moving data.  The reference has no equivalent
(its outputs are compared file-by-file); rerun-determinism tests in this
repo previously compared full shard bytes.

Construction: per triple, ``md5(key)`` where ``key`` joins the identity
columns with ``\\x1f`` (a separator that cannot appear in IRIs and is
escaped in literals is not required — md5 of the joined string with an
unlikely control char keeps the SQL oracle expressible:
``md5_number_upper(s || chr(31) || p || chr(31) || o)`` in DuckDB equals
``int.from_bytes(md5(key)[:8], "little")``).  The set hash is the XOR of
the per-triple values — order-independent and incrementally updatable
(XOR the fingerprint of added/removed triples to roll it forward).

XOR cancels DUPLICATE rows pairwise, so set semantics require global
dedup first: rows co-locate on ``hash(digest) % P`` (one exchange of
16-byte digests — never the triple text), each partition dedups on the
full 128-bit digest (collision odds 2⁻¹²⁸) and XORs locally; the driver
folds P partial rows.  Per-row md5 is the inherent cost of a content
hash; it is embarrassingly parallel per block.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

__all__ = ["kg_fingerprint", "kg_fingerprint_by_graph"]

_SEP = "\x1f"


def _digests(df: pd.DataFrame, cols) -> pd.DataFrame:
    keys = df[cols[0]].astype(str)
    for c in cols[1:]:
        keys = keys + _SEP + df[c].astype(str)
    dig = [hashlib.md5(k.encode("utf-8")).digest() for k in keys]
    return pd.DataFrame({"d": dig})


def _xor_fold(vals: np.ndarray) -> int:
    return int(np.bitwise_xor.reduce(vals)) if len(vals) else 0


def kg_fingerprint(triples, cols=("subject", "predicate", "object"),
                   num_coarse=None) -> pd.DataFrame:
    """One-row DataFrame: ``n_triples`` (distinct) + ``fingerprint``
    (16-hex-char set hash over ``cols``)."""
    from cmc_knowledge_graph_text2ttl_ray.functions.cluster import (
        coarse_group_reduce,
    )

    cols = list(cols)

    def pre(df: pd.DataFrame) -> pd.DataFrame:
        return _digests(df, cols).drop_duplicates()

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        d = g["d"].drop_duplicates()
        u = np.frombuffer(b"".join(d), dtype="<u8")[::2]  # first 8 LE bytes
        # the partial travels as a 16-hex STRING: a uint64 > 2^63 in one
        # partition and < 2^63 in another makes Ray's schema unification
        # promote the column to float64, silently destroying low bits
        return pd.DataFrame({"x": [f"{_xor_fold(u):016x}"], "n": [len(d)]})

    parts = coarse_group_reduce(
        triples.map_batches(pre, batch_format="pandas"),
        ["d"], combine, num_coarse=num_coarse).to_pandas()
    fp = 0
    for x in parts["x"]:
        fp ^= int(x, 16)
    return pd.DataFrame([{
        "n_triples": int(parts["n"].sum()),
        "fingerprint": f"{fp:016x}",
    }])


def kg_fingerprint_by_graph(quads, cols=("subject", "predicate", "object"),
                            num_coarse=None) -> pd.DataFrame:
    """Per-named-graph fingerprints: ``(graph, n_quads, fingerprint)`` —
    change detection per source document.  One exchange keyed by graph;
    each graph's digests dedup and fold inside its partition."""
    from cmc_knowledge_graph_text2ttl_ray.functions.cluster import (
        coarse_group_reduce,
    )

    cols = list(cols)

    def pre(df: pd.DataFrame) -> pd.DataFrame:
        out = _digests(df, cols)
        out["graph"] = df["graph"].to_numpy()
        return out.drop_duplicates()

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates()
        rows = []
        for graph, grp in g.groupby("graph", sort=False):
            u = np.frombuffer(b"".join(grp["d"]), dtype="<u8")[::2]
            rows.append({"graph": graph, "n_quads": len(grp),
                         "fingerprint": f"{_xor_fold(u):016x}"})
        return pd.DataFrame(rows)

    out = coarse_group_reduce(
        quads.map_batches(pre, batch_format="pandas"),
        ["graph"], combine, num_coarse=num_coarse).to_pandas()
    return out.sort_values("graph", ignore_index=True)
