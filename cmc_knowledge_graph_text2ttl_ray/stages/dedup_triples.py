"""Exact triple dedup — the engine's explicit version of rdflib's implicit
graph-set semantics (reference _add_triple,
kg_text_to_ttl/text_to_turtle_processor.py:2313-2332: adding an identical
triple twice collapses in the serialized output).

Scale design: global dedup is unavoidably an all-to-all exchange, so we
minimize what moves:

1. **In-block pre-dedup** (combiner): drop duplicate rows inside every block
   with a vectorized group-by before anything is shuffled. Duplicate triples
   overwhelmingly come from the same/nearby documents, so this removes most
   volume locally.
2. **Hash-keyed shuffle**: a single uint64 key column (hash of the full
   identity tuple) drives one ``groupby``; inside each group the full rows
   are compared, so hash collisions are handled, and the shuffle moves one
   int column + payload instead of sorting on 5 string columns.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

__all__ = ["dedup_triples", "IDENTITY_COLS"]

IDENTITY_COLS = ["subject", "predicate", "object", "object_kind", "object_lang", "object_datatype"]


def _identity_hash(df: pd.DataFrame) -> np.ndarray:
    key = df[IDENTITY_COLS[0]].astype("str")
    for c in IDENTITY_COLS[1:]:
        key = key + "\x1f" + df[c].astype("str")
    return pd.util.hash_array(key.to_numpy(dtype=object)).astype("uint64")


def dedup_triples(triples_ds, keep_doc: bool = False):
    """Dataset of triple rows → globally exact-deduped dataset.

    When ``keep_doc`` is False the provenance columns (doc_url/workflow) are
    dropped before dedup so the identity is purely the RDF triple; the
    surviving row is deterministic (min doc_url wins).
    """

    def pre_dedup(batch: pa.Table) -> pd.DataFrame:
        df = batch.select(
            [c for c in batch.column_names if keep_doc or c in IDENTITY_COLS or c == "doc_url"]
        ).to_pandas()
        df["h"] = _identity_hash(df)
        df = df.sort_values(["h", "doc_url"], kind="stable")
        df = df.drop_duplicates(subset=["h"] + IDENTITY_COLS, keep="first")
        return df

    pre = triples_ds.map_batches(pre_dedup, batch_format="pyarrow")

    def group_dedup(group: pd.DataFrame) -> pd.DataFrame:
        group = group.sort_values("doc_url", kind="stable")
        out = group.drop_duplicates(subset=IDENTITY_COLS, keep="first")
        return out.drop(columns=["h"])

    return pre.groupby("h").map_groups(group_dedup, batch_format="pandas")
