"""Predicate-partitioned Parquet triple store.

The TTL sink (``stages/sinks.py``) is the interchange/publish layout; at
query time a BGP engine wants the classic RDF vertical-partitioning
layout (Abadi et al., "SW-Store", VLDB-J 2009): triples hive-partitioned
by predicate, so the dominant access path — a pattern with a CONSTANT
predicate — reads only its partition instead of scanning the whole KG.

- :func:`write_triple_store` — one Parquet dataset partitioned by
  ``pred_bucket = md5(predicate) % num_buckets`` (hashing keeps the
  directory fan-out bounded when applications mint open-ended predicate
  vocabularies), plus a ``_predicates.json`` sidecar mapping each
  predicate to its bucket for pruning without listing.
- :class:`TripleStore` — ``scan(predicate=None)`` returns a Dataset;
  with a predicate it reads ONLY that bucket's files (and filters the
  residual hash collisions vectorized).  ``bgp_query`` detects the
  object via duck typing and prunes every constant-predicate pattern
  scan automatically.
"""

from __future__ import annotations

import hashlib
import json
import os

import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["write_triple_store", "TripleStore"]

_COLS = ("subject", "predicate", "object",
         "object_kind", "object_lang", "object_datatype")


def _bucket(predicate: str, num_buckets: int) -> int:
    return int.from_bytes(
        hashlib.md5(predicate.encode("utf-8")).digest()[:8], "big"
    ) % num_buckets


def write_triple_store(triples_ds, out_dir: str,
                       num_buckets: int = 64, append: bool = False) -> dict:
    """Write a triples Dataset as a predicate-bucketed Parquet store.
    Returns ``{"predicates": {pred: bucket}, "num_buckets": N}`` (also
    persisted as ``_predicates.json``).

    ``append=True`` adds the rows to an existing store (Parquet writes
    are new uniquely-named files inside the partition dirs — nothing is
    rewritten) and merges the predicate sidecar; ``num_buckets`` is
    taken from the existing store.  This is how the incremental KG
    pipeline keeps the query-optimized layout in step with the
    generation log without rebuilding it per shard."""
    existing: dict[str, int] = {}
    sidecar = os.path.join(out_dir, "_predicates.json")
    if append and os.path.isfile(sidecar):
        with open(sidecar) as fh:
            meta0 = json.load(fh)
        existing = meta0["predicates"]
        num_buckets = meta0["num_buckets"]

    def add_bucket(t: pa.Table) -> pa.Table:
        cols = {}
        for c in _COLS:
            cols[c] = (t[c].cast(pa.string()) if c in t.column_names
                       else pa.nulls(len(t), pa.string()))
        preds = cols["predicate"].to_pylist()
        cols["pred_bucket"] = pa.array(
            [_bucket(p, num_buckets) for p in preds], pa.int32())
        return pa.table(cols)

    os.makedirs(out_dir, exist_ok=True)
    bucketed = triples_ds.map_batches(add_bucket, batch_format="pyarrow")
    bucketed.write_parquet(out_dir, partition_cols=["pred_bucket"])

    # sidecar: exact predicate → bucket map, built from a pruned
    # predicate-only scan (distinct via per-block sets)
    import ray.data

    pred_ds = ray.data.read_parquet(out_dir, columns=["predicate"])
    preds = set()
    for batch in pred_ds.map_batches(
            lambda t: pa.table(
                {"predicate": pc.unique(t["predicate"])}),
            batch_format="pyarrow").iter_batches(batch_format="pyarrow"):
        preds.update(batch["predicate"].to_pylist())
    mapping = {p: _bucket(p, num_buckets) for p in sorted(preds)}
    meta = {"predicates": mapping, "num_buckets": num_buckets}
    with open(os.path.join(out_dir, "_predicates.json"), "w") as fh:
        json.dump(meta, fh, indent=1, sort_keys=True)
    return meta


class TripleStore:
    """Read side of the predicate-bucketed store (duck-typed into
    ``bgp_query``'s pattern scans via ``scan_for_predicate``)."""

    def __init__(self, path: str):
        self.path = path
        with open(os.path.join(path, "_predicates.json")) as fh:
            meta = json.load(fh)
        self.predicates: dict[str, int] = meta["predicates"]
        self.num_buckets: int = meta["num_buckets"]

    def scan(self, predicate: str | None = None):
        """Dataset of triples; with ``predicate``, reads only its bucket
        directory (hash-collision residue filtered vectorized).  An
        unknown predicate returns an empty typed Dataset without
        touching storage."""
        import ray.data

        if predicate is None:
            ds = ray.data.read_parquet(self.path, columns=list(_COLS))
            return ds
        if predicate not in self.predicates:
            return ray.data.from_arrow(pa.schema(
                [(c, pa.string()) for c in _COLS]).empty_table())
        bucket_dir = os.path.join(self.path,
                                  f"pred_bucket={self.predicates[predicate]}")
        ds = ray.data.read_parquet(bucket_dir, columns=list(_COLS))
        return ds.map_batches(
            lambda t: t.filter(pc.equal(t["predicate"], predicate)),
            batch_format="pyarrow")

    # bgp_query duck-typing hook
    def scan_for_predicate(self, predicate: str | None):
        return self.scan(predicate)
