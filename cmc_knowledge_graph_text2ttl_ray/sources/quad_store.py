"""Graph-partitioned Parquet quad store.

The named-graph counterpart of the predicate-bucketed
:mod:`~cmc_knowledge_graph_text2ttl_ray.sources.triple_store`: quads hive-partitioned by
``graph_bucket = md5(graph) % num_buckets`` so a ``GRAPH <iri> { … }``
query — the dominant access path of a provenance-addressed KG (fetch /
re-validate / retract ONE document's triples out of billions) — reads
one bucket directory instead of scanning the whole store.

Unlike predicates (a bounded vocabulary → exact ``_predicates.json``
sidecar), graphs number one per source document, so there is no
per-graph sidecar: the bucket is recomputed from the IRI at query time
and the residual hash collisions are filtered vectorized.  Per-bucket
row counts live in ``_quadstore.json`` for observability.

``sparql_dist._graph_source`` duck-types ``scan_for_graph``: a constant
GRAPH over a QuadStore prunes automatically; variable-graph patterns
and non-GRAPH patterns fall back to the full scan
(``scan_for_predicate`` keeps the object drop-in-compatible with
``bgp_query``'s triple-source hook, without predicate pruning).
"""

from __future__ import annotations

import hashlib
import json
import os

import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["write_quad_store", "QuadStore"]

_COLS = ("subject", "predicate", "object",
         "object_kind", "object_lang", "object_datatype", "graph")


def _bucket(graph: str, num_buckets: int) -> int:
    return int.from_bytes(
        hashlib.md5(graph.encode("utf-8")).digest()[:8], "big"
    ) % num_buckets


def write_quad_store(quads_ds, out_dir: str, num_buckets: int = 64) -> dict:
    """Write a quad Dataset as a graph-bucketed Parquet store."""

    def add_bucket(t: pa.Table) -> pa.Table:
        cols = {}
        for c in _COLS:
            cols[c] = (t[c].cast(pa.string()) if c in t.column_names
                       else pa.nulls(len(t), pa.string()))
        # normalize missing/null graphs to "" so bucketing and
        # scan("") agree (a null row would hash under "" but never
        # match the equality filter)
        cols["graph"] = pc.fill_null(
            pa.chunked_array([cols["graph"]])
            if not isinstance(cols["graph"], (pa.ChunkedArray, pa.Array))
            else cols["graph"], "")
        # mint once per distinct graph in the block, then map
        graphs = cols["graph"].to_pylist()
        lut = {g: _bucket(g or "", num_buckets) for g in set(graphs)}
        cols["graph_bucket"] = pa.array((lut[g] for g in graphs),
                                        pa.int32(), size=len(graphs))
        return pa.table(cols)

    os.makedirs(out_dir, exist_ok=True)
    bucketed = quads_ds.map_batches(add_bucket, batch_format="pyarrow")
    bucketed.write_parquet(out_dir, partition_cols=["graph_bucket"])

    import ray.data

    counts = (ray.data.read_parquet(out_dir, columns=["graph_bucket"])
              .groupby("graph_bucket").count().to_pandas())
    meta = {
        "num_buckets": num_buckets,
        "bucket_rows": {str(int(r["graph_bucket"])): int(r["count()"])
                        for _, r in counts.iterrows()},
    }
    with open(os.path.join(out_dir, "_quadstore.json"), "w") as fh:
        json.dump(meta, fh, indent=1, sort_keys=True)
    return meta


class QuadStore:
    """Read side of the graph-bucketed store."""

    def __init__(self, path: str):
        self.path = path
        with open(os.path.join(path, "_quadstore.json")) as fh:
            meta = json.load(fh)
        self.num_buckets: int = meta["num_buckets"]
        self.bucket_rows: dict[str, int] = meta.get("bucket_rows", {})

    def scan(self, graph: str | None = None):
        """Dataset of quads; with ``graph``, reads ONLY its bucket
        directory (collision residue filtered vectorized).  A graph
        hashing to a bucket with no rows returns an empty typed Dataset
        without touching storage."""
        import ray.data

        if graph is None:
            return ray.data.read_parquet(self.path, columns=list(_COLS))
        b = _bucket(graph, self.num_buckets)
        if self.bucket_rows.get(str(b), 0) == 0:
            return ray.data.from_arrow(pa.schema(
                [(c, pa.string()) for c in _COLS]).empty_table())
        bucket_dir = os.path.join(self.path, f"graph_bucket={b}")
        ds = ray.data.read_parquet(bucket_dir, columns=list(_COLS))
        return ds.map_batches(
            lambda t, _g=graph: t.filter(
                pc.fill_null(pc.equal(t["graph"], _g), False)),
            batch_format="pyarrow")

    # sparql_dist._graph_source duck-typing hook (constant-GRAPH pruning)
    def scan_for_graph(self, graph: str | None):
        return self.scan(graph)

    # bgp_query duck-typing hook — QuadStores are not predicate-bucketed,
    # so this is the full scan (patterns still filter vectorized)
    def scan_for_predicate(self, predicate: str | None):
        return self.scan(None)
