"""Property-graph export: triples → nodes / edges / props Parquet.

Bridges the RDF world to property-graph engines (Neo4j-style bulk load,
GraphFrames, networkx ingestion): IRI-object triples become typed edges,
``rdf:type`` objects become node labels, literal-valued triples become
an EAV node-property table.  The reference stops at Turtle; the engine's
downstream KG consumers (graph_algos: pagerank, components, triangles)
already run on edge tables — this sink materializes that layout as a
reusable artifact.

Layout (three Parquet directories, each written by Ray — partitioned,
any-node-writable, readable back with ``read_parquet``):

- ``edges/``  — ``src, rel, dst``        (IRI objects, minus the label
  predicate)
- ``nodes/``  — ``node, label``          (every distinct IRI; label =
  lexicographic MIN of its ``rdf:type`` objects, ``""`` when untyped —
  deterministic regardless of partitioning)
- ``props/``  — ``node, key, value``     (literal-valued triples)

Scale shape: edges and props are pure ``map_batches`` filters (no
shuffle).  The node table needs ONE exchange: per-block candidate rows
(subjects ∪ IRI objects with their type if the row is a type triple)
pre-deduped, co-located on ``hash(node) % P``, label = vectorized
groupby-min inside each partition.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["property_graph_tables", "export_property_graph"]

_RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"

# untyped rows carry this sentinel through the min-aggregation ("" would
# win every min; None/NaN makes pandas' object-min raise on mixed groups)
_NO_LABEL = "\uffff"


def _min_label(df: pd.DataFrame) -> pd.DataFrame:
    df = df.copy()
    df["label"] = df["label"].replace("", _NO_LABEL)
    agg = df.groupby("node", as_index=False)["label"].min()
    agg["label"] = agg["label"].replace(_NO_LABEL, "")
    return agg


def property_graph_tables(triples, type_predicate: str = _RDF_TYPE):
    """Returns ``(nodes_ds, edges_ds, props_ds)`` lazily."""
    from cmc_knowledge_graph_text2ttl_ray.functions.cluster import (
        coarse_group_reduce,
    )

    def edges(t: pa.Table) -> pa.Table:
        m = pc.and_(pc.equal(t["object_kind"], "iri"),
                    pc.not_equal(t["predicate"], type_predicate))
        t = t.filter(pc.fill_null(m, False))
        return pa.table({"src": t["subject"], "rel": t["predicate"],
                         "dst": t["object"]})

    def props(t: pa.Table) -> pa.Table:
        t = t.filter(pc.fill_null(
            pc.not_equal(t["object_kind"], "iri"), False))
        return pa.table({"node": t["subject"], "key": t["predicate"],
                         "value": t["object"]})

    def node_candidates(df: pd.DataFrame) -> pd.DataFrame:
        is_iri = df["object_kind"] == "iri"
        is_type = is_iri & (df["predicate"] == type_predicate)
        subj = pd.DataFrame({
            "node": df["subject"],
            "label": df["object"].where(is_type, ""),
        })
        obj = pd.DataFrame({
            "node": df.loc[is_iri & ~is_type, "object"],
            "label": "",
        })
        out = pd.concat([subj, obj], ignore_index=True)
        return _min_label(out)

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        return _min_label(g)

    nodes = coarse_group_reduce(
        triples.map_batches(node_candidates, batch_format="pandas"),
        ["node"], combine)
    return (nodes,
            triples.map_batches(edges, batch_format="pyarrow"),
            triples.map_batches(props, batch_format="pyarrow"))


def export_property_graph(triples, out_dir: str,
                          type_predicate: str = _RDF_TYPE) -> dict:
    """Write the three tables under ``out_dir`` and return row counts."""
    import os

    nodes, edges, props = property_graph_tables(triples, type_predicate)
    counts = {}
    for name, ds in (("nodes", nodes), ("edges", edges), ("props", props)):
        path = os.path.join(out_dir, name)
        ds = ds.materialize()
        ds.write_parquet(path)
        counts[f"n_{name}"] = ds.count()
    return counts
