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

__all__ = ["property_graph_tables", "export_property_graph",
           "property_graph_to_triples", "import_property_graph"]

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


def property_graph_to_triples(nodes, edges, props,
                              type_predicate: str = _RDF_TYPE):
    """The inverse bridge: nodes/edges/props tables → an engine triple
    Dataset (``subject, predicate, object, object_kind``).

    Pure ``map_batches`` + ``union`` — zero shuffle. Lossiness is
    inherited from the export, not introduced here: a node keeps only its
    MIN ``rdf:type`` (multi-typed nodes come back single-typed) and
    literal datatype/lang annotations are gone (every prop value returns
    as a plain literal). For single-typed, plain-literal graphs the
    round-trip is exact — pinned by the triple_set_pr round-trip test.
    """

    def from_edges(t: pa.Table) -> pa.Table:
        n = len(t)
        return pa.table({
            "subject": t["src"], "predicate": t["rel"], "object": t["dst"],
            "object_kind": pa.array(["iri"] * n, pa.string()),
        })

    def from_nodes(t: pa.Table) -> pa.Table:
        t = t.filter(pc.fill_null(pc.not_equal(t["label"], ""), False))
        n = len(t)
        return pa.table({
            "subject": t["node"],
            "predicate": pa.array([type_predicate] * n, pa.string()),
            "object": t["label"],
            "object_kind": pa.array(["iri"] * n, pa.string()),
        })

    def from_props(t: pa.Table) -> pa.Table:
        n = len(t)
        return pa.table({
            "subject": t["node"], "predicate": t["key"],
            "object": t["value"],
            "object_kind": pa.array(["literal"] * n, pa.string()),
        })

    return (edges.map_batches(from_edges, batch_format="pyarrow")
            .union(nodes.map_batches(from_nodes, batch_format="pyarrow"),
                   props.map_batches(from_props, batch_format="pyarrow")))


def import_property_graph(in_dir: str,
                          type_predicate: str = _RDF_TYPE):
    """Read the three Parquet directories an
    :func:`export_property_graph` run wrote and reassemble triples.
    A table that was empty at export time has no directory on disk
    (``write_parquet`` of zero rows writes nothing) — substitute an
    empty typed dataset."""
    import os

    import ray.data

    def read_or_empty(name: str, cols):
        path = os.path.join(in_dir, name)
        if os.path.isdir(path) and os.listdir(path):
            return ray.data.read_parquet(path)
        return ray.data.from_arrow(pa.table(
            {c: pa.array([], pa.string()) for c in cols}))

    return property_graph_to_triples(
        read_or_empty("nodes", ("node", "label")),
        read_or_empty("edges", ("src", "rel", "dst")),
        read_or_empty("props", ("node", "key", "value")),
        type_predicate=type_predicate,
    )
