"""Property-graph export: label assignment, table split, round trip."""

import os

import pandas as pd

import ray
import ray.data

from cmc_knowledge_graph_text2ttl_ray.stages.property_graph import (
    export_property_graph,
    property_graph_tables,
)

_T = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"


def _df():
    rows = [
        ("urn:a", _T, "urn:Person", "iri"),
        ("urn:a", _T, "urn:Agent", "iri"),       # min label wins: Agent
        ("urn:a", "urn:knows", "urn:b", "iri"),
        ("urn:b", "urn:name", "Bea", "literal"),
        ("urn:b", "urn:knows", "urn:c", "iri"),  # urn:c appears only as object
        ("urn:a", "urn:age", "33", "literal"),
    ]
    return pd.DataFrame(rows, columns=["subject", "predicate", "object",
                                       "object_kind"])


def test_tables_split_and_labels(ray_session):
    ds = ray.data.from_pandas(_df()).repartition(3)
    nodes, edges, props = property_graph_tables(ds)
    n = nodes.to_pandas().sort_values("node", ignore_index=True)
    # class IRIs become LABELS, not nodes (property-graph convention)
    assert n.to_dict("records") == [
        {"node": "urn:a", "label": "urn:Agent"},   # lexicographic min type
        {"node": "urn:b", "label": ""},
        {"node": "urn:c", "label": ""},
    ]
    e = edges.to_pandas().sort_values(["src", "dst"], ignore_index=True)
    assert e.to_dict("records") == [
        {"src": "urn:a", "rel": "urn:knows", "dst": "urn:b"},
        {"src": "urn:b", "rel": "urn:knows", "dst": "urn:c"},
    ]
    p = props.to_pandas().sort_values(["node", "key"], ignore_index=True)
    assert p["value"].tolist() == ["33", "Bea"]


def test_export_round_trip(ray_session, tmp_path):
    ds = ray.data.from_pandas(_df())
    counts = export_property_graph(ds, str(tmp_path))
    assert counts == {"n_nodes": 3, "n_edges": 2, "n_props": 2}
    back = ray.data.read_parquet(os.path.join(tmp_path, "edges")).to_pandas()
    assert len(back) == 2 and set(back.columns) == {"src", "rel", "dst"}


def test_layout_invariance(ray_session):
    base = None
    for blocks in (1, 5):
        ds = ray.data.from_pandas(_df()).repartition(blocks)
        nodes, _, _ = property_graph_tables(ds)
        got = nodes.to_pandas().sort_values("node", ignore_index=True)
        if base is None:
            base = got
        else:
            pd.testing.assert_frame_equal(base, got)
