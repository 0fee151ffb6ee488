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


def test_property_graph_round_trip_exact(ray_session, tmp_path):
    """Single-typed, plain-literal triples survive export → import
    byte-exactly (P = R = F1 = 1.0 via the distributed set compare)."""
    import pandas as pd
    import ray

    from cmc_knowledge_graph_text2ttl_ray.pipelines.kg_eval import (
        triple_set_pr,
    )
    from cmc_knowledge_graph_text2ttl_ray.stages.property_graph import (
        export_property_graph,
        import_property_graph,
    )

    rdf_type = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
    rows = [
        ("urn:a", rdf_type, "urn:Person", "iri"),
        ("urn:b", rdf_type, "urn:Person", "iri"),
        ("urn:a", "urn:knows", "urn:b", "iri"),
        ("urn:b", "urn:knows", "urn:c", "iri"),
        ("urn:a", "urn:name", "Ann", "literal"),
        ("urn:c", "urn:name", "Cid", "literal"),
    ]
    triples = ray.data.from_pandas(pd.DataFrame(
        rows, columns=["subject", "predicate", "object", "object_kind"]))
    out = str(tmp_path / "pg")
    counts = export_property_graph(triples, out)
    assert counts["n_edges"] == 2 and counts["n_props"] == 2

    back = import_property_graph(out)
    r = triple_set_pr(back, triples,
                      cols=("subject", "predicate", "object",
                            "object_kind")).iloc[0]
    assert (r["prec"], r["rec"], r["f1"]) == (1.0, 1.0, 1.0)
    assert r["n_got"] == r["n_expected"] == len(rows)


def test_property_graph_import_drops_untyped_labels(ray_session, tmp_path):
    import pandas as pd
    import ray

    from cmc_knowledge_graph_text2ttl_ray.stages.property_graph import (
        export_property_graph,
        import_property_graph,
    )

    triples = ray.data.from_pandas(pd.DataFrame(
        [("urn:x", "urn:knows", "urn:y", "iri")],
        columns=["subject", "predicate", "object", "object_kind"]))
    out = str(tmp_path / "pg2")
    export_property_graph(triples, out)
    back = import_property_graph(out).to_pandas()
    # untyped nodes contribute no rdf:type rows on the way back
    assert list(back["predicate"]) == ["urn:knows"]
