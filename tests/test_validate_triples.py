"""KG literal/IRI validation pass."""

import pandas as pd
import pytest
import ray.data

from cmc_knowledge_graph_text2ttl_ray.pipelines.kg import validate_triples

XSD = "http://www.w3.org/2001/XMLSchema#"


def _run(rows):
    ds = ray.data.from_pandas(pd.DataFrame(rows)).repartition(2)
    out = validate_triples(ds).to_pandas()
    return {(r["predicate"], r["object_datatype"]):
            (r["n"], r["n_invalid"]) for _, r in out.iterrows()}


def _triple(pred, obj, kind="literal", dt=None):
    return {"subject": "s", "predicate": pred, "object": obj,
            "object_kind": kind, "object_lang": None,
            "object_datatype": dt, "doc_url": "u"}


def test_datatype_and_iri_validation(ray_session):
    got = _run([
        _triple("p:num", "42", dt=XSD + "integer"),
        _triple("p:num", "4x2", dt=XSD + "integer"),
        _triple("p:date", "2020-12-31", dt=XSD + "date"),
        _triple("p:date", "2020-13-99", dt=XSD + "date"),  # lexical-ok, bad
        _triple("p:bool", "true", dt=XSD + "boolean"),
        _triple("p:iri", "http://ok/x", kind="resource"),
        _triple("p:iri", "not an iri", kind="resource"),
        _triple("p:txt", "free text"),
    ])
    assert got[("p:num", XSD + "integer")] == (2, 1)
    assert got[("p:date", XSD + "date")] == (2, 1)
    assert got[("p:bool", XSD + "boolean")] == (1, 0)
    assert got[("p:iri", "")] == (2, 1)
    assert got[("p:txt", "")] == (1, 0)


def test_flagship_kg_output_is_clean(ray_session):
    """The engine's own sf0.001 KG output must validate clean — this is
    the publish gate."""
    import __ray_entry__ as e

    triples = e.queries()["kg_triples"]("/root/testdata/sf0.001")
    out = validate_triples(triples).to_pandas()
    assert out["n"].sum() > 0
    assert (out["n_invalid"] == 0).all(), \
        out[out["n_invalid"] > 0].to_dict("records")
