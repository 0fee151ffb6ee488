"""VoID dataset statistics: exactness, block-invariance, RDF rendering."""

import pandas as pd
import pytest

import ray
import ray.data

from cmc_knowledge_graph_text2ttl_ray.pipelines.void_stats import (
    void_class_partitions,
    void_graph_partitions,
    void_property_partitions,
    void_summary,
    void_triples,
)


def _triples_df(n=200):
    rows = []
    for i in range(n):
        rows.append((f"urn:s{i % 37}", f"urn:p{i % 5}", f"v{i % 11}",
                     "literal", None, None, f"urn:g{i % 7}"))
    rows.append(("urn:s0", "http://www.w3.org/1999/02/22-rdf-syntax-ns#type",
                 "urn:ClassA", "iri", None, None, "urn:g0"))
    rows.append(("urn:s1", "http://www.w3.org/1999/02/22-rdf-syntax-ns#type",
                 "urn:ClassA", "iri", None, None, "urn:g0"))
    rows.append(("urn:s2", "http://www.w3.org/1999/02/22-rdf-syntax-ns#type",
                 "urn:ClassB", "iri", None, None, "urn:g1"))
    return pd.DataFrame(rows, columns=[
        "subject", "predicate", "object", "object_kind",
        "object_lang", "object_datatype", "graph"])


def _brute(df):
    pp = (df.groupby("predicate")
            .agg(n_triples=("subject", "size"),
                 n_subjects=("subject", "nunique"),
                 n_objects=("object", "nunique"))
            .reset_index().sort_values("predicate", ignore_index=True))
    gp = (df.groupby("graph")
            .agg(n_quads=("subject", "size"),
                 n_subjects=("subject", "nunique"),
                 n_predicates=("predicate", "nunique"))
            .reset_index().sort_values("graph", ignore_index=True))
    return pp, gp


@pytest.mark.parametrize("blocks", [1, 7])
def test_partitions_match_brute_force_any_blocking(ray_session, blocks):
    df = _triples_df()
    ds = ray.data.from_pandas(df).repartition(blocks).materialize()
    pp_want, gp_want = _brute(df)
    pd.testing.assert_frame_equal(
        void_property_partitions(ds).astype(pp_want.dtypes), pp_want)
    pd.testing.assert_frame_equal(
        void_graph_partitions(ds).astype(gp_want.dtypes), gp_want)


def test_class_partitions_distinct_instances(ray_session):
    df = _triples_df()
    # duplicate a type assertion: n_instances must not double-count
    df = pd.concat([df, df[df["object"] == "urn:ClassA"].head(1)],
                   ignore_index=True)
    ds = ray.data.from_pandas(df).repartition(3).materialize()
    out = void_class_partitions(ds)
    assert out.to_dict("records") == [
        {"class": "urn:ClassA", "n_instances": 2},
        {"class": "urn:ClassB", "n_instances": 1}]


def test_summary_exact(ray_session):
    df = _triples_df()
    ds = ray.data.from_pandas(df).repartition(5).materialize()
    out = void_summary(ds).iloc[0]
    assert out["n_triples"] == len(df)
    assert out["n_subjects"] == df["subject"].nunique()
    assert out["n_predicates"] == df["predicate"].nunique()
    assert out["n_objects"] == df["object"].nunique()


def test_void_triples_render_and_serialize(ray_session):
    df = _triples_df()
    ds = ray.data.from_pandas(df).materialize()
    pp = void_property_partitions(ds)
    cp = void_class_partitions(ds)
    s = void_summary(ds)
    vt = void_triples(pp, cp, s)
    # dataset node carries the four summary descriptors as xsd:integer
    head = vt[vt["subject"] == "urn:graft:void:dataset"]
    preds = set(head["predicate"])
    assert {"http://rdfs.org/ns/void#triples",
            "http://rdfs.org/ns/void#distinctSubjects"} <= preds
    # one propertyPartition node per predicate, one classPartition per class
    assert (vt["predicate"] == "http://rdfs.org/ns/void#propertyPartition") \
        .sum() == len(pp)
    assert (vt["predicate"] == "http://rdfs.org/ns/void#classPartition") \
        .sum() == len(cp)
    # rows serialize through the engine's Turtle sink schema
    from cmc_knowledge_graph_text2ttl_ray.functions.turtle import (
        parse_turtle,
        serialize_triples,
    )

    ttl = serialize_triples(
        list(vt.itertuples(index=False, name=None)),
        {"void": "http://rdfs.org/ns/void#"})
    back, _ = parse_turtle(ttl)
    assert len(back) == len(vt)


def test_summary_approx_within_hll_bound(ray_session):
    # 5000 distinct subjects / 40 predicates / 2500 distinct objects
    n = 20_000
    df = pd.DataFrame({
        "subject": [f"urn:s{i % 5000}" for i in range(n)],
        "predicate": [f"urn:p{i % 40}" for i in range(n)],
        "object": [f"v{i % 2500}" for i in range(n)],
    })
    ds = ray.data.from_pandas(df).repartition(6).materialize()
    from cmc_knowledge_graph_text2ttl_ray.pipelines.void_stats import (
        void_summary_approx,
    )

    out = void_summary_approx(ds, p=12).iloc[0]
    assert out["n_triples"] == n
    # 1.04/sqrt(2^12) ≈ 1.6%; allow 5 sigma
    for est, exact in ((out["n_subjects_est"], 5000),
                       (out["n_predicates_est"], 40),
                       (out["n_objects_est"], 2500)):
        assert abs(est - exact) / exact < 0.09, (est, exact)
