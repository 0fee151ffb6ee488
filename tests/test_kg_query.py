"""Distributed BGP querying (pipelines/kg_query.py).

Differential strategy: every BGP result is checked against a brute-force
in-memory evaluator over the same triple rows, so join order / partition
count / block layout can never change semantics.
"""

import itertools

import pandas as pd
import pyarrow as pa
import pytest

from cmc_knowledge_graph_text2ttl_ray.pipelines.kg_query import (
    _is_var,
    bgp_query,
    event_triples,
)

TRIPLES = [
    # (subject, predicate, object)
    ("d1", "mentions", "acme"),
    ("d1", "mentions", "octan"),
    ("d2", "mentions", "octan"),
    ("d3", "mentions", "initech"),
    ("acme", "hq_in", "berlin"),
    ("octan", "hq_in", "vienna"),
    ("vienna", "in_country", "austria"),
    ("berlin", "in_country", "germany"),
    ("d1", "title", "Page 1"),
    ("octan", "same_as", "octan"),  # reflexive: repeated-var pattern target
    ("acme", "same_as", "octan"),
]


def _triples_ds(num_blocks=1):
    import ray.data

    tbl = pa.table({
        "subject": [t[0] for t in TRIPLES],
        "predicate": [t[1] for t in TRIPLES],
        "object": [t[2] for t in TRIPLES],
        "object_kind": ["iri"] * len(TRIPLES),
    })
    ds = ray.data.from_arrow(tbl)
    return ds.repartition(num_blocks) if num_blocks > 1 else ds


def _brute(patterns, project):
    """Reference evaluator: enumerate all row combinations, keep
    consistent variable assignments."""
    rows = []
    for combo in itertools.product(TRIPLES, repeat=len(patterns)):
        env = {}
        ok = True
        for (s, p, o), pat in zip(combo, patterns):
            for term, val in zip(pat, (s, p, o)):
                if _is_var(term):
                    if env.setdefault(term, val) != val:
                        ok = False
                        break
                elif term != val:
                    ok = False
                    break
            if not ok:
                break
        if ok:
            rows.append(tuple(env[v] for v in project))
    cols = [v[1:] for v in project]
    return (pd.DataFrame(sorted(set(rows)), columns=cols)
            if rows else pd.DataFrame(columns=cols))


def _run(patterns, project, num_blocks=1):
    out = bgp_query(_triples_ds(num_blocks), patterns,
                    project=project, distinct=True).to_pandas()
    return out.sort_values(list(out.columns)).reset_index(drop=True)


@pytest.mark.parametrize("num_blocks", [1, 4])
def test_two_hop_chain_matches_bruteforce(ray_session, num_blocks):
    patterns = [("?d", "mentions", "?e"), ("?e", "hq_in", "?pl")]
    got = _run(patterns, ["?d", "?e", "?pl"], num_blocks)
    want = _brute(patterns, ["?d", "?e", "?pl"])
    pd.testing.assert_frame_equal(got, want)


def test_three_hop_chain_matches_bruteforce(ray_session):
    patterns = [("?d", "mentions", "?e"), ("?e", "hq_in", "?pl"),
                ("?pl", "in_country", "?c")]
    got = _run(patterns, ["?d", "?c"])
    want = _brute(patterns, ["?d", "?c"])
    pd.testing.assert_frame_equal(got, want)


def test_constant_object_and_subject(ray_session):
    patterns = [("?d", "mentions", "octan"), ("?d", "title", "?t")]
    got = _run(patterns, ["?d", "?t"])
    want = _brute(patterns, ["?d", "?t"])
    pd.testing.assert_frame_equal(got, want)
    assert got["d"].tolist() == ["d1"]


def test_repeated_variable_within_pattern(ray_session):
    # (?x, same_as, ?x) matches only the reflexive row
    got = _run([("?x", "same_as", "?x")], ["?x"])
    assert got["x"].tolist() == ["octan"]


def test_empty_result_keeps_schema(ray_session):
    got = bgp_query(
        _triples_ds(),
        [("?d", "mentions", "nosuch"), ("?d", "title", "?t")],
        project=["?d", "?t"],
    )
    # Dataset keeps the typed schema (Ray's to_pandas drops columns on
    # 0-row datasets, so assert on the schema, not the frame)
    assert got.schema().names == ["d", "t"]
    assert got.count() == 0


def test_disconnected_bgp_rejected(ray_session):
    with pytest.raises(ValueError, match="Disconnected"):
        bgp_query(_triples_ds(),
                  [("?a", "mentions", "?b"), ("?x", "hq_in", "?y")])


def test_constant_only_pattern_rejected(ray_session):
    with pytest.raises(ValueError, match="no variables"):
        bgp_query(_triples_ds(), [("d1", "mentions", "acme")])


def test_join_order_heuristic_is_semantics_free(ray_session):
    # same query, patterns listed most-selective-last: result identical
    fwd = [("?d", "mentions", "?e"), ("?e", "hq_in", "vienna")]
    rev = list(reversed(fwd))
    pd.testing.assert_frame_equal(_run(fwd, ["?d", "?e"]),
                                  _run(rev, ["?d", "?e"]))


def test_optional_keeps_unmatched_with_nulls(ray_session):
    got = bgp_query(
        _triples_ds(),
        [("?d", "mentions", "?e")],
        optional_patterns=[("?e", "hq_in", "?pl")],
        project=["?d", "?e", "?pl"], distinct=True,
    ).to_pandas().sort_values(["d", "e"]).reset_index(drop=True)
    # d3 mentions initech, which has no hq_in triple → null pl
    assert got.loc[(got.d == "d3") & (got.e == "initech"), "pl"].isna().all()
    assert got.loc[(got.d == "d1") & (got.e == "acme"), "pl"].tolist() == ["berlin"]
    assert len(got) == 4  # (d1,acme) (d1,octan) (d2,octan) (d3,initech)


def test_optional_with_empty_group_extends_nulls(ray_session):
    got = bgp_query(
        _triples_ds(),
        [("?d", "mentions", "?e")],
        optional_patterns=[("?e", "no_such_pred", "?z")],
        project=["?d", "?e", "?z"], distinct=True,
    ).to_pandas()
    assert len(got) == 4
    assert got["z"].isna().all()


def test_optional_is_null_filter_negation(ray_session):
    # the classic OPTIONAL + FILTER(!bound) negation: entities mentioned
    # but with no known headquarters
    got = bgp_query(
        _triples_ds(),
        [("?d", "mentions", "?e")],
        optional_patterns=[("?e", "hq_in", "?pl")],
        filters=[("?pl", "is_null", None)],
        project=["?e"], distinct=True,
    ).to_pandas()
    assert got["e"].tolist() == ["initech"]


def test_comparison_filter(ray_session):
    got = bgp_query(
        _triples_ds(),
        [("?d", "mentions", "?e")],
        filters=[("?d", "!=", "d1")],
        project=["?d", "?e"], distinct=True,
    ).to_pandas().sort_values(["d", "e"]).reset_index(drop=True)
    assert got["d"].tolist() == ["d2", "d3"]


def test_callable_filter(ray_session):
    import pyarrow.compute as pc

    got = bgp_query(
        _triples_ds(),
        [("?d", "mentions", "?e")],
        filters=[lambda t: pc.match_substring(t["e"], "tan")],
        project=["?e"], distinct=True,
    ).to_pandas()
    assert got["e"].tolist() == ["octan"]


def test_disconnected_optional_rejected(ray_session):
    with pytest.raises(ValueError, match="OPTIONAL group shares no"):
        bgp_query(_triples_ds(), [("?d", "mentions", "?e")],
                  optional_patterns=[("?x", "hq_in", "?y")],
                  project=["?d"])


def test_minus_subtracts_on_shared_vars(ray_session):
    # docs that mention an entity MINUS entities with a known hq:
    # initech is the only mentioned entity without hq_in
    got = bgp_query(
        _triples_ds(),
        [("?d", "mentions", "?e")],
        minus_patterns=[("?e", "hq_in", "?pl")],
        project=["?d", "?e"], distinct=True,
    ).to_pandas()
    assert got.values.tolist() == [["d3", "initech"]]


def test_minus_with_empty_group_is_noop(ray_session):
    base = _run([("?d", "mentions", "?e")], ["?d", "?e"])
    got = bgp_query(
        _triples_ds(),
        [("?d", "mentions", "?e")],
        minus_patterns=[("?e", "no_such_pred", "?z")],
        project=["?d", "?e"], distinct=True,
    ).to_pandas().sort_values(["d", "e"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, base)


def test_disconnected_minus_rejected(ray_session):
    with pytest.raises(ValueError, match="MINUS group shares no"):
        bgp_query(_triples_ds(), [("?d", "mentions", "?e")],
                  minus_patterns=[("?x", "hq_in", "?y")],
                  project=["?d"])


def _spo_set(ds):
    df = ds.to_pandas()
    if df.empty:
        return set()
    return set(map(tuple, df[["subject", "predicate", "object"]].values))


def test_khop_subgraph_both_directions(ray_session):
    from cmc_knowledge_graph_text2ttl_ray.pipelines.kg_query import (
        khop_subgraph,
    )

    # 1 hop around octan: its outgoing + incoming edges
    got = _spo_set(khop_subgraph(_triples_ds(), ["octan"], k=1))
    assert got == {("d1", "mentions", "octan"), ("d2", "mentions", "octan"),
                   ("octan", "hq_in", "vienna"),
                   ("octan", "same_as", "octan"),
                   ("acme", "same_as", "octan")}

    # 2 hops reach vienna->austria and d1's other edges
    got2 = _spo_set(khop_subgraph(_triples_ds(), ["octan"], k=2))
    assert ("vienna", "in_country", "austria") in got2
    assert ("d1", "mentions", "acme") in got2
    assert got2 > got


def test_khop_subgraph_directed(ray_session):
    from cmc_knowledge_graph_text2ttl_ray.pipelines.kg_query import (
        khop_subgraph,
    )

    out = _spo_set(khop_subgraph(_triples_ds(), ["octan"], k=2,
                                 direction="out"))
    # forward only: octan->vienna->austria, never the mentioning docs
    assert out == {("octan", "hq_in", "vienna"),
                   ("octan", "same_as", "octan"),
                   ("vienna", "in_country", "austria")}


def test_khop_frontier_guard(ray_session):
    from cmc_knowledge_graph_text2ttl_ray.pipelines.kg_query import (
        khop_subgraph,
    )

    with pytest.raises(ValueError, match="max_frontier"):
        khop_subgraph(_triples_ds(), ["octan"], k=3, max_frontier=2)


def test_event_triples_encoding(ray_session):
    ds = event_triples("/root/testdata/sf0.001")
    row = ds.take(1)[0]
    assert row["subject"].startswith("user:")
    assert len(row["object"]) == 10  # YYYY-MM-DD
    assert row["object_kind"] == "literal"
