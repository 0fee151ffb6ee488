"""KG content fingerprints: set semantics, layout invariance, rollforward."""

import hashlib

import pandas as pd

import ray
import ray.data

from cmc_knowledge_graph_text2ttl_ray.pipelines.kg_fingerprint import (
    kg_fingerprint,
    kg_fingerprint_by_graph,
)


def _df(rows):
    return pd.DataFrame(rows, columns=["subject", "predicate", "object",
                                       "graph"])


ROWS = [(f"urn:s{i % 13}", f"urn:p{i % 3}", f"v{i}", f"urn:g{i % 4}")
        for i in range(100)]


def _brute_fp(rows):
    fp = 0
    for s, p, o, _g in set(rows):
        key = f"{s}\x1f{p}\x1f{o}".encode()
        fp ^= int.from_bytes(hashlib.md5(key).digest()[:8], "little")
    return f"{fp:016x}"


def test_matches_brute_force_any_layout(ray_session):
    for blocks in (1, 7):
        ds = ray.data.from_pandas(_df(ROWS)).repartition(blocks)
        out = kg_fingerprint(ds).iloc[0]
        assert out["fingerprint"] == _brute_fp(ROWS)
        assert out["n_triples"] == len(ROWS)


def test_duplicates_do_not_change_fingerprint(ray_session):
    dup = ROWS + ROWS[:17]
    out = kg_fingerprint(ray.data.from_pandas(_df(dup)).repartition(5)).iloc[0]
    assert out["fingerprint"] == _brute_fp(ROWS)
    assert out["n_triples"] == len(ROWS)  # set semantics


def test_rollforward_by_xor(ray_session):
    base = kg_fingerprint(ray.data.from_pandas(_df(ROWS))).iloc[0]
    extra = ("urn:new", "urn:p0", "vX", "urn:g0")
    both = kg_fingerprint(
        ray.data.from_pandas(_df(ROWS + [extra]))).iloc[0]
    key = "urn:new\x1furn:p0\x1fvX".encode()
    delta = int.from_bytes(hashlib.md5(key).digest()[:8], "little")
    assert int(both["fingerprint"], 16) == int(base["fingerprint"], 16) ^ delta


def test_by_graph_detects_single_graph_change(ray_session):
    a = kg_fingerprint_by_graph(ray.data.from_pandas(_df(ROWS)))
    changed = [(s, p, ("CHANGED" if (g == "urn:g2" and o == "v2") else o), g)
               for s, p, o, g in ROWS]
    b = kg_fingerprint_by_graph(ray.data.from_pandas(_df(changed))
                                .repartition(3))
    merged = a.merge(b, on="graph", suffixes=("_a", "_b"))
    diff = merged[merged["fingerprint_a"] != merged["fingerprint_b"]]
    assert diff["graph"].tolist() == ["urn:g2"]


# --------------------------------------------------------------------------
# isomorphism-canonical fingerprint
# --------------------------------------------------------------------------

TTL = """
@prefix ex: <http://ex.org/> .
ex:doc ex:author [ ex:name "Ann" ; ex:org [ ex:label "ACME" ] ] .
ex:doc ex:editor [ ex:name "Bob" ] .
ex:a ex:p ex:b .
"""


def _iso_ds(ttl, scope, extra_scope=None):
    from cmc_knowledge_graph_text2ttl_ray.functions.turtle import (
        parse_turtle,
    )

    trs, _ = parse_turtle(ttl, bnode_scope=scope)
    if extra_scope:
        trs = trs + parse_turtle(ttl, bnode_scope=extra_scope)[0]
    df = pd.DataFrame([{"subject": s, "predicate": p, "object": o}
                       for (s, p, o, *_rest) in trs])
    return ray.data.from_pandas(df)


def test_isocanonical_invariant_under_bnode_relabeling(ray_session):
    from cmc_knowledge_graph_text2ttl_ray.pipelines.kg_fingerprint import (
        kg_isocanonical_fingerprint,
    )

    a = kg_isocanonical_fingerprint(_iso_ds(TTL, "scopeA")).iloc[0]
    b = kg_isocanonical_fingerprint(
        _iso_ds(TTL, "a-totally-different-scope").repartition(3)).iloc[0]
    assert a["fingerprint"] == b["fingerprint"]
    assert a["n_triples"] == b["n_triples"] == 7
    # the plain set hash is label-sensitive (sanity of the contrast)
    pa_ = kg_fingerprint(_iso_ds(TTL, "scopeA")).iloc[0]["fingerprint"]
    pb = kg_fingerprint(
        _iso_ds(TTL, "a-totally-different-scope")).iloc[0]["fingerprint"]
    assert pa_ != pb


def test_isocanonical_detects_structure_change(ray_session):
    from cmc_knowledge_graph_text2ttl_ray.pipelines.kg_fingerprint import (
        kg_isocanonical_fingerprint,
    )

    a = kg_isocanonical_fingerprint(_iso_ds(TTL, "s")).iloc[0]
    b = kg_isocanonical_fingerprint(
        _iso_ds(TTL.replace('"Ann"', '"Eve"'), "s")).iloc[0]
    assert a["fingerprint"] != b["fingerprint"]


def test_isocanonical_isomorphic_copies_do_not_cancel(ray_session):
    """Two isomorphic anonymous components are DISTINCT graph content —
    the multiplicity fold keeps them from XOR-canceling."""
    from cmc_knowledge_graph_text2ttl_ray.pipelines.kg_fingerprint import (
        kg_isocanonical_fingerprint,
    )

    one = kg_isocanonical_fingerprint(_iso_ds(TTL, "s1")).iloc[0]
    two = kg_isocanonical_fingerprint(
        _iso_ds(TTL, "s1", extra_scope="s2")).iloc[0]
    assert two["fingerprint"] != one["fingerprint"]
    # ground triple ex:a ex:p ex:b dedups; bnode components count twice
    assert two["n_triples"] == 13


def test_isocanonical_automorphic_branches_stable(ray_session):
    """Identical anonymous branches (an automorphism) refine to a tie —
    individualization must still yield a scope-independent result."""
    from cmc_knowledge_graph_text2ttl_ray.pipelines.kg_fingerprint import (
        kg_isocanonical_fingerprint,
    )

    ttl = """
    @prefix ex: <http://ex.org/> .
    ex:doc ex:part [ ex:kind ex:K ] .
    ex:doc ex:part [ ex:kind ex:K ] .
    """
    a = kg_isocanonical_fingerprint(_iso_ds(ttl, "x")).iloc[0]
    b = kg_isocanonical_fingerprint(_iso_ds(ttl, "y-other")).iloc[0]
    assert a["fingerprint"] == b["fingerprint"]
    assert a["n_triples"] == 4


def test_isocanonical_ground_only_matches_plain(ray_session):
    """With no bnodes the canonical fingerprint IS the plain set hash."""
    from cmc_knowledge_graph_text2ttl_ray.pipelines.kg_fingerprint import (
        kg_isocanonical_fingerprint,
    )

    ds = ray.data.from_pandas(_df(ROWS))
    assert (kg_isocanonical_fingerprint(ds).iloc[0]["fingerprint"]
            == kg_fingerprint(ray.data.from_pandas(_df(ROWS)))
            .iloc[0]["fingerprint"])


def test_isocanonical_object_kind_guards_literal_lookalikes(ray_session):
    """Round-5 advisor fix: a LITERAL whose text starts with the skolem
    prefix must not be routed into a scope group / relabeled as a bnode
    when an object_kind column is available."""
    from cmc_knowledge_graph_text2ttl_ray.pipelines.kg_fingerprint import (
        kg_isocanonical_fingerprint,
    )

    lit = "urn:graft:bnode:looks:like_a_bnode"
    rows_a = pd.DataFrame({
        "subject": ["urn:graft:bnode:sc1:b0", "urn:s"],
        "predicate": ["urn:p", "urn:q"],
        "object": ["val", lit],
        "object_kind": ["literal", "literal"],
    })
    # same graph, different skolem scope for the REAL bnode; the literal
    # lookalike is unchanged (it is content, not a label)
    rows_b = rows_a.copy()
    rows_b.loc[0, "subject"] = "urn:graft:bnode:other:b0"

    fa = kg_isocanonical_fingerprint(
        ray.data.from_pandas(rows_a), object_kind_col="object_kind").iloc[0]
    fb = kg_isocanonical_fingerprint(
        ray.data.from_pandas(rows_b), object_kind_col="object_kind").iloc[0]
    assert fa["fingerprint"] == fb["fingerprint"]
    assert fa["n_triples"] == 2

    # and changing the literal's TEXT must change the fingerprint
    rows_c = rows_a.copy()
    rows_c.loc[1, "object"] = lit + "-changed"
    fc = kg_isocanonical_fingerprint(
        ray.data.from_pandas(rows_c), object_kind_col="object_kind").iloc[0]
    assert fc["fingerprint"] != fa["fingerprint"]


def test_isocanonical_reports_tiebreak_exhaustion(ray_session):
    """High-automorphism scope exhausts the individualization budget →
    the tiebreak_exhausted column surfaces it; a small graph reports 0."""
    from cmc_knowledge_graph_text2ttl_ray.pipelines.kg_fingerprint import (
        kg_isocanonical_fingerprint,
    )

    small = kg_isocanonical_fingerprint(_iso_ds(TTL, "s")).iloc[0]
    assert small["tiebreak_exhausted"] == 0

    # 40 indistinguishable bnodes in one scope: WL refinement cannot
    # split them and the 64-leaf budget cannot individualize 40! orders
    n = 40
    bns = [f"urn:graft:bnode:auto:b{i}" for i in range(n)]
    clique = pd.DataFrame({
        "subject": ["urn:root"] * n,
        "predicate": ["urn:member"] * n,
        "object": bns,
    })
    big = kg_isocanonical_fingerprint(ray.data.from_pandas(clique)).iloc[0]
    assert big["tiebreak_exhausted"] >= 1
