"""Property-based differential: random BGPs, distributed vs in-memory.

Random small triple graphs + random conjunctive queries (with optional
OPTIONAL/MINUS groups) evaluated through BOTH the distributed engine
(``bgp_query``) and the in-memory evaluator's join semantics (a direct
brute-force over binding dicts, same as ``tests/test_kg_query.py``).
Example counts are small because each distributed evaluation spins
several Ray jobs — breadth comes from the randomized structure, not the
example count.
"""

import itertools

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from cmc_knowledge_graph_text2ttl_ray.pipelines.kg_query import (
    _is_var,
    bgp_query,
)

NODES = ["n0", "n1", "n2", "n3", "n4"]
PREDS = ["p", "q", "r"]
VARS = ["?x", "?y", "?z"]

edges = st.tuples(st.sampled_from(NODES), st.sampled_from(PREDS),
                  st.sampled_from(NODES))
graphs = st.lists(edges, min_size=1, max_size=12, unique=True)

terms_s = st.sampled_from(VARS + NODES)
terms_p = st.sampled_from(["?p"] + PREDS)


@st.composite
def patterns(draw, n_min=1, n_max=3):
    n = draw(st.integers(n_min, n_max))
    pats = []
    for _ in range(n):
        pats.append((draw(terms_s), draw(terms_p), draw(terms_s)))
    return pats


def _connected(pats):
    if not any(_is_var(t) for p in pats for t in p):
        return False
    groups = [set(t for t in p if _is_var(t)) for p in pats]
    if any(not g for g in groups):
        return False
    merged = groups[0]
    rest = groups[1:]
    while rest:
        for i, g in enumerate(rest):
            if merged & g:
                merged |= rest.pop(i)
                break
        else:
            return False
    return True


def _brute(graph, pats, project):
    rows = []
    for combo in itertools.product(graph, repeat=len(pats)):
        env, ok = {}, True
        for (s, p, o), pat in zip(combo, pats):
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
    return set(rows)


def _ds(graph):
    import pyarrow as pa
    import ray.data

    return ray.data.from_arrow(pa.table({
        "subject": [t[0] for t in graph],
        "predicate": [t[1] for t in graph],
        "object": [t[2] for t in graph],
    })).repartition(3)


@pytest.mark.usefixtures("ray_session")
@given(graphs, patterns())
@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
def test_random_bgp_matches_bruteforce(graph, pats):
    if not _connected(pats):
        return
    proj = sorted({t for p in pats for t in p if _is_var(t)})
    got = bgp_query(_ds(graph), pats, project=proj,
                    distinct=True).to_pandas()
    got_set = (set(map(tuple, got.values)) if len(got) else set())
    want = _brute(graph, pats, proj)
    assert got_set == want


@pytest.mark.usefixtures("ray_session")
@given(graphs, patterns(n_max=2), patterns(n_min=1, n_max=1))
@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
def test_random_minus_matches_setdiff(graph, pats, minus):
    if not _connected(pats):
        return
    pvars = {t for p in pats for t in p if _is_var(t)}
    mvars = {t for p in minus for t in p if _is_var(t)}
    shared = sorted(pvars & mvars)
    if not shared or not all(
            any(_is_var(t) for t in m) for m in minus):
        return
    proj = sorted(pvars)
    got = bgp_query(_ds(graph), pats, minus_patterns=minus,
                    project=proj, distinct=True).to_pandas()
    got_set = (set(map(tuple, got.values)) if len(got) else set())
    base = _brute(graph, pats, proj)
    # MINUS semantics: drop solutions whose shared-var projection occurs
    # in the subtrahend's solutions
    mproj = sorted(mvars)
    msols = _brute(graph, minus, mproj)
    key_idx = [proj.index(v) for v in shared]
    mkey_idx = [mproj.index(v) for v in shared]
    mkeys = {tuple(s[i] for i in mkey_idx) for s in msols}
    want = {r for r in base
            if tuple(r[i] for i in key_idx) not in mkeys}
    assert got_set == want
