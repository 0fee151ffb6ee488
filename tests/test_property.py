"""Property-based tests (hypothesis) — SURVEY §5.4."""

import re

from hypothesis import given, settings, strategies as st

from cmc_knowledge_graph_text2ttl_ray.functions.terms import (
    XSD_BOOLEAN,
    XSD_FLOAT,
    XSD_INTEGER,
)
from cmc_knowledge_graph_text2ttl_ray.functions.turtle import (
    parse_turtle,
    serialize_triples,
)
from cmc_knowledge_graph_text2ttl_ray.functions.templates import expand_template

iri_text = st.from_regex(r"http://example\.org/[A-Za-z0-9_\-./#]{1,20}", fullmatch=True)
lexicals = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), min_size=0, max_size=40
)
langs = st.one_of(st.none(), st.sampled_from(["en", "de", "fr-CH"]))
dtypes = st.one_of(st.none(), st.sampled_from([XSD_INTEGER, XSD_FLOAT, XSD_BOOLEAN]))


@st.composite
def triples(draw):
    s = draw(iri_text)
    p = draw(iri_text)
    if draw(st.booleans()):
        return (s, p, draw(iri_text), "iri", None, None)
    lang = draw(langs)
    dt = None if lang else draw(dtypes)
    return (s, p, draw(lexicals), "literal", lang, dt)


@given(st.lists(triples(), min_size=0, max_size=30))
@settings(max_examples=150, deadline=None)
def test_turtle_roundtrip_random_triples(ts):
    """serialize → parse recovers exactly the deduped triple set, for any
    lexical content (quotes, newlines, unicode)."""
    ttl = serialize_triples(ts, {"ex": "http://example.org/"})
    parsed, _ = parse_turtle(ttl)
    assert set(parsed) == set(tuple(t) for t in ts)


@given(st.lists(triples(), min_size=1, max_size=30), st.randoms())
@settings(max_examples=50, deadline=None)
def test_serialization_order_invariant(ts, rnd):
    shuffled = list(ts)
    rnd.shuffle(shuffled)
    assert serialize_triples(ts, {}) == serialize_triples(shuffled, {})


@given(st.text(max_size=60))
@settings(max_examples=200, deadline=None)
def test_template_expansion_terminates_on_arbitrary_text(text):
    """Expansion either returns a string or raises TemplateError — never
    loops; templates without resolvable refs are handled."""
    from cmc_knowledge_graph_text2ttl_ray.functions.templates import TemplateError

    try:
        out = expand_template(text, {"a": "1"}, {})
    except TemplateError:
        return
    assert isinstance(out, str)
    # no unexpanded simple references left
    assert not re.search(r"@\{[a-zA-Z0-9_-]+\}", out)


@given(st.text(alphabet="abc0123456789. ", max_size=20))
@settings(max_examples=200, deadline=None)
def test_implicit_coercion_matches_python_semantics(s):
    """The implicit literal coercion (int → float → bool → str) agrees with
    Python's int()/float() acceptance on arbitrary numeric-ish strings."""
    from cmc_knowledge_graph_text2ttl_ray import compile_workflow, WorkflowInterpreter

    plan = compile_workflow(
        [{"prefix": "ex", "iri": "http://e/"},
         {"subject": "ex:s", "predicate": "ex:p", "object": s or "x"}]
    )
    res = WorkflowInterpreter(plan).run("")
    (_, _, lex, kind, lang, dt) = res.triples[0]
    val = s or "x"
    try:
        int(val)
        assert dt == XSD_INTEGER
        return
    except ValueError:
        pass
    try:
        float(val)
        assert dt == XSD_FLOAT
        return
    except ValueError:
        pass
    assert dt is None and kind == "literal"


def test_dedup_independent_of_partitioning(ray_session):
    import pandas as pd
    import ray.data

    from cmc_knowledge_graph_text2ttl_ray.stages.dedup_triples import dedup_triples

    rows = []
    for i in range(500):
        rows.append(
            {"doc_url": f"u{i % 7}", "subject": f"s{i % 40}", "predicate": "p",
             "object": f"o{i % 25}", "object_kind": "literal",
             "object_lang": None, "object_datatype": None}
        )
    outs = []
    for parts in (2, 13):
        ds = ray.data.from_pandas(pd.DataFrame(rows)).repartition(parts)
        out = dedup_triples(ds, num_partitions=5).to_pandas()
        outs.append(
            out.sort_values(list(out.columns)).reset_index(drop=True)
        )
    pd.testing.assert_frame_equal(outs[0], outs[1])
    assert len(outs[0]) == len({(r["subject"], r["object"]) for r in rows})


# ---- SPARQL evaluator differential test ------------------------------------
# Brute-force reference semantics implemented independently (enumerate all
# bindings by product over triples), compared against the indexed evaluator
# on randomized small graphs. Covers BGP joins, OPTIONAL, UNION, MINUS and
# numeric FILTER on the same inputs.

def _brute_bgp(triples, patterns, binding):
    """All extensions of `binding` satisfying the triple patterns."""
    if not patterns:
        return [dict(binding)]
    (sk, sv), (pk, pv), (ok, ov) = patterns[0]
    out = []
    for (s, p, o, *_rest) in triples:
        b = dict(binding)
        ok_row = True
        for kind, val, got in ((sk, sv, s), (pk, pv, p), (ok, ov, o)):
            if kind == "const":
                if val != got:
                    ok_row = False
                    break
            else:
                if val in b and b[val] != got:
                    ok_row = False
                    break
                b[val] = got
        if ok_row:
            out.extend(_brute_bgp(triples, patterns[1:], b))
    return out


@given(st.data())
@settings(max_examples=60, deadline=None)
def test_sparql_bgp_join_matches_bruteforce(data):
    from cmc_knowledge_graph_text2ttl_ray.state.graph_index import GraphIndex

    ents = [f"http://e/{c}" for c in "abcd"]
    preds = [f"http://e/p{i}" for i in range(2)]
    triples = data.draw(st.lists(
        st.tuples(st.sampled_from(ents), st.sampled_from(preds),
                  st.sampled_from(ents)),
        min_size=0, max_size=10, unique=True))
    rows6 = [(s, p, o, "iri", None, None) for s, p, o in triples]
    g = GraphIndex(rows6, prefixes={"e": "http://e/"})

    # random 2-pattern query over variables x, y, z
    terms = ["?x", "?y", "?z", "e:a", "e:b", "e:p0", "e:p1"]
    def draw_pattern():
        return (data.draw(st.sampled_from(terms[:5])),
                data.draw(st.sampled_from(["?y", "e:p0", "e:p1"])),
                data.draw(st.sampled_from(terms[:5])))
    pats = [draw_pattern() for _ in range(2)]
    q = "SELECT * WHERE { " + " . ".join(" ".join(p) for p in pats) + " }"

    def to_term(t):
        if t.startswith("?"):
            return ("var", t[1:])
        local = t.split(":", 1)[1]
        return ("const", f"http://e/{local}")

    expected = _brute_bgp(rows6, [tuple(to_term(x) for x in p) for p in pats], {})
    expected_keys = sorted(tuple(sorted(r.items())) for r in expected)
    got = g.query(q)
    got_keys = sorted(tuple(sorted(r.items())) for r in got)
    assert got_keys == expected_keys


@given(st.data())
@settings(max_examples=40, deadline=None)
def test_sparql_optional_union_minus_match_bruteforce(data):
    from cmc_knowledge_graph_text2ttl_ray.state.graph_index import GraphIndex

    ents = [f"http://e/{c}" for c in "abc"]
    mk = lambda: data.draw(st.lists(
        st.tuples(st.sampled_from(ents), st.just("http://e/p"),
                  st.sampled_from(ents)), min_size=0, max_size=6, unique=True))
    base = mk()
    rows6 = [(s, p, o, "iri", None, None) for s, p, o in base]
    g = GraphIndex(rows6, prefixes={"e": "http://e/"})
    P = [(("var", "x"), ("const", "http://e/p"), ("var", "y"))]
    Q = [(("var", "y"), ("const", "http://e/p"), ("var", "z"))]
    main = _brute_bgp(rows6, P, {})

    # OPTIONAL
    got = g.query("SELECT * WHERE { ?x e:p ?y . OPTIONAL { ?y e:p ?z } }")
    exp = []
    for b in main:
        sols = _brute_bgp(rows6, Q, b)
        exp.extend(sols if sols else [b])
    assert sorted(tuple(sorted(r.items())) for r in got) == \
           sorted(tuple(sorted(r.items())) for r in exp)

    # UNION
    got = g.query("SELECT * WHERE { { ?x e:p ?y } UNION { ?y e:p ?z } }")
    exp = _brute_bgp(rows6, P, {}) + _brute_bgp(rows6, Q, {})
    assert sorted(tuple(sorted(r.items())) for r in got) == \
           sorted(tuple(sorted(r.items())) for r in exp)

    # MINUS
    got = g.query("SELECT * WHERE { ?x e:p ?y . MINUS { ?y e:p ?z } }")
    minus_sols = _brute_bgp(rows6, Q, {})
    def compat(b, s):
        shared = b.keys() & s.keys()
        return bool(shared) and all(b[k] == s[k] for k in shared)
    exp = [b for b in main if not any(compat(b, s) for s in minus_sols)]
    assert sorted(tuple(sorted(r.items())) for r in got) == \
           sorted(tuple(sorted(r.items())) for r in exp)


@given(st.data())
@settings(max_examples=60, deadline=None)
def test_sparql_plus_closure_matches_bruteforce(data):
    """p+ transitive closure vs an independent reachability computation on
    random small digraphs, from every direction (s bound, o bound, neither)."""
    from cmc_knowledge_graph_text2ttl_ray.state.graph_index import GraphIndex

    nodes = [f"http://e/{c}" for c in "abcde"]
    edges = data.draw(st.lists(
        st.tuples(st.sampled_from(nodes), st.sampled_from(nodes)),
        min_size=0, max_size=10, unique=True))
    g = GraphIndex()
    for s, o in edges:
        g.add((s, "http://e/p", o, "iri", None, None))
    # brute reachability via repeated relational join
    reach = set(edges)
    while True:
        nxt = reach | {(a, d) for (a, b) in reach for (c, d) in edges if b == c}
        if nxt == reach:
            break
        reach = nxt
    got = {(r["x"], r["y"]) for r in
           g.query("SELECT ?x ?y WHERE { ?x <http://e/p>+ ?y }")}
    assert got == reach
    if nodes:
        a = data.draw(st.sampled_from(nodes))
        got_fwd = {r["y"] for r in
                   g.query(f"SELECT ?y WHERE {{ <{a}> <http://e/p>+ ?y }}")}
        assert got_fwd == {y for (x, y) in reach if x == a}
        got_bwd = {r["x"] for r in
                   g.query(f"SELECT ?x WHERE {{ ?x <http://e/p>+ <{a}> }}")}
        assert got_bwd == {x for (x, y) in reach if y == a}


@given(st.data())
@settings(max_examples=60, deadline=None)
def test_sparql_groupby_count_sum_matches_python(data):
    """GROUP BY + COUNT/SUM/MIN/MAX vs direct dict aggregation."""
    from collections import defaultdict

    from cmc_knowledge_graph_text2ttl_ray.state.graph_index import GraphIndex

    subs = [f"http://e/s{i}" for i in range(4)]
    cats = ["red", "blue"]
    rows = data.draw(st.lists(
        st.tuples(st.sampled_from(subs), st.sampled_from(cats),
                  st.integers(min_value=0, max_value=99)),
        min_size=0, max_size=12))
    g = GraphIndex()
    for i, (s, c, v) in enumerate(rows):
        item = f"http://e/item{i}"
        g.add((item, "http://e/of", s, "iri", None, None))
        g.add((item, "http://e/cat", c, "literal", None, None))
        g.add((item, "http://e/val", str(v), "literal", None, None))
    agg = defaultdict(list)
    for (s, c, v) in rows:
        agg[c].append(v)
    exp = [
        {"c": c, "n": str(len(vs)), "tot": str(sum(vs)),
         "lo": str(min(vs)), "hi": str(max(vs))}
        for c, vs in agg.items()
    ]
    got = g.query(
        "SELECT ?c (COUNT(*) AS ?n) (SUM(?v) AS ?tot) "
        "(MIN(?v) AS ?lo) (MAX(?v) AS ?hi) WHERE { "
        "?i <http://e/cat> ?c . ?i <http://e/val> ?v } GROUP BY ?c")
    assert sorted(got, key=lambda r: r["c"]) == sorted(exp, key=lambda r: r["c"])


@given(st.data())
@settings(max_examples=60, deadline=None)
def test_sparql_filter_arithmetic_matches_python(data):
    """FILTER arithmetic/IN agree with direct Python evaluation."""
    from cmc_knowledge_graph_text2ttl_ray.state.graph_index import GraphIndex

    vals = data.draw(st.lists(st.integers(min_value=-50, max_value=50),
                              min_size=0, max_size=10, unique=True))
    g = GraphIndex()
    for i, v in enumerate(vals):
        g.add((f"http://e/s{i}", "http://e/v", str(v), "literal", None, None))
    k = data.draw(st.integers(min_value=-5, max_value=5))
    got = {r["x"] for r in g.query(
        f"SELECT ?x WHERE {{ ?s <http://e/v> ?x . FILTER(?x * 2 + 1 > {k} * 3) }}")}
    assert got == {str(v) for v in vals if v * 2 + 1 > k * 3}
    got_in = {r["x"] for r in g.query(
        "SELECT ?x WHERE { ?s <http://e/v> ?x . FILTER(?x IN (1, 2, 3)) }")}
    assert got_in == {str(v) for v in vals if v in (1, 2, 3)}
