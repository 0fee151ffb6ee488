"""Turtle serializer/parser + GraphIndex query subset."""

import pytest

from cmc_knowledge_graph_text2ttl_ray.functions.terms import XSD_INTEGER
from cmc_knowledge_graph_text2ttl_ray.functions.turtle import (
    parse_turtle,
    serialize_triples,
)
from cmc_knowledge_graph_text2ttl_ray.state.graph_index import GraphIndex, QueryError

EX = "http://example.org/"

TRIPLES = [
    (EX + "b", EX + "p", "2", "literal", None, XSD_INTEGER),
    (EX + "a", EX + "p", EX + "b", "iri", None, None),
    (EX + "a", EX + "name", "Alice", "literal", None, None),
    (EX + "a", EX + "name", "Alicia", "literal", "es", None),
    # duplicate → must collapse
    (EX + "a", EX + "p", EX + "b", "iri", None, None),
]


def test_serialize_deterministic_and_deduped():
    ttl1 = serialize_triples(TRIPLES, {"ex": EX})
    ttl2 = serialize_triples(list(reversed(TRIPLES)), {"ex": EX})
    assert ttl1 == ttl2
    assert ttl1.count("ex:b") == 2  # once as object, once as subject
    assert '"Alicia"@es' in ttl1
    assert "@prefix ex: <http://example.org/> ." in ttl1


def test_roundtrip():
    ttl = serialize_triples(TRIPLES, {"ex": EX})
    parsed, prefixes = parse_turtle(ttl)
    assert prefixes["ex"] == EX
    assert set(parsed) == set(tuple(t) for t in TRIPLES)


def test_parse_multiline_syntax():
    ttl = """
@prefix ex: <http://example.org/> .
ex:s ex:p ex:o ;
     ex:q "lit"@en , "42"^^<http://www.w3.org/2001/XMLSchema#integer> .
ex:t a ex:Class .
"""
    triples, _ = parse_turtle(ttl)
    s = set(triples)
    assert (EX + "s", EX + "p", EX + "o", "iri", None, None) in s
    assert (EX + "s", EX + "q", "lit", "literal", "en", None) in s
    assert (EX + "s", EX + "q", "42", "literal", None, XSD_INTEGER) in s
    assert (EX + "t", "http://www.w3.org/1999/02/22-rdf-syntax-ns#type", EX + "Class", "iri", None, None) in s


def make_index():
    ttl = """
@prefix ex: <http://example.org/> .
@prefix rdfs: <http://www.w3.org/2000/01/rdf-schema#> .
ex:acme a ex:Company ; rdfs:label "Acme Corp" ; ex:country ex:us .
ex:bmi a ex:Company ; rdfs:label "BMI" ; ex:country ex:de .
ex:us rdfs:label "United States" .
ex:de rdfs:label "Germany" .
"""
    return GraphIndex.from_turtle(ttl)


def test_pattern_match():
    g = make_index()
    assert len(g.match(None, "http://www.w3.org/2000/01/rdf-schema#label", None)) == 4
    assert len(g.match(EX + "acme", None, None)) == 3


def test_query_join():
    g = make_index()
    rows = g.query(
        """
        PREFIX ex: <http://example.org/>
        PREFIX rdfs: <http://www.w3.org/2000/01/rdf-schema#>
        SELECT ?c ?cl WHERE {
            ?c a ex:Company .
            ?c ex:country ?k .
            ?k rdfs:label ?cl .
        }
        """
    )
    assert {(r["c"], r["cl"]) for r in rows} == {
        (EX + "acme", "United States"),
        (EX + "bmi", "Germany"),
    }


def test_query_literal_lookup():
    g = make_index()
    rows = g.query(
        'PREFIX rdfs: <http://www.w3.org/2000/01/rdf-schema#> '
        'SELECT ?e WHERE { ?e rdfs:label "Acme Corp" . }'
    )
    assert rows == [{"e": EX + "acme"}]


def test_query_rejects_unsupported():
    g = make_index()
    # still-unsupported constructs fail loudly instead of silently mis-answering
    with pytest.raises(QueryError):
        g.query("SELECT ?x WHERE { ?x ?p ?o . FILTER(EXISTS { ?x ?p ?o }) }")
    with pytest.raises(QueryError):
        g.query("SELECT ?x WHERE { OPTIONAL ?x }")


def test_select_op_in_workflow():
    from cmc_knowledge_graph_text2ttl_ray import WorkflowInterpreter, compile_workflow

    plan = compile_workflow(
        [
            {"prefix": "ex", "iri": EX},
            {"match": r"company (\w+ ?\w*)", "as": "c", "do": [
                {"select": "e", "from": "onto", "as": "entity",
                 "where": 'PREFIX rdfs: <http://www.w3.org/2000/01/rdf-schema#> '
                          'SELECT ?e WHERE { ?e rdfs:label "@{c.1}" . }',
                 "do": [{"subject": "ex:doc", "predicate": "ex:mentions",
                         "object": {"iri": "@{entity}"}}],
                 "else": [{"set": "missed", "to": "@{c.1}"}]},
            ]},
        ]
    )
    interp = WorkflowInterpreter(plan, graphs={"onto": make_index()})
    res = interp.run("We visited company Acme Corp yesterday.")
    assert (EX + "doc", EX + "mentions", EX + "acme", "iri", None, None) in res.triples

    res2 = interp.run("We visited company Nowhere Inc yesterday.")
    assert res2.triples == []
    assert res2.variables.get("missed") == "Nowhere Inc"


def test_query_full_iri_terms_and_decimals():
    """ADVICE r1: '.' inside <IRI> terms and decimal literals must not split
    statements."""
    from cmc_knowledge_graph_text2ttl_ray.state.graph_index import GraphIndex

    g = GraphIndex()
    g.add(("http://www.w3.org/x#s", "http://ex.org/p", "http://ex.org/o", "iri", None, None))
    g.add(("http://ex.org/o", "http://ex.org/val", "1.5", "literal", None, None))
    rows = g.query(
        "SELECT ?a ?b WHERE { ?a <http://ex.org/p> ?b . "
        "?b <http://ex.org/val> 1.5 . }"
    )
    assert rows == [{"a": "http://www.w3.org/x#s", "b": "http://ex.org/o"}]


def _ex_graph():
    from cmc_knowledge_graph_text2ttl_ray.state.graph_index import GraphIndex

    g = GraphIndex(prefixes={"ex": "http://ex/"})
    def t(s, p, o, kind="iri"):
        g.add((f"http://ex/{s}", f"http://ex/{p}", o if kind != "iri" else f"http://ex/{o}", kind, None, None))
    t("alice", "type", "Person")
    t("bob", "type", "Person")
    t("carol", "type", "Robot")
    t("alice", "age", "30", "literal")
    t("bob", "age", "45", "literal")
    t("alice", "nick", "Ali", "literal")
    t("carol", "age", "5", "literal")
    return g


def test_query_filter_numeric_and_regex():
    g = _ex_graph()
    rows = g.query(
        'SELECT ?p ?a WHERE { ?p ex:type ex:Person . ?p ex:age ?a . FILTER(?a > 35) }'
    )
    assert rows == [{"p": "http://ex/bob", "a": "45"}]
    rows = g.query(
        'SELECT ?p WHERE { ?p ex:age ?a . FILTER(regex(?p, "ali|car", "i")) }'
    )
    assert {r["p"] for r in rows} == {"http://ex/alice", "http://ex/carol"}


def test_query_optional_and_bound():
    g = _ex_graph()
    rows = g.query(
        'SELECT ?p ?n WHERE { ?p ex:type ex:Person . OPTIONAL { ?p ex:nick ?n } }'
    )
    by_p = {r["p"]: r.get("n") for r in rows}
    assert by_p == {"http://ex/alice": "Ali", "http://ex/bob": None}
    rows = g.query(
        'SELECT ?p WHERE { ?p ex:type ex:Person . OPTIONAL { ?p ex:nick ?n } '
        'FILTER(!bound(?n)) }'
    )
    assert [r["p"] for r in rows] == ["http://ex/bob"]


def test_query_union_and_minus():
    g = _ex_graph()
    rows = g.query(
        'SELECT ?p WHERE { { ?p ex:type ex:Person } UNION { ?p ex:type ex:Robot } }'
    )
    assert {r["p"] for r in rows} == {"http://ex/alice", "http://ex/bob", "http://ex/carol"}
    rows = g.query(
        'SELECT ?p WHERE { ?p ex:age ?a . MINUS { ?p ex:type ex:Robot } }'
    )
    assert {r["p"] for r in rows} == {"http://ex/alice", "http://ex/bob"}


def test_query_filter_string_functions():
    g = _ex_graph()
    rows = g.query(
        'SELECT ?p WHERE { ?p ex:type ?t . FILTER(contains(str(?p), "ali") '
        '&& strends(?t, "Person")) }'
    )
    assert [r["p"] for r in rows] == ["http://ex/alice"]
    rows = g.query(
        'SELECT ?p WHERE { ?p ex:type ex:Person . FILTER(?p = ex:alice || ?p = ex:bob) }'
    )
    assert len(rows) == 2


def test_query_nested_group_and_filter_scope():
    g = _ex_graph()
    # FILTER inside OPTIONAL applies only within the optional group
    rows = g.query(
        'SELECT ?p ?a WHERE { ?p ex:type ex:Person . '
        'OPTIONAL { ?p ex:age ?a . FILTER(?a > 40) } }'
    )
    by_p = {r["p"]: r.get("a") for r in rows}
    assert by_p == {"http://ex/alice": None, "http://ex/bob": "45"}


def test_longturtle_format_and_roundtrip():
    from cmc_knowledge_graph_text2ttl_ray.functions.turtle import (
        parse_turtle,
        serialize_longturtle,
    )

    triples = [
        ("http://e/s", "http://e/p", "v1", "literal", None, None),
        ("http://e/s", "http://e/p", "v2", "literal", None, None),
        ("http://e/s", "http://e/q", "http://e/o", "iri", None, None),
    ]
    ttl = serialize_longturtle(triples, {"ex": "http://e/"})
    assert ttl.startswith("PREFIX ex: <http://e/>")
    assert "\nex:s\n" in ttl
    # multi-object predicate: one object per line, comma-continued
    assert '    ex:p\n        "v1" ,\n        "v2" ;' in ttl
    assert "\n.\n" in ttl
    rt, prefixes = parse_turtle(ttl)
    assert prefixes == {"ex": "http://e/"}
    assert sorted(rt) == sorted(
        (s, p, o, k, lg, dt) for (s, p, o, k, lg, dt) in triples
    )


def test_query_keywords_and_braces_inside_literals():
    """Code-review r2: '{', FILTER/UNION words inside quoted literals are
    data; ?filter is a variable, not a keyword."""
    from cmc_knowledge_graph_text2ttl_ray.state.graph_index import GraphIndex

    g = GraphIndex(prefixes={"ex": "http://ex/"})
    g.add(("http://ex/s", "http://ex/p", "a { b", "literal", None, None))
    g.add(("http://ex/s", "http://ex/q", "use FILTER wisely", "literal", None, None))
    rows = g.query('SELECT ?s WHERE { ?s ex:p "a { b" }')
    assert rows == [{"s": "http://ex/s"}]
    rows = g.query('SELECT ?s WHERE { ?s ex:q "use FILTER wisely" }')
    assert rows == [{"s": "http://ex/s"}]
    rows = g.query('SELECT ?filter WHERE { ?filter ex:p "a { b" }')
    assert rows == [{"filter": "http://ex/s"}]


def test_query_distinct_order_limit():
    g = _ex_graph()
    # projection drops unselected vars; DISTINCT collapses the 3 typed rows
    rows = g.query('SELECT DISTINCT ?t WHERE { ?p ex:type ?t }')
    assert rows == [{"t": "http://ex/Person"}, {"t": "http://ex/Robot"}]
    # ORDER BY DESC + LIMIT
    rows = g.query(
        'SELECT ?p ?a WHERE { ?p ex:age ?a } ORDER BY DESC(?a) LIMIT 2'
    )
    assert [r["a"] for r in rows] == ["45", "30"]  # numeric-aware ordering
    rows = g.query('SELECT ?p WHERE { ?p ex:age ?a } ORDER BY ?p LIMIT 1 OFFSET 1')
    assert rows == [{"p": "http://ex/bob"}]


def test_query_bind_and_values():
    g = _ex_graph()
    # BIND a computed value
    rows = g.query(
        'SELECT ?p ?u WHERE { ?p ex:type ex:Person . '
        'BIND(ucase(str(?p)) AS ?u) }'
    )
    assert {r["u"] for r in rows} == {"HTTP://EX/ALICE", "HTTP://EX/BOB"}
    # VALUES single-var restricts the bindings
    rows = g.query(
        'SELECT ?p ?a WHERE { VALUES ?p { ex:alice ex:carol } . ?p ex:age ?a }'
    )
    assert {(r["p"], r["a"]) for r in rows} == {
        ("http://ex/alice", "30"), ("http://ex/carol", "5")}
    # VALUES tuple form with UNDEF wildcard
    rows = g.query(
        'SELECT ?p ?a WHERE { ?p ex:age ?a . '
        'VALUES (?p ?a) { (ex:alice "30") (ex:bob UNDEF) } }'
    )
    assert {(r["p"], r["a"]) for r in rows} == {
        ("http://ex/alice", "30"), ("http://ex/bob", "45")}


def test_query_order_by_numeric_and_unprojected():
    """Code-review r2b: ORDER BY is numeric-aware, runs before projection,
    and DESC puts unbound rows last."""
    g = _ex_graph()
    # numeric DESC: 45 > 30 > 5
    rows = g.query('SELECT ?p ?a WHERE { ?p ex:age ?a } ORDER BY DESC(?a) LIMIT 2')
    assert [r["a"] for r in rows] == ["45", "30"]
    # ORDER BY a variable NOT in the projection still works
    rows = g.query('SELECT ?p WHERE { ?p ex:age ?a } ORDER BY DESC(?a) LIMIT 1')
    assert rows == [{"p": "http://ex/bob"}]
    # DESC with unbound sort var: unbound rows trail
    rows = g.query(
        'SELECT ?p ?n WHERE { ?p ex:type ex:Person . OPTIONAL { ?p ex:nick ?n } } '
        'ORDER BY DESC(?n)'
    )
    assert [r.get("n") for r in rows] == ["Ali", None]
    # a variable literally named ?where projects correctly
    rows = g.query('SELECT ?where { ?where ex:nick "Ali" }')
    assert rows == [{"where": "http://ex/alice"}]


def test_train_val_split_edges(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from cmc_knowledge_graph_text2ttl_ray.pipelines.corpus_prep import train_val_split

    d = tmp_path / "c"
    d.mkdir()
    pq.write_table(pa.table({"doc_id": pa.array(range(50), pa.int64()),
                             "text": pa.array(["x"] * 50, pa.string())}),
                   str(d / "documents.parquet"))
    all_train = train_val_split(str(d), train_fraction=1.0).to_pandas()
    assert (all_train["split"] == "train").all()
    none_train = train_val_split(str(d), train_fraction=0.0).to_pandas()
    assert (none_train["split"] == "val").all()


def test_query_keywords_inside_iris_and_prefixed_names():
    """ADVICE r2: terms containing keyword substrings — <.../union>,
    ex:filter — are data, not group syntax."""
    from cmc_knowledge_graph_text2ttl_ray.state.graph_index import GraphIndex

    g = GraphIndex(prefixes={"ex": "http://ex/"})
    g.add(("http://ex/a", "http://schema.org/union", "http://ex/b", "iri", None, None))
    g.add(("http://ex/b", "http://ex/filter", "keep", "literal", None, None))
    rows = g.query(
        "SELECT ?x ?v WHERE { ?x <http://schema.org/union> ?y . "
        "?y ex:filter ?v . }"
    )
    assert rows == [{"x": "http://ex/a", "v": "keep"}]
    # an IRI containing OPTIONAL must also survive inside a real group mix
    g.add(("http://ex/a", "http://ex/p.OPTIONAL", "x", "literal", None, None))
    rows = g.query(
        "SELECT ?v WHERE { ?x <http://schema.org/union> ?y . "
        "OPTIONAL { ?x <http://ex/p.OPTIONAL> ?v } }"
    )
    assert rows == [{"v": "x"}]
    # FILTER comparisons with '<' must not open a phantom IRI span that
    # masks later keywords
    g2 = _ex_graph()
    rows = g2.query(
        "SELECT ?s WHERE { ?s ex:age ?a . FILTER(?a < 40) "
        "OPTIONAL { ?s ex:nick ?n } FILTER(bound(?n)) }"
    )
    assert rows == [{"s": "http://ex/alice"}]


def test_query_aggregates_and_paths():
    """Deterministic coverage for the round-3 SPARQL additions: aggregates
    with GROUP BY/HAVING, property paths, FILTER arithmetic/IN."""
    from cmc_knowledge_graph_text2ttl_ray.state.graph_index import GraphIndex

    g = _ex_graph()
    rows = g.query(
        "SELECT ?t (COUNT(*) AS ?n) (AVG(?a) AS ?avg) WHERE "
        "{ ?s ex:type ?t . ?s ex:age ?a } GROUP BY ?t ORDER BY DESC(?n)")
    assert rows[0] == {"t": "http://ex/Person", "n": "2", "avg": "37.5"}
    assert rows[1] == {"t": "http://ex/Robot", "n": "1", "avg": "5"}
    rows = g.query(
        "SELECT ?t (COUNT(*) AS ?n) WHERE { ?s ex:type ?t } "
        "GROUP BY ?t HAVING(?n > 1)")
    assert rows == [{"t": "http://ex/Person", "n": "2"}]
    # implicit single group over empty solutions
    assert g.query("SELECT (COUNT(*) AS ?n) WHERE { ?s ex:type ex:Alien }") \
        == [{"n": "0"}]
    # GROUP_CONCAT with separator + SAMPLE
    rows = g.query(
        "SELECT (GROUP_CONCAT(DISTINCT ?t ; SEPARATOR=\"|\") AS ?ts) "
        "WHERE { ?s ex:type ?t }")
    assert rows == [{"ts": "http://ex/Person|http://ex/Robot"}]

    # property paths on a chain
    g2 = GraphIndex(prefixes={"ex": "http://ex/"})
    for a, b in [("a", "b"), ("b", "c"), ("c", "d")]:
        g2.add((f"http://ex/{a}", "http://ex/knows", f"http://ex/{b}",
                "iri", None, None))
    g2.add(("http://ex/d", "http://ex/name", "Dave", "literal", None, None))
    assert [r["v"] for r in g2.query(
        "SELECT ?v WHERE { ex:a ex:knows+ ?v }")] == \
        ["http://ex/b", "http://ex/c", "http://ex/d"]
    assert [r["n"] for r in g2.query(
        "SELECT ?n WHERE { ex:a ex:knows+/ex:name ?n }")] == ["Dave"]
    assert [r["v"] for r in g2.query(
        "SELECT ?v WHERE { ex:d (^ex:knows)* ?v }")] == \
        ["http://ex/a", "http://ex/b", "http://ex/c", "http://ex/d"]
    assert [r["v"] for r in g2.query(
        "SELECT ?v WHERE { ex:a (ex:knows|ex:name)? ?v }")] == \
        ["http://ex/a", "http://ex/b"]


def test_longturtle_golden_bytes_pinned():
    """VERDICT r2 #8: byte-stability regression anchor for the longturtle
    serializer. The golden file freezes the emitted bytes for a fixed
    triple set (typed literal, lang tags, multi-object predicate, escaped
    quotes/newline).

    DEVIATION note: rdflib is not installable in this environment, so
    byte-parity vs a given rdflib release's longturtle output is
    UNVERIFIED; the pinned style differences are documented in
    serialize_longturtle's docstring (deterministic engine-wide sort
    instead of rdflib's insertion ordering). This test guarantees OUR
    bytes never drift."""
    import os

    from cmc_knowledge_graph_text2ttl_ray.functions.turtle import serialize_longturtle

    triples = [
        ("http://example.org/kg/Acme_Corp", "http://example.org/kg/foundedIn",
         "2008", "literal", None, "http://www.w3.org/2001/XMLSchema#integer"),
        ("http://example.org/kg/Acme_Corp", "http://example.org/kg/label",
         "Acme Corp", "literal", "en", None),
        ("http://example.org/kg/Acme_Corp", "http://example.org/kg/label",
         "Acme GmbH", "literal", "de", None),
        ("http://example.org/kg/Acme_Corp", "http://example.org/kg/hq",
         "http://example.org/place/Berlin", "iri", None, None),
        ("http://example.org/place/Berlin",
         "http://www.w3.org/2000/01/rdf-schema#label",
         'City "Berlin"\nGermany', "literal", None, None),
    ]
    prefixes = {"ex": "http://example.org/kg/",
                "place": "http://example.org/place/",
                "rdfs": "http://www.w3.org/2000/01/rdf-schema#"}
    golden = os.path.join(os.path.dirname(__file__), "golden_longturtle.ttl")
    with open(golden, encoding="utf8") as fh:
        assert serialize_longturtle(triples, prefixes) == fh.read()


def test_query_subquery_join_and_scope():
    """Nested { SELECT ... } evaluates in its own scope and natural-joins
    into the outer group (outer PREFIX declarations are visible inside)."""
    from cmc_knowledge_graph_text2ttl_ray.state.graph_index import GraphIndex

    g = GraphIndex()
    for s, t, a in [("alice", "Person", "30"), ("bob", "Person", "45"),
                    ("carol", "Robot", "5")]:
        g.add((f"http://ex/{s}", "http://ex/type", f"http://ex/{t}",
               "iri", None, None))
        g.add((f"http://ex/{s}", "http://ex/age", a, "literal", None, None))
    rows = g.query(
        "PREFIX ex: <http://ex/>\n"
        "SELECT ?s ?n WHERE { ?s ex:type ?t . "
        "{ SELECT ?t (COUNT(*) AS ?n) WHERE { ?x ex:type ?t } GROUP BY ?t "
        "HAVING(?n > 1) } }")
    assert rows == [{"s": "http://ex/alice", "n": "2"},
                    {"s": "http://ex/bob", "n": "2"}]
    # subquery LIMIT applies inside its own scope
    rows = g.query(
        "PREFIX ex: <http://ex/>\n"
        "SELECT ?s WHERE { ?s ex:age ?a . "
        "{ SELECT ?a WHERE { ?y ex:age ?a } ORDER BY DESC(?a) LIMIT 1 } }")
    assert rows == [{"s": "http://ex/bob"}]


def test_filter_iri_operands_and_count_distinct_star():
    """Round-3 review: <iri> operands tokenize inside FILTER (IN and =),
    comparison ops never open a phantom IRI span, and COUNT(DISTINCT *)
    counts distinct solutions."""
    from cmc_knowledge_graph_text2ttl_ray.state.graph_index import GraphIndex

    g = GraphIndex()
    for s, t in [("a", "A"), ("b", "A"), ("c", "B")]:
        g.add((f"http://e/{s}", "http://e/type", f"http://e/{t}",
               "iri", None, None))
    assert len(g.query(
        "SELECT ?s WHERE { ?s <http://e/type> ?t . "
        "FILTER(?t IN (<http://e/A>)) }")) == 2
    assert g.query(
        "SELECT ?s WHERE { ?s <http://e/type> ?t . "
        "FILTER(?t = <http://e/B>) }") == [{"s": "http://e/c"}]
    assert g.query(
        "SELECT (COUNT(DISTINCT *) AS ?n) WHERE { ?s <http://e/type> ?o }"
    ) == [{"n": "3"}]
    g.add(("http://e/a", "http://e/v", "5", "literal", None, None))
    g.add(("http://e/b", "http://e/v", "9", "literal", None, None))
    assert g.query(
        "SELECT ?s WHERE { ?s <http://e/v> ?x . FILTER(?x <= 5 && ?x > 2) }"
    ) == [{"s": "http://e/a"}]


def test_query_filter_exists_not_exists():
    """FILTER [NOT] EXISTS { pattern } is correlated with the outer binding
    and composes with plain FILTERs."""
    from cmc_knowledge_graph_text2ttl_ray.state.graph_index import GraphIndex

    g = GraphIndex(prefixes={"ex": "http://ex/"})
    for s, t in [("alice", "Person"), ("bob", "Person"), ("carol", "Robot")]:
        g.add((f"http://ex/{s}", "http://ex/type", f"http://ex/{t}",
               "iri", None, None))
    g.add(("http://ex/alice", "http://ex/nick", "Ali", "literal", None, None))
    assert g.query(
        "SELECT ?s WHERE { ?s ex:type ex:Person . "
        "FILTER EXISTS { ?s ex:nick ?n } }") == [{"s": "http://ex/alice"}]
    assert g.query(
        "SELECT ?s WHERE { ?s ex:type ?t . "
        "FILTER NOT EXISTS { ?s ex:nick ?n } FILTER(?t = ex:Person) }"
    ) == [{"s": "http://ex/bob"}]
    # nested group keywords inside EXISTS parse correctly
    assert g.query(
        "SELECT ?s WHERE { ?s ex:type ?t . FILTER EXISTS { "
        "{ ?s ex:nick ?n } UNION { ?s ex:type ex:Robot } } }"
    ) == [{"s": "http://ex/alice"}, {"s": "http://ex/carol"}]


def test_query_negated_property_sets():
    """!p / !(p1|^p2) per SPARQL 1.1 §9.1: forward part matches predicates
    outside the forward members; inverse members match reversed edges."""
    from cmc_knowledge_graph_text2ttl_ray.state.graph_index import GraphIndex

    g = GraphIndex(prefixes={"ex": "http://ex/"})
    g.add(("http://ex/a", "http://ex/knows", "http://ex/b", "iri", None, None))
    g.add(("http://ex/a", "http://ex/hates", "http://ex/c", "iri", None, None))
    g.add(("http://ex/d", "http://ex/knows", "http://ex/a", "iri", None, None))
    assert g.query("SELECT ?v WHERE { ex:a !ex:knows ?v }") == \
        [{"v": "http://ex/c"}]
    assert g.query("SELECT ?v WHERE { ex:a !(ex:knows|ex:hates) ?v }") == []
    assert g.query("SELECT ?v WHERE { ex:a !(ex:hates|^ex:hates) ?v }") == \
        [{"v": "http://ex/b"}, {"v": "http://ex/d"}]
    assert g.query("SELECT ?v WHERE { ex:a !(^ex:knows) ?v }") == []
    # composes with sequences
    assert g.query("SELECT ?v WHERE { ex:d ex:knows/!ex:hates ?v }") == \
        [{"v": "http://ex/b"}]


class TestBlankNodeSkolemization:
    def test_anonymous_property_list(self):
        from cmc_knowledge_graph_text2ttl_ray.functions.turtle import parse_turtle

        t, _ = parse_turtle(
            '@prefix ex: <http://e/> .\n'
            'ex:a ex:p [ ex:q "v" ; ex:r ex:b ] .\n')
        node = [o for s, p, o, k, _, _ in t
                if s == "http://e/a" and k == "iri"][0]
        assert node.startswith("urn:graft:bnode:anon")
        assert ({(s, p) for s, p, *_ in t if s == node}
                == {(node, "http://e/q"), (node, "http://e/r")})

    def test_labeled_bnode_document_scoped(self):
        from cmc_knowledge_graph_text2ttl_ray.functions.turtle import parse_turtle

        t, _ = parse_turtle(
            '@prefix ex: <http://e/> .\n'
            '_:n1 ex:p ex:a .\nex:d ex:q _:n1 .\n')
        assert t[0][0] == "urn:graft:bnode:n1"
        assert t[1][2] == "urn:graft:bnode:n1"  # same label → same skolem

    def test_collection_lowered_to_first_rest(self):
        from cmc_knowledge_graph_text2ttl_ray.functions.turtle import parse_turtle

        RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
        t, _ = parse_turtle(
            '@prefix ex: <http://e/> .\nex:c ex:l ( ex:x 2 ) .\n')
        firsts = [(s, o) for s, p, o, *_ in t if p == RDF + "first"]
        rests = [(s, o) for s, p, o, *_ in t if p == RDF + "rest"]
        assert len(firsts) == 2 and len(rests) == 2
        assert rests[-1][1] == RDF + "nil"
        # empty collection is rdf:nil directly
        t2, _ = parse_turtle('@prefix ex: <http://e/> .\nex:c ex:l () .\n')
        assert t2[0][2] == RDF + "nil"

    def test_bracket_subject_statement(self):
        from cmc_knowledge_graph_text2ttl_ray.functions.turtle import parse_turtle

        t, _ = parse_turtle(
            '@prefix owl: <http://www.w3.org/2002/07/owl#> .\n'
            '@prefix ex: <http://e/> .\n'
            '[ a owl:Restriction ; owl:onProperty ex:p ] .\n')
        assert len(t) == 2 and t[0][0] == t[1][0]

    def test_skolemization_deterministic(self):
        from cmc_knowledge_graph_text2ttl_ray.functions.turtle import parse_turtle

        ttl = ('@prefix ex: <http://e/> .\n'
               'ex:a ex:p [ ex:q "v" ] .\nex:b ex:p [ ex:q "w" ] .\n')
        assert parse_turtle(ttl) == parse_turtle(ttl)

    def test_bnode_graph_queryable_in_memory(self):
        # reference graphs loaded from external ontologies with bnodes
        # must stay queryable through the select: evaluator
        from cmc_knowledge_graph_text2ttl_ray.functions.turtle import parse_turtle
        from cmc_knowledge_graph_text2ttl_ray.state.graph_index import GraphIndex

        t, _ = parse_turtle(
            '@prefix owl: <http://www.w3.org/2002/07/owl#> .\n'
            '@prefix ex: <http://e/> .\n'
            'ex:c ex:sub [ a owl:Restriction ; owl:onProperty ex:p ] .\n')
        g = GraphIndex([(s, p, o) for s, p, o, k, _, _ in t])
        rows = g.query(
            "PREFIX owl: <http://www.w3.org/2002/07/owl#> "
            "PREFIX ex: <http://e/> "
            "SELECT ?r WHERE { ex:c ex:sub ?x . ?x owl:onProperty ?r }")
        assert rows == [{"r": "http://e/p"}]


class TestRdfStar:
    def test_quoted_triple_reified_and_annotated(self):
        from cmc_knowledge_graph_text2ttl_ray.functions.turtle import parse_turtle

        RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
        t, _ = parse_turtle(
            '@prefix ex: <http://e/> .\n'
            '<< ex:a ex:p ex:b >> ex:certainty "0.9" .\n')
        stmt = [s for s, p, *_ in t if p == "http://e/certainty"][0]
        assert stmt.startswith("urn:graft:stmt:")
        props = {(p, o) for s, p, o, *_ in t if s == stmt}
        assert (RDF + "subject", "http://e/a") in props
        assert (RDF + "predicate", "http://e/p") in props
        assert (RDF + "object", "http://e/b") in props
        # embedded triple itself is NOT asserted (RDF-star semantics)
        assert ("http://e/a", "http://e/p", "http://e/b") not in {
            (s, p, o) for s, p, o, *_ in t}

    def test_same_quoted_triple_same_node(self):
        from cmc_knowledge_graph_text2ttl_ray.functions.turtle import parse_turtle

        t, _ = parse_turtle(
            '@prefix ex: <http://e/> .\n'
            '<< ex:a ex:p ex:b >> ex:c "1" .\n'
            'ex:src ex:states << ex:a ex:p ex:b >> .\n')
        stmt1 = [s for s, p, *_ in t if p == "http://e/c"][0]
        stmt2 = [o for s, p, o, *_ in t if p == "http://e/states"][0]
        assert stmt1 == stmt2  # content-derived node: referential equality
        # reification block emitted once
        RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
        assert sum(1 for s, p, *_ in t
                   if s == stmt1 and p == RDF + "subject") == 1

    def test_quoted_triple_as_object_and_literal_object(self):
        from cmc_knowledge_graph_text2ttl_ray.functions.turtle import parse_turtle

        RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
        t, _ = parse_turtle(
            '@prefix ex: <http://e/> .\n'
            'ex:s ex:says << ex:a ex:score "5"^^<http://www.w3.org/2001/'
            'XMLSchema#integer> >> .\n')
        obj_rows = [(o, k, dt) for s, p, o, k, lg, dt in t
                    if p == RDF + "object"]
        assert obj_rows == [("5", "literal",
                             "http://www.w3.org/2001/XMLSchema#integer")]


def test_ask_with_ask_token_in_prefix_iri():
    """Round-5 advisor fix: the ASK→SELECT rewrite used to run over the
    RAW query, so an 'ask' token inside an earlier PREFIX IRI was
    replaced instead of the real ASK keyword."""
    from cmc_knowledge_graph_text2ttl_ray.state.graph_index import GraphIndex

    g = GraphIndex()
    g.add(("http://ex/ask#s", "http://ex/ask#p", "http://ex/ask#o",
           "iri", None, None))
    q = ("PREFIX x: <http://ex/ask#>\n"
         "ASK { x:s x:p x:o . }")
    assert g.query(q) == [{"ask": "true"}]
    q2 = ("PREFIX x: <http://ex/ask#>\n"
          "ASK { x:s x:p x:missing . }")
    assert g.query(q2) == [{"ask": "false"}]


def test_longturtle_semantic_parity_with_rdflib():
    """Pre-written rdflib byte/semantic-parity check (round-4 verdict:
    skip-gated on the import so it activates automatically if the
    environment ever gains rdflib). Byte identity is NOT expected — the
    known-deviations ledger in functions/turtle.py documents ordering /
    shorthand differences — so the assertion is graph ISOMORPHISM of the
    parsed outputs plus the ledger's item-5 multiline normalization."""
    rdflib = pytest.importorskip("rdflib")

    from cmc_knowledge_graph_text2ttl_ray.functions.turtle import (
        serialize_longturtle,
    )

    triples = [
        ("http://example.org/kg/Acme_Corp",
         "http://www.w3.org/1999/02/22-rdf-syntax-ns#type",
         "http://example.org/kg/Company", "iri", None, None),
        ("http://example.org/kg/Acme_Corp", "http://example.org/kg/label",
         "Acme Corp", "literal", "en", None),
        ("http://example.org/kg/Acme_Corp", "http://example.org/kg/size",
         "250", "literal", None,
         "http://www.w3.org/2001/XMLSchema#integer"),
        ("http://example.org/place/Berlin",
         "http://www.w3.org/2000/01/rdf-schema#label",
         'City "Berlin"\nGermany', "literal", None, None),
    ]
    prefixes = {"ex": "http://example.org/kg/",
                "place": "http://example.org/place/",
                "rdfs": "http://www.w3.org/2000/01/rdf-schema#"}
    ours = serialize_longturtle(triples, prefixes)

    g_ref = rdflib.Graph()
    for pfx, iri in prefixes.items():
        g_ref.bind(pfx, iri)
    for s, p, o, kind, lang, dt in triples:
        subj = rdflib.URIRef(s)
        pred = rdflib.URIRef(p)
        if kind == "iri":
            obj = rdflib.URIRef(o)
        else:
            obj = rdflib.Literal(
                o, lang=lang,
                datatype=rdflib.URIRef(dt) if dt else None)
        g_ref.add((subj, pred, obj))
    theirs = g_ref.serialize(format="longturtle")

    # both serializations parse back to isomorphic graphs
    g_ours = rdflib.Graph()
    g_ours.parse(data=ours, format="turtle")
    g_theirs = rdflib.Graph()
    g_theirs.parse(data=theirs, format="turtle")
    from rdflib.compare import isomorphic

    assert isomorphic(g_ours, g_theirs)
