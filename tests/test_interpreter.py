"""Interpreter op semantics vs the reference
(kg_text_to_ttl/text_to_turtle_processor.py; file:line cites per test)."""

import pytest

from cmc_knowledge_graph_text2ttl_ray import compile_workflow, WorkflowInterpreter
from cmc_knowledge_graph_text2ttl_ray.state.interpreter import InterpreterError
from cmc_knowledge_graph_text2ttl_ray.functions.terms import (
    XSD_BOOLEAN,
    XSD_DATE,
    XSD_FLOAT,
    XSD_INTEGER,
)

EX = "http://example.org/"

PREFIX_STEP = {"prefix": "ex", "iri": EX}


def run(plan, text="", variables=None):
    interp = WorkflowInterpreter(compile_workflow(plan))
    return interp.run(text, variables)


def triple_set(result):
    return {(t[0], t[1], t[2]) for t in result.triples}


def test_basic_triple_emission():
    res = run(
        [
            PREFIX_STEP,
            {"subject": "ex:s", "predicate": "ex:p", "object": {"text": "hello"}},
        ]
    )
    assert res.triples == [(EX + "s", EX + "p", "hello", "literal", None, None)]
    assert res.no_triples == 1


def test_implicit_literal_coercion():
    # Reference :2504-2524: int → float → bool words → string; '^' escape.
    res = run(
        [
            PREFIX_STEP,
            {"subject": "ex:s", "predicate": "ex:p", "object": "42"},
            {"subject": "ex:s", "predicate": "ex:p", "object": "4.5"},
            {"subject": "ex:s", "predicate": "ex:p", "object": "true"},
            {"subject": "ex:s", "predicate": "ex:p", "object": "^123"},
            {"subject": "ex:s", "predicate": "ex:p", "object": "plain"},
        ]
    )
    objs = [(t[2], t[5]) for t in res.triples]
    assert objs == [
        ("42", XSD_INTEGER),
        ("4.5", XSD_FLOAT),
        ("true", XSD_BOOLEAN),
        ("123", None),  # ^ forces string
        ("plain", None),
    ]


def test_typed_structured_objects():
    res = run(
        [
            PREFIX_STEP,
            {"subject": "ex:s", "predicate": "ex:p", "object": {"integer": "7"}},
            {"subject": "ex:s", "predicate": "ex:p", "object": {"float": " "}},
            {"subject": "ex:s", "predicate": "ex:p", "object": {"bool": "0.0"}},
            {"subject": "ex:s", "predicate": "ex:p", "object": {"bool": "yes"}},
            {"subject": "ex:s", "predicate": "ex:p",
             "object": {"text": "x", "date": "2024-02-29"}},
            {"subject": "ex:s", "predicate": "ex:p", "object": {"iri": "ex:other"}},
            {"subject": "ex:s", "predicate": "ex:p", "object": {"text": "hi", "lang": "en"}},
        ]
    )
    rows = [(t[2], t[3], t[4], t[5]) for t in res.triples]
    assert rows[0] == ("7", "literal", None, XSD_INTEGER)
    assert rows[1] == ("nan", "literal", None, XSD_FLOAT)
    assert rows[2] == ("false", "literal", None, XSD_BOOLEAN)
    assert rows[3] == ("true", "literal", None, XSD_BOOLEAN)
    assert rows[4] == ("2024-02-29", "literal", None, XSD_DATE)
    assert rows[5] == (EX + "other", "iri", None, None)
    assert rows[6] == ("hi", "literal", "en", None)


def test_predicates_objects_nesting_and_inverse():
    # Reference def_triple :2226-2310; inverse adds (o, i, s) :2325-2332.
    res = run(
        [
            PREFIX_STEP,
            {
                "subject": "ex:s",
                "predicates": [
                    {"predicate": "ex:p1", "object": {"iri": "ex:a"}},
                    {"predicate": "ex:p2", "inverse": "ex:p2inv",
                     "objects": [{"object": {"iri": "ex:b"}}, {"object": {"iri": "ex:c"}}]},
                ],
            },
        ]
    )
    ts = triple_set(res)
    assert (EX + "s", EX + "p1", EX + "a") in ts
    assert (EX + "s", EX + "p2", EX + "b") in ts
    assert (EX + "b", EX + "p2inv", EX + "s") in ts
    assert (EX + "c", EX + "p2inv", EX + "s") in ts
    assert res.no_triples == 5


def test_match_binds_and_stats():
    # match :1211-1263; score formula :2722.
    res = run(
        [
            PREFIX_STEP,
            {
                "match": r"Material:\s*(\w+)",
                "as": "mat",
                "do": [
                    {"subject": "ex:@{mat.1:iri}", "predicate": "ex:name",
                     "object": {"text": "@{mat.1}"}}
                ],
            },
        ],
        text="Material: Steel",
    )
    assert triple_set(res) == {(EX + "Steel", EX + "name", "Steel")}
    assert res.no_matches == 1
    assert res.total_match_len == len("Material: Steel")
    assert res.score == pytest.approx(1.0 - 1.0 / len("Material: Steel"))


def test_match_list_first_matching_pattern():
    res = run(
        [
            PREFIX_STEP,
            {
                "match": [r"NOPE:(\w+)", r"Key:(\w+)"],
                "as": "m",
                "do": [{"subject": "ex:s", "predicate": "ex:p", "object": {"text": "@{m.1}"}}],
            },
        ],
        text="Key:val",
    )
    assert triple_set(res) == {(EX + "s", EX + "p", "val")}


def test_match_every_count_var_and_first():
    res = run(
        [
            {"match-every": r"\bitem(\d)\b", "as": "it",
             "first": [{"set": "first_one", "to": "@{it.1}"}],
             "do": [{"set": "seen-@{it_count}", "to": "@{it.1}"}]},
        ],
        text="item1 item2 item3",
    )
    assert res.variables["first_one"] == "1"
    assert res.variables["seen-2"] == "2"
    assert res.variables["seen-3"] == "3"
    assert res.variables["it_count"] == 3
    assert res.no_matches == 3


def test_replace_mutates_current_text():
    res = run(
        [
            {"replace": r"\s+", "with": " "},
            {"match": r"^(.*)$", "as": "all",
             "do": [{"set": "out", "to": "@{all.1}"}]},
        ],
        text="a\n\nb\tc",
    )
    assert res.variables["out"] == "a b c"


def test_within_scopes_text():
    res = run(
        [
            {
                "within": r"<section>(.*?)</section>",
                "do": [
                    {"match": r"(\w+)", "as": "w", "do": [{"set": "out", "to": "@{w.1}"}]}
                ],
            },
        ],
        text="ignored <section>inner</section> ignored",
    )
    assert res.variables["out"] == "inner"


def test_within_every_iterates_groups():
    res = run(
        [
            {"within-every": r"<p>(.*?)</p>",
             "as": "p",
             "do": [{"set": "w-@{p_count}", "to": "@{p.1}"}]},
        ],
        text="<p>a</p><p>b</p>",
    )
    assert res.variables["w-1"] == "a"
    assert res.variables["w-2"] == "b"


def test_with_sets_scope():
    res = run(
        [
            {"set": "v", "to": "scoped text"},
            {"with": "@{v}", "do": [{"match": r"scoped (\w+)", "as": "m",
                                     "do": [{"set": "out", "to": "@{m.1}"}]}]},
        ]
    )
    assert res.variables["out"] == "text"


def test_sequence_of_alternatives_earliest_match_wins():
    # Reference :1534-1582: earliest start across alternatives, moving offset.
    res = run(
        [
            {
                "sequence-of": "scan",
                "alternatives": [
                    {"match": r"B(\d)", "as": "b", "do": [{"append": "order", "element": "B@{b.1}"}]},
                    {"match": r"A(\d)", "as": "a", "do": [{"append": "order", "element": "A@{a.1}"}]},
                ],
            },
        ],
        text="A1 B2 A3",
    )
    assert res.variables["order"] == ["A1", "B2", "A3"]
    assert res.variables["a_count"] == 2
    assert res.variables["b_count"] == 1


def test_sequence_of_steps_strict_order():
    # Reference :1584-1618: step k+1 only after step k; stop on first miss.
    res = run(
        [
            {
                "sequence-of": "steps",
                "steps": [
                    {"match": r"alpha", "do": [{"append": "seen", "element": "alpha"}]},
                    {"match": r"beta", "do": [{"append": "seen", "element": "beta"}]},
                    {"match": r"gamma", "do": [{"append": "seen", "element": "gamma"}]},
                ],
            },
        ],
        text="alpha ... gamma",  # beta missing → gamma never tried
    )
    assert res.variables["seen"] == ["alpha"]


def test_sequence_of_steps_order_constraint():
    res = run(
        [
            {
                "sequence-of": "steps",
                "steps": [
                    {"match": r"beta", "do": [{"append": "seen", "element": "b"}]},
                    {"match": r"alpha", "do": [{"append": "seen", "element": "a"}]},
                ],
            },
        ],
        text="alpha beta",  # alpha occurs before beta → step 2 fails
    )
    assert res.variables.get("seen") == ["b"]


def test_set_eval_and_if():
    res = run(
        [
            {"set": "n", "eval": "2 + 3"},
            {"if": "n == 5", "do": [{"set": "ok", "to": "yes"}]},
            {"if": "n == 6", "do": [{"set": "bad", "to": "yes"}]},
        ]
    )
    assert res.variables["n"] == 5
    assert res.variables["ok"] == "yes"
    assert "bad" not in res.variables


def test_ifdef_ifndef_with_match_group():
    res = run(
        [
            {"match": r"(a)(b)?", "as": "m", "do": [{"pass": None}]},
            {"ifdef": "m.1", "do": [{"set": "has1", "to": "y"}]},
            {"ifdef": "m.2", "do": [{"set": "has2", "to": "y"}]},
            {"ifndef": "m.2", "do": [{"set": "no2", "to": "y"}]},
            {"ifdef": "unsetvar", "do": [{"set": "hasvar", "to": "y"}]},
            {"set": "v", "to": "x"},
            {"ifdef": "v", "do": [{"set": "hasv", "to": "y"}]},
        ],
        text="a",
    )
    assert res.variables.get("has1") == "y"
    assert "has2" not in res.variables
    assert res.variables.get("no2") == "y"
    assert "hasvar" not in res.variables
    assert res.variables.get("hasv") == "y"


def test_any_of_returns_first_success():
    res = run(
        [
            {
                "any-of": [
                    {"match": r"zzz", "do": [{"set": "a", "to": "1"}]},
                    {"match": r"hit", "do": [{"set": "b", "to": "2"}]},
                    {"match": r"hit2", "do": [{"set": "c", "to": "3"}]},
                ]
            },
        ],
        text="hit hit2",
    )
    assert "a" not in res.variables
    assert res.variables.get("b") == "2"
    assert "c" not in res.variables  # stopped at first success


def test_for_each_and_append():
    res = run(
        [
            {"append": "xs", "element": "a"},
            {"append": "xs", "element": "b"},
            {"for-each": "xs", "as": "x",
             "do": [{"set": "got-@{x_count}", "to": "@{x}"}]},
        ]
    )
    assert res.variables["got-1"] == "a"
    assert res.variables["got-2"] == "b"


def test_procedure_call_scoping_and_return():
    # Reference :1103-1186: copy-scoped vars, return-mapping back.
    res = run(
        [
            {"procedure": "mk", "do": [
                {"set": "local", "to": "L-@{arg}"},
            ]},
            {"set": "outer", "to": "O"},
            {"call": "mk", "with": {"arg": "A"}, "return": {"local": "result"}},
        ]
    )
    assert res.variables["result"] == "L-A"
    assert "local" not in res.variables  # procedure scope did not leak
    assert res.variables["outer"] == "O"


def test_mapping_exact_regex_identity():
    # Reference :1992-2104.
    plan = [
        {"mapping": "units", "flags": "I",
         "pairs": [
             {"from": "kg", "to": "ex:Kilogram"},
             {"re": r"m(et(er|re))?s?$", "to": "ex:Meter"},
         ]},
        {"map": "KG", "apply": "units", "to": "u1"},
        {"map": "metres", "apply": "units", "to": "u2"},
        {"map": "unknown", "apply": "units", "to": "u3"},
    ]
    res = run(plan)
    assert res.variables["u1"] == "ex:Kilogram"
    assert res.variables["u2"] == "ex:Meter"
    assert res.variables["u3"] == "unknown"


def test_match_dimensions_table_walk():
    # Reference :1711-1899: row → cell walk with do-<i>-<j> specificity.
    text = (
        "<table>"
        "<tr><td>h1</td><td>h2</td></tr>"
        "<tr><td>a</td><td>b</td></tr>"
        "<tr><td>c</td><td>d</td></tr>"
        "</table>"
    )
    res = run(
        [
            {
                "match-dimensions": [r"<tr>(.*?)</tr>", r"<td>(.*?)</td>"],
                "dimensions": ["row", "col"],
                "as": "cell",
                "do": [{"set": "cell-@{row}-@{col}", "to": "@{cell.1}"}],
                "do-1-*": [{"set": "header-@{col}", "to": "@{cell.1}"}],
            },
        ],
        text=text,
    )
    assert res.variables["header-1"] == "h1"
    assert res.variables["header-2"] == "h2"
    assert res.variables["cell-2-1"] == "a"
    assert res.variables["cell-3-2"] == "d"
    assert "cell-1-1" not in res.variables  # header handled by do-1-*


def test_match_dimensions_pre_and_tag():
    # pre: prescan + tag-dimension (reference :1747-1756, :1936-1967).
    text = "<tr><td>Temp</td><td>Hum</td></tr><tr><td>20</td><td>80</td></tr>"
    res = run(
        [
            {
                "match-dimensions": [r"<tr>(.*?)</tr>", r"<td>(.*?)</td>"],
                "dimensions": ["row", "col"],
                "as": "cell",
                "pre": [{"tag-dimension": 2, "at": 2, "as": "hum"}],
                "do": [{"set": "other-@{row}-@{col}", "to": "@{cell.1}"}],
                "do-*-hum": [{"set": "hum-@{row}", "to": "@{cell.1}"}],
            },
        ],
        text=text,
    )
    assert res.variables["hum-1"] == "Hum"
    assert res.variables["hum-2"] == "80"
    assert res.variables["other-2-1"] == "20"


def test_break_stops_row():
    text = "<tr><td>a</td><td>STOP</td><td>c</td></tr>"
    res = run(
        [
            {
                "match-dimensions": [r"<tr>(.*?)</tr>", r"<td>(.*?)</td>"],
                "dimensions": ["row", "col"],
                "as": "cell",
                "pre": [{"pass": None}],
                "do": [
                    {"match": r"^STOP$", "do": [{"break": None}]},
                    {"ifndef": "stop_hit", "do": [{"set": "cell-@{col}", "to": "@{cell.1}"}]},
                ],
            },
        ],
        text=text,
    )
    assert res.variables.get("cell-1") == "a"
    # breaks at cell 2 → cell 3 never processed
    assert "cell-3" not in res.variables


def test_match_1_header_reuse():
    # Deprecated 2-D matcher (reference :1622-1707).
    text = "<tr><td>H1</td><td>H2</td></tr><tr><td>x</td><td>y</td></tr>"
    res = run(
        [
            {
                "match-1": r"<tr>(.*?)</tr>",
                "match-2": r"<td>(.*?)</td>",
                "as-1": "row",
                "as-2": "cell",
                "header-as": "hdr",
                "first": [{"pass": None}],
                "do": [{"set": "v-@{hdr.1}", "to": "@{cell.1}"}],
            },
        ],
        text=text,
    )
    assert res.variables["v-H1"] == "x"
    assert res.variables["v-H2"] == "y"


def test_clear_then_template_none():
    res = run(
        [
            {"set": "v", "to": "x"},
            {"clear": "v"},
            {"set": "out", "to": "[@{v}]"},
        ]
    )
    # Reference quirk: cleared var expands to the string "None".
    assert res.variables["out"] == "[None]"


def test_unknown_prefix_raises():
    with pytest.raises(InterpreterError):
        run([{"subject": "nope:s", "predicate": "nope:p", "object": "1"}])


def test_dump_and_echo_and_desc():
    res = run(
        [
            {"desc": "a doc string"},
            {"echo": "value=@{v}", },
            {"set": "v", "to": "V"},
            {"dump": "ct", "file": "out.txt"},
        ],
        text="current text here",
    )
    assert res.echoes == ["value=None"]
    assert res.dumps["out.txt"] == "current text here"


def test_save_as_produces_turtle():
    res = run(
        [
            PREFIX_STEP,
            {"subject": "ex:s", "predicate": "ex:p", "object": {"text": "v"}},
            {"save-as": "out"},
        ]
    )
    assert "out" in res.saved
    assert "@prefix ex: <http://example.org/> ." in res.saved["out"]
    assert 'ex:p "v"' in res.saved["out"]
