"""Edge-case workflow semantics not covered by the per-op basics."""

import pytest

from cmc_knowledge_graph_text2ttl_ray import compile_workflow, WorkflowInterpreter
from cmc_knowledge_graph_text2ttl_ray.functions.terms import XSD_INTEGER
from cmc_knowledge_graph_text2ttl_ray.state.interpreter import InterpreterError
from cmc_knowledge_graph_text2ttl_ray.state.plan import PlanError

EX = "http://example.org/"
PFX = {"prefix": "ex", "iri": EX}


def run(plan, text="", variables=None):
    return WorkflowInterpreter(compile_workflow(plan)).run(text, variables)


def test_object_op_sequence_unknown_mapping_raises():
    """Using a mapping before defining it fails at run time, matching the
    reference's _apply_mapping error (:2079-2081)."""
    with pytest.raises(InterpreterError):
        run(
            [
                PFX,
                {"subject": "ex:s", "predicate": "ex:p", "object": [
                    {"match": r"missing-pattern", "do": [{"set": "x", "to": "no"}]},
                    {"map": "green", "apply": "colors", "to": "c"},
                ]},
            ],
            text="anything",
        )


def test_object_op_sequence_with_mapping():
    res = run(
        [
            PFX,
            {"mapping": "colors", "pairs": [{"from": "green", "to": "42"}]},
            {"subject": "ex:s", "predicate": "ex:p", "object": [
                {"match": r"nope", "do": [{"pass": None}]},
                {"map": "green", "apply": "colors"},
            ]},
        ],
        text="t",
    )
    # mapped value "42" goes through implicit coercion → integer literal
    assert res.triples[0][2] == "42"
    assert res.triples[0][5] == XSD_INTEGER


def test_object_op_sequence_all_fail_raises():
    with pytest.raises(InterpreterError):
        run(
            [
                PFX,
                {"subject": "ex:s", "predicate": "ex:p", "object": [
                    {"match": r"zzz", "do": [{"pass": None}]},
                ]},
            ],
            text="t",
        )


def test_sequence_of_within_group_scoping():
    """within-group: scopes the body to a match group (reference :1572-1580)."""
    res = run(
        [
            {
                "sequence-of": "s",
                "alternatives": [
                    {"match": r"\[(\w+)\]", "as": "m", "within-group": 1,
                     "do": [{"match": r"^(\w+)$", "as": "inner",
                             "do": [{"append": "seen", "element": "@{inner.1}"}]}]},
                ],
            },
        ],
        text="[aa] noise [bb]",
    )
    assert res.variables["seen"] == ["aa", "bb"]


def test_procedure_tilde_match_passing():
    """'~' arg form: existence check of the match named by the KEY minus its
    first char (reference :1164-1169 quirk, preserved)."""
    res = run(
        [
            {"procedure": "p", "do": [{"set": "out", "to": "@{m.1}"}]},
            {"match": r"(v\w+)", "as": "m",
             "do": [{"call": "p", "with": {"xm": "~ignored"},
                     "return": {"out": "result"}}]},
        ],
        text="value",
    )
    assert res.variables["result"] == "value"


def test_procedure_tilde_missing_match_raises():
    with pytest.raises(InterpreterError):
        run(
            [
                {"procedure": "p", "do": [{"pass": None}]},
                {"call": "p", "with": {"xnope": "~x"}},
            ]
        )


def test_exec_mutates_vars():
    res = run(
        [
            {"set": "n", "to": "5"},
            {"exec": "vars['doubled'] = int(vars['n']) * 2"},
            {"if": "doubled == 10", "do": [{"set": "ok", "to": "y"}]},
        ]
    )
    assert res.variables["doubled"] == 10
    assert res.variables["ok"] == "y"


def test_allow_exec_false_blocks_escape_hatches():
    plan = compile_workflow([{"exec": "vars['x'] = 1"}])
    with pytest.raises(InterpreterError):
        WorkflowInterpreter(plan, allow_exec=False).run("")
    plan2 = compile_workflow([{"set": "x", "eval": "1+1"}])
    with pytest.raises(InterpreterError):
        WorkflowInterpreter(plan2, allow_exec=False).run("")


def test_dynamic_var_names_emulate_maps():
    """set with @{} in the var name (reference :843-845)."""
    res = run(
        [
            {"set": "key", "to": "color"},
            {"set": "prop-@{key}", "to": "red"},
            {"set": "out", "to": "@{prop-color}"},
        ]
    )
    assert res.variables["out"] == "red"


def test_for_each_empty_and_scalar_autowrap():
    res = run(
        [
            {"for-each": "nothing", "as": "x", "do": [{"set": "ran", "to": "y"}]},
            {"set": "scalar", "to": "solo"},
            {"append": "scalar", "element": "extra"},
            {"for-each": "scalar", "as": "s",
             "do": [{"set": "got-@{s_count}", "to": "@{s}"}]},
        ]
    )
    assert "ran" not in res.variables
    assert res.variables["got-1"] == "solo"
    assert res.variables["got-2"] == "extra"


def test_compile_time_validation_errors():
    with pytest.raises(PlanError):
        compile_workflow([{"set": "x"}])  # neither to: nor eval:
    with pytest.raises(PlanError):
        compile_workflow([{"set": "x", "to": "1", "eval": "2"}])  # both
    with pytest.raises(PlanError):
        compile_workflow([{"sequence-of": "s"}])  # no alternatives/steps
    with pytest.raises(PlanError):
        compile_workflow(
            [{"subject": "s", "predicate": "p", "object": "1",
              "objects": [{"object": "2"}]}]
        )  # single object + object list
    with pytest.raises(PlanError):
        compile_workflow(
            [{"match-dimensions": ["a", "b"], "dimensions": ["one"],
              "do": [{"pass": 1}]}]
        )  # dimensions length mismatch
    with pytest.raises(PlanError):
        compile_workflow([{"subject": "s", "predicate": "p",
                           "object": {"integer": "1", "text": "x"}}])


def test_object_multiple_value_attrs_rejected_at_compile():
    with pytest.raises(PlanError):
        compile_workflow(
            [{"subject": "s", "predicate": "p", "object": {"iri": "a", "bool": "true"}}]
        )


def test_save_as_dict_target():
    res = run(
        [
            PFX,
            {"subject": "ex:s", "predicate": "ex:p", "object": {"text": "v"}},
            {"save-as": {"file": "out-@{doc}.ttl"}},
        ],
        variables={"doc": "d1"},
    )
    assert "out-d1.ttl" in res.saved


def test_inverse_literal_subject():
    """inverse with a literal object emits (lexical, inv, subject) —
    reference adds the literal as subject (:2325-2332)."""
    res = run(
        [
            PFX,
            {"subject": "ex:s", "predicate": "ex:p", "inverse": "ex:q",
             "object": {"text": "lit"}},
        ]
    )
    assert (EX + "s", EX + "p", "lit") in {(t[0], t[1], t[2]) for t in res.triples}
    assert ("lit", EX + "q", EX + "s") in {(t[0], t[1], t[2]) for t in res.triples}


def test_match_flags_override_dotall():
    # explicit flags replace the DOTALL default (reference _resolve_flags
    # with init; `I` alone still keeps DOTALL as init → case-insensitive)
    res = run(
        [
            {"match": r"hello (\w+)", "flags": "I", "as": "m",
             "do": [{"set": "w", "to": "@{m.1}"}]},
        ],
        text="HELLO World",
    )
    assert res.variables["w"] == "World"


def test_multiline_flag():
    res = run(
        [
            {"match-every": r"^item: (\w+)$", "flags": "M", "as": "m",
             "do": [{"append": "xs", "element": "@{m.1}"}]},
        ],
        text="item: a\nitem: b\n",
    )
    assert res.variables["xs"] == ["a", "b"]


def test_sequence_of_many_alternatives_matches_naive_scan():
    """The memoized scanner must behave exactly like the naive
    re-search-everything loop of the reference."""
    import re as _re

    text = "a1 b2 c3 a4 b5 c6 a7 zz b8 c9"
    patterns = [r"a(\d)", r"b(\d)", r"c(\d)"]

    # naive model of the reference loop
    compiled = [_re.compile(p, _re.DOTALL) for p in patterns]
    expected, start = [], 0
    while True:
        best = None
        for i, reo in enumerate(compiled):
            m = reo.search(text, start)
            if m and (best is None or m.start() < best[0].start()):
                best = (m, i)
        if best is None:
            break
        expected.append(f"{'abc'[best[1]]}{best[0].group(1)}")
        start = best[0].end()

    res = run(
        [
            {
                "sequence-of": "s",
                "alternatives": [
                    {"match": p, "as": f"m{i}",
                     "do": [{"append": "seen", "element": "@{" + f"m{i}" + ".0}"}]}
                    for i, p in enumerate(patterns)
                ],
            },
        ],
        text=text,
    )
    assert res.variables["seen"] == expected


def test_sequence_of_body_text_mutation_invalidates_cache():
    """A replace: inside the body rewrites the current text; later scan
    iterations must see the new text (cache dropped)."""
    res = run(
        [
            {
                "sequence-of": "s",
                "alternatives": [
                    {"match": r"x(\d)", "as": "m",
                     "do": [
                         {"append": "seen", "element": "@{m.1}"},
                         {"replace": r"y", "with": "x"},
                     ]},
                ],
            },
        ],
        text="x1 y2 y3",
    )
    # first pass matches x1, body turns every y into x → x2, x3 now match
    assert res.variables["seen"] == ["1", "2", "3"]


def test_sequence_of_zero_width_match_terminates():
    res = run(
        [
            {"sequence-of": "s",
             "alternatives": [
                 {"match": r"\b", "do": [{"append": "n", "element": "hit"}]},
             ]},
        ],
        text="word",
    )
    # guard: the zero-width match is processed once, then the scan stops
    assert res.variables.get("n") == ["hit"]


def test_sequence_of_lookahead_zero_width_runs_once():
    """Regression (code review): a zero-width lookahead at q > start must run
    its body exactly once, not twice."""
    res = run(
        [
            {"sequence-of": "s",
             "alternatives": [
                 {"match": r"(?=X)", "do": [{"append": "hits", "element": "h"}]},
             ]},
        ],
        text="aaX",
    )
    assert res.variables.get("hits") == ["h"]
    assert res.no_matches == 1


def test_workflow_trigger_routing():
    """Engine extension: a plan with trigger: is skipped when the trigger
    cannot match, and runs when it can — identical winners either way."""
    from cmc_knowledge_graph_text2ttl_ray.pipelines.kg import default_plans
    from cmc_knowledge_graph_text2ttl_ray.stages.triples import TripleExtractor
    import pyarrow as pa

    plans = default_plans()
    fin = [p for p in plans if p.name == "financial_report"][0]
    assert fin.trigger is not None and fin.trigger.search("Revenue: 1.0 MEUR")

    ex = TripleExtractor(plans)
    batch = pa.table({
        "url": ["https://x/1", "https://x/2"],
        "text": [
            "<html><head><title>A</title></head><body><p>Acme Corp was founded in 1987.</p></body></html>",
            "<html><head><title>B</title></head><body><p>Revenue: 9.5 MEUR</p>"
            "<p>Audited on 2024-01-10</p><p>Acme Corp filed the report.</p></body></html>",
        ],
    })
    out = ex(batch).to_pylist()
    winners = {r["doc_url"]: r["workflow"] for r in out if r["rec"] == "stats"}
    assert winners["https://x/1"] == "webpage_kg"
    assert winners["https://x/2"] == "financial_report"


def test_set_eval_with_import():
    """ADVICE r1: import: attribute on set/eval imports modules before eval
    (reference assign_var :846-853)."""
    from cmc_knowledge_graph_text2ttl_ray.state.plan import compile_workflow
    from cmc_knowledge_graph_text2ttl_ray.state.interpreter import WorkflowInterpreter

    wf = compile_workflow(
        "- set: h\n  eval: \"hashlib.md5(b'x').hexdigest()\"\n"
        "  import: hashlib\n",
        name="imp",
    )
    interp = WorkflowInterpreter(wf)
    res = interp.run("dummy")
    assert res.variables["h"] == "9dd4e461268c8034f5c8564e155c67a6"


def test_save_as_file_bucket_routing(monkeypatch):
    """Reference save_as file/bucket + is_aws_env routing (:984-998)."""
    from cmc_knowledge_graph_text2ttl_ray.state.interpreter import WorkflowInterpreter
    from cmc_knowledge_graph_text2ttl_ray.state.plan import compile_workflow

    wf = compile_workflow(
        "- prefix: ex\n  iri: http://e/\n"
        "- subject: ex:s\n  predicate: ex:p\n  object:\n    text: v\n"
        "- save-as:\n    file: out.ttl\n    bucket: s3://b/out.ttl\n",
        name="sv",
    )
    monkeypatch.delenv("AWS_REGION", raising=False)
    monkeypatch.delenv("CONTAINER_ID", raising=False)
    res = WorkflowInterpreter(wf).run("dummy")
    assert res.saved_kind == {"out.ttl": "file"}
    assert "ex:s" in res.saved["out.ttl"] or "http://e/s" in res.saved["out.ttl"]

    monkeypatch.setenv("AWS_REGION", "eu-central-1")
    res = WorkflowInterpreter(wf).run("dummy")
    assert res.saved_kind == {"s3://b/out.ttl": "bucket"}
