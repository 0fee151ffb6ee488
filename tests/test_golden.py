"""Golden-corpus P/R gate.

``golden_triples.json`` is the frozen expected output (per-document triples,
chosen workflow, stats) of the flagship workflows on synthetic pages 0-49,
generated from the verified round-1 semantics (3 workflows incl. the
financial-report specialist). Any interpreter / workflow /
extraction change that shifts emitted triples fails here — this is the
engine's standing triple-P/R anchor (target P/R ≥ 0.95; the gate demands
exact equality, P = R = 1.0, on the golden corpus).
"""

import json
import os

import pytest

GOLDEN = os.path.join(os.path.dirname(__file__), "golden_triples.json")


@pytest.fixture(scope="module")
def golden():
    with open(GOLDEN) as fh:
        return json.load(fh)


def _current_results():
    from cmc_knowledge_graph_text2ttl_ray.pipelines.kg import default_graphs, default_plans
    from cmc_knowledge_graph_text2ttl_ray.sources.pages import synthesize_page
    from cmc_knowledge_graph_text2ttl_ray.stages.triples import clean_doc_name
    from cmc_knowledge_graph_text2ttl_ray.state.graph_index import GraphIndex
    from cmc_knowledge_graph_text2ttl_ray.state.interpreter import WorkflowInterpreter

    plans = default_plans()
    graphs = {k: GraphIndex.from_turtle(v) for k, v in default_graphs().items()}
    interps = [(p.name, WorkflowInterpreter(p, graphs=graphs)) for p in plans]
    out = {}
    for i in range(50):
        page = synthesize_page(i)
        if not page["text"]:
            out[page["url"]] = (None, None, set())
            continue
        doc = clean_doc_name(page["url"].rsplit("/", 1)[-1])
        best = None
        for name, interp in interps:
            res = interp.run(
                page["text"],
                variables={"doc": doc, "docname": page["url"], "docpathname": page["url"]},
            )
            key = (res.no_triples, res.no_matches, res.total_match_len)
            if best is None or key > best[0]:
                best = (key, name, res)
        _, wf, res = best
        out[page["url"]] = (wf, res.stats_row(), set(map(tuple, res.triples)))
    return out


def test_golden_triples_exact(golden):
    current = _current_results()
    assert set(current) == set(golden)
    missing, spurious = [], []
    for url, expected in golden.items():
        wf, stats, triples = current[url]
        exp_set = set(map(tuple, expected["triples"]))
        missing.extend((url, t) for t in exp_set - triples)
        spurious.extend((url, t) for t in triples - exp_set)
        if expected["workflow"] is not None:
            assert wf == expected["workflow"], url
            assert stats == expected["stats"], url
    n_expected = sum(len(v["triples"]) for v in golden.values())
    recall = 1 - len(missing) / max(1, n_expected)
    n_emitted = sum(len(c[2]) for c in current.values())
    precision = 1 - len(spurious) / max(1, n_emitted)
    assert not missing and not spurious, (
        f"P={precision:.4f} R={recall:.4f}; "
        f"missing={missing[:3]} spurious={spurious[:3]}"
    )
