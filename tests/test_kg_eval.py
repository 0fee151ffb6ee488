"""triple_set_pr: distributed distinct-set precision/recall/F1."""

import pandas as pd
import ray


def _ds(rows):
    return ray.data.from_pandas(pd.DataFrame(
        rows, columns=["subject", "predicate", "object"]))


def test_pr_identical_sets(ray_session):
    from cmc_knowledge_graph_text2ttl_ray.pipelines.kg_eval import (
        triple_set_pr,
    )

    rows = [("a", "p", "b"), ("b", "p", "c"), ("c", "q", "d")]
    r = triple_set_pr(_ds(rows), _ds(rows)).iloc[0]
    assert (r["n_got"], r["n_expected"], r["n_common"]) == (3, 3, 3)
    assert r["prec"] == r["rec"] == r["f1"] == 1.0


def test_pr_partial_overlap_and_duplicates(ray_session):
    from cmc_knowledge_graph_text2ttl_ray.pipelines.kg_eval import (
        triple_set_pr,
    )

    got = [("a", "p", "b"), ("a", "p", "b"),      # duplicate collapses
           ("x", "p", "y"), ("z", "p", "w")]
    exp = [("a", "p", "b"), ("x", "p", "y"), ("m", "p", "n"),
           ("q", "p", "r")]
    r = triple_set_pr(_ds(got), _ds(exp)).iloc[0]
    assert (r["n_got"], r["n_expected"], r["n_common"]) == (3, 4, 2)
    assert abs(r["prec"] - 2 / 3) < 1e-6
    assert r["rec"] == 0.5
    f1 = 2 * (2 / 3) * 0.5 / ((2 / 3) + 0.5)
    assert abs(r["f1"] - f1) < 1e-6


def test_pr_disjoint_and_empty(ray_session):
    from cmc_knowledge_graph_text2ttl_ray.pipelines.kg_eval import (
        triple_set_pr,
    )

    a = [("a", "p", "b")]
    b = [("x", "p", "y")]
    r = triple_set_pr(_ds(a), _ds(b)).iloc[0]
    assert r["n_common"] == 0 and r["prec"] == 0.0 and r["f1"] == 0.0

    empty = _ds(a).filter(expr="subject == 'nope'")
    r2 = triple_set_pr(empty, _ds(b)).iloc[0]
    assert (r2["n_got"], r2["prec"], r2["rec"], r2["f1"]) == (0, 0.0, 0.0,
                                                              0.0)


def test_pr_block_layout_invariant(ray_session):
    from cmc_knowledge_graph_text2ttl_ray.pipelines.kg_eval import (
        triple_set_pr,
    )

    got = [(f"s{i}", "p", f"o{i}") for i in range(50)]
    exp = [(f"s{i}", "p", f"o{i}") for i in range(25, 70)]
    a = triple_set_pr(_ds(got), _ds(exp)).iloc[0]
    b = triple_set_pr(_ds(got).repartition(7),
                      _ds(exp).repartition(3)).iloc[0]
    assert dict(a) == dict(b)
    assert (a["n_got"], a["n_expected"], a["n_common"]) == (50, 45, 25)


def test_diff_sides_and_dedup(ray_session):
    from cmc_knowledge_graph_text2ttl_ray.pipelines.kg_eval import (
        triple_set_diff,
    )

    got = [("a", "p", "b"), ("a", "p", "b"),       # dup collapses
           ("x", "p", "y"), ("new", "p", "n")]
    exp = [("a", "p", "b"), ("x", "p", "y"), ("old", "p", "o")]
    out = triple_set_diff(_ds(got), _ds(exp)).to_pandas()
    rows = {(r["side"], r["subject"], r["predicate"], r["object"])
            for _, r in out.iterrows()}
    assert rows == {("added", "new", "p", "n"),
                    ("removed", "old", "p", "o")}
    assert len(out) == 2                           # no duplicate rows


def test_diff_join_path_equivalent(ray_session):
    from cmc_knowledge_graph_text2ttl_ray.pipelines.kg_eval import (
        triple_set_diff,
    )

    got = [(f"s{i}", "p", f"o{i}") for i in range(40)]
    exp = [(f"s{i}", "p", f"o{i}") for i in range(20, 55)]
    a = triple_set_diff(_ds(got).repartition(5), _ds(exp)).to_pandas()
    b = triple_set_diff(_ds(got).repartition(5), _ds(exp),
                        broadcast_threshold=0).to_pandas()
    key = ["side", "subject", "predicate", "object"]
    a = a.sort_values(key).reset_index(drop=True)
    b = b.sort_values(key).reset_index(drop=True)
    assert a.equals(b)
    assert (a["side"] == "added").sum() == 20      # s0..s19
    assert (a["side"] == "removed").sum() == 15    # s40..s54


def test_diff_identical_sets_empty(ray_session):
    from cmc_knowledge_graph_text2ttl_ray.pipelines.kg_eval import (
        triple_set_diff,
    )

    rows = [("a", "p", "b"), ("c", "p", "d")]
    out = triple_set_diff(_ds(rows), _ds(rows)).to_pandas()
    assert len(out) == 0
