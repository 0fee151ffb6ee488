"""Label-propagation communities: planted structure, determinism,
block invariance."""

import itertools

import pandas as pd
import pytest
import ray.data

from cmc_knowledge_graph_text2ttl_ray.pipelines.graph_algos import (
    label_propagation,
)


def _clique_edges():
    c1 = list(itertools.combinations(range(6), 2))
    c2 = list(itertools.combinations(range(10, 16), 2))
    return c1 + c2 + [(0, 10)]  # one weak bridge


@pytest.fixture(scope="module")
def clique_ds(ray_session):
    return ray.data.from_pandas(
        pd.DataFrame(_clique_edges(), columns=["a", "b"])).repartition(4)


def test_planted_cliques_separate(clique_ds):
    out = label_propagation(clique_ds, iters=5).to_pandas()
    comm = dict(zip(out["node"], out["label"]))
    assert len({comm[i] for i in range(6)}) == 1
    assert len({comm[i] for i in range(10, 16)}) == 1
    assert comm[0] != comm[10]


def test_deterministic_and_block_invariant(ray_session):
    edges = pd.DataFrame(_clique_edges(), columns=["a", "b"])
    runs = []
    for parts in (1, 3, 8):
        ds = ray.data.from_pandas(edges).repartition(parts)
        runs.append(label_propagation(ds, iters=5).to_pandas()
                    .sort_values("node").reset_index(drop=True))
    pd.testing.assert_frame_equal(runs[0], runs[1])
    pd.testing.assert_frame_equal(runs[0], runs[2])


def test_multi_edge_weight_wins(ray_session):
    # node 2 ties to communities {0,1} and {3,4} by edge count, but the
    # duplicated (2,3) edge carries double weight → 2 joins the right side
    edges = pd.DataFrame(
        [(0, 1), (0, 2), (3, 4), (2, 3), (2, 3)], columns=["a", "b"])
    ds = ray.data.from_pandas(edges).repartition(2)
    out = label_propagation(ds, iters=6).to_pandas()
    comm = dict(zip(out["node"], out["label"]))
    assert comm[2] == comm[3] == comm[4]
    assert comm[0] == comm[1]


def test_driver_path_matches_distributed(ray_session):
    edges = pd.DataFrame(_clique_edges(), columns=["a", "b"])
    ds = ray.data.from_pandas(edges).repartition(3)
    a = label_propagation(ds, iters=4).to_pandas() \
        .sort_values("node").reset_index(drop=True)
    b = label_propagation(ds, iters=4, force_distributed=True).to_pandas() \
        .sort_values("node").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
