"""TransE KG embeddings: planted-structure learning, determinism,
block-layout invariance, vocabulary encoding."""

import numpy as np
import pandas as pd
import pytest

import ray
import ray.data

from cmc_knowledge_graph_text2ttl_ray.pipelines.kg_embed import (
    encode_triple_ids,
    link_rank,
    transe_score,
    transe_train,
)


def _planted_df():
    rows = []
    for c, hub in ((0, "urn:hubA"), (1, "urn:hubB")):
        for i in range(20):
            rows.append((f"urn:e{c}_{i}", "urn:in", hub, "iri", None, None))
    for i in range(19):
        rows.append((f"urn:e0_{i}", "urn:next", f"urn:e0_{i+1}",
                     "iri", None, None))
    rows.append(("urn:e0_0", "urn:label", "a literal", "literal", None, None))
    return pd.DataFrame(rows, columns=[
        "subject", "predicate", "object", "object_kind",
        "object_lang", "object_datatype"])


@pytest.fixture(scope="module")
def trained(ray_session):
    ds = ray.data.from_pandas(_planted_df()).repartition(3)
    ids, ents, rels = encode_triple_ids(ds)
    E, R, losses = transe_train(ids, len(ents), len(rels),
                                dim=16, epochs=15, lr=0.5, seed=7)
    return ids, ents, rels, E, R, losses


def test_encode_drops_literals_and_is_deterministic(ray_session):
    df = _planted_df()
    a = encode_triple_ids(ray.data.from_pandas(df).repartition(2))
    b = encode_triple_ids(ray.data.from_pandas(df).repartition(5))
    assert a[1] == b[1] and a[2] == b[2]          # same sorted vocab
    assert a[0].count() == len(df) - 1            # literal row dropped
    pd.testing.assert_frame_equal(
        a[0].to_pandas().sort_values(["s", "p", "o"], ignore_index=True),
        b[0].to_pandas().sort_values(["s", "p", "o"], ignore_index=True))


def test_loss_decreases_and_structure_learned(trained):
    ids, ents, rels, E, R, losses = trained
    assert losses[-1] < 0.5 * losses[0]
    ranks = link_rank(E, R, ids.to_pandas())
    in_id = rels.index("urn:in")
    row = ranks[ranks["p"] == in_id].iloc[0]
    # true hub ranks near the top of 42 entities for its 40 members
    assert row["mean_rank"] < 5
    assert row["hits_at_10"] == 1.0


def test_scores_separate_true_from_corrupt(trained):
    ids, ents, rels, E, R, _ = trained
    df = ids.to_pandas()
    true = transe_score(E, R, df["s"], df["p"], df["o"])
    rng = np.random.default_rng(3)
    corrupt = transe_score(E, R, df["s"], df["p"],
                           rng.integers(0, len(ents), len(df)))
    assert true.mean() < corrupt.mean()


def test_same_seed_reproduces_and_layout_invariant(ray_session):
    df = _planted_df()

    def run(blocks):
        ids, ents, rels = encode_triple_ids(
            ray.data.from_pandas(df).repartition(blocks))
        return transe_train(ids, len(ents), len(rels),
                            dim=8, epochs=4, lr=0.5, seed=11)

    E1, R1, l1 = run(2)
    E2, R2, l2 = run(6)
    # gradient math is layout-independent up to float-sum reordering
    assert np.allclose(l1, l2, rtol=1e-4)
    assert np.allclose(E1, E2, atol=1e-4)
    assert np.allclose(R1, R2, atol=1e-4)


def test_query_entry_runs(ray_session):
    import __ray_entry__

    out = __ray_entry__.queries()["kg_transe_link_rank"](
        "/root/testdata/sf0.001")
    df = out if isinstance(out, pd.DataFrame) else out.to_pandas()
    assert {"relation", "mean_rank", "hits_at_10", "n"} <= set(df.columns)
    assert len(df) >= 1
    # in_nation is a many-to-one clustering relation: far better than chance
    inn = df[df["relation"] == "in_nation"].iloc[0]
    assert inn["mean_rank"] < inn["n_entities"] / 20


# --------------------------------------------------------------------------
# entity-sharded parameter path (round-5)
# --------------------------------------------------------------------------

def test_sharded_matches_broadcast_with_same_init(ray_session):
    """Equivalence vs the broadcast path when both start from the same
    init: identical negatives/loss math, gradients buffered per epoch →
    results match to float32 rounding."""
    from cmc_knowledge_graph_text2ttl_ray.pipelines.kg_embed import (
        _init_matrix,
        transe_gather_entities,
        transe_train_sharded,
    )

    ds = ray.data.from_pandas(_planted_df()).repartition(3)
    ids, ents, rels = encode_triple_ids(ds)
    dim, epochs = 16, 8
    E_b, R_b, loss_b = transe_train(ids, len(ents), len(rels),
                                    dim=dim, epochs=epochs, lr=0.5, seed=7)
    init_E = _init_matrix(len(ents), dim, 7, "ent")
    shards, R_s, loss_s = transe_train_sharded(
        ids, len(ents), len(rels), dim=dim, epochs=epochs, lr=0.5,
        seed=7, num_shards=3, init_E=init_E)
    E_s = transe_gather_entities(shards, len(ents), dim)
    np.testing.assert_allclose(loss_s, loss_b, rtol=1e-4)
    np.testing.assert_allclose(E_s, E_b, rtol=1e-3, atol=1e-5)
    np.testing.assert_allclose(R_s, R_b, rtol=1e-3, atol=1e-5)


def test_sharded_default_init_learns_structure(ray_session):
    """The counter-based per-row init (the no-full-matrix scale path)
    trains to the same qualitative result: loss halves, hub ranks top."""
    from cmc_knowledge_graph_text2ttl_ray.pipelines.kg_embed import (
        transe_gather_entities,
        transe_train_sharded,
    )

    ds = ray.data.from_pandas(_planted_df()).repartition(3)
    ids, ents, rels = encode_triple_ids(ds)
    shards, R, losses = transe_train_sharded(
        ids, len(ents), len(rels), dim=16, epochs=15, lr=0.5,
        seed=7, num_shards=2)
    assert losses[-1] < 0.5 * losses[0]
    E = transe_gather_entities(shards, len(ents), 16)
    ranks = link_rank(E, R, ids.to_pandas())
    in_id = rels.index("urn:in")
    assert ranks[ranks["p"] == in_id].iloc[0]["mean_rank"] < 5


def test_ctr_normal_rows_shard_independent():
    """Row i of the virtual init matrix is identical whichever shard
    materializes it (pure function of (seed, tag, i))."""
    from cmc_knowledge_graph_text2ttl_ray.pipelines.kg_embed import (
        _ctr_normal_rows,
    )

    full = _ctr_normal_rows(np.arange(10), 8, 7, "ent")
    odd = _ctr_normal_rows(np.arange(1, 10, 2), 8, 7, "ent")
    np.testing.assert_array_equal(full[1::2], odd)
    # roughly standard-normal scaled by 1/sqrt(dim)
    big = _ctr_normal_rows(np.arange(2000), 8, 7, "x")
    assert abs(float(big.mean())) < 0.01
    assert 0.3 < float(big.std()) * np.sqrt(8) < 1.1


# --------------------------------------------------------------------------
# indexed link rank (round-5)
# --------------------------------------------------------------------------

def test_link_rank_indexed_agrees_with_brute(trained):
    """≥0.95 per-row rank agreement with the brute-force protocol on the
    demo KG (the verdict's acceptance bar)."""
    from cmc_knowledge_graph_text2ttl_ray.pipelines.kg_embed import (
        link_rank_indexed,
    )

    ids, ents, rels, E, R, losses = trained
    df = ids.to_pandas()
    brute = link_rank(E, R, df)
    idx = link_rank_indexed(E, R, df, n_clusters=8, nprobe=6)
    m = brute.merge(idx, on="p", suffixes=("_b", "_i"))
    assert (m["n_b"] == m["n_i"]).all()
    # per-relation mean rank within 5% and hits@10 equal
    np.testing.assert_allclose(m["mean_rank_i"], m["mean_rank_b"],
                               rtol=0.05)
    np.testing.assert_allclose(m["hits_at_10_i"], m["hits_at_10_b"],
                               atol=0.05)


def test_link_rank_indexed_full_probe_is_exact(trained):
    """nprobe == n_clusters probes everything → exactly the brute ranks."""
    from cmc_knowledge_graph_text2ttl_ray.pipelines.kg_embed import (
        link_rank_indexed,
    )

    ids, ents, rels, E, R, losses = trained
    df = ids.to_pandas()
    brute = link_rank(E, R, df).sort_values("p", ignore_index=True)
    idx = link_rank_indexed(E, R, df, n_clusters=4, nprobe=4) \
        .sort_values("p", ignore_index=True)
    pd.testing.assert_frame_equal(brute, idx, check_dtype=False)
