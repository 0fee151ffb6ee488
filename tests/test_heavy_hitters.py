"""Misra-Gries heavy hitters: guarantee containment + error bounds."""

import numpy as np
import pandas as pd
import pytest
import ray.data

from cmc_knowledge_graph_text2ttl_ray.pipelines.sketches import (
    mg_heavy_hitters,
)


@pytest.fixture(scope="module")
def skewed_ds(ray_session):
    # Zipf-ish stream: item i appears 2000 // (i + 1) times
    rng = np.random.default_rng(11)
    vals = np.concatenate([
        np.repeat(f"item{i}", 2000 // (i + 1)) for i in range(200)
    ])
    rng.shuffle(vals)
    return ray.data.from_pandas(pd.DataFrame({"v": vals})) \
        .repartition(16), vals


def test_heavy_hitters_guarantee(skewed_ds):
    ds, vals = skewed_ds
    k = 32
    out = mg_heavy_hitters(ds, "v", k=k)
    n = len(vals)
    true = pd.Series(vals).value_counts()
    # every item with true freq > n/(k+1) must be present
    mandatory = set(true[true > n / (k + 1)].index)
    assert mandatory <= set(out["item"])
    # bounds bracket the truth for every reported item
    got = out.set_index("item")
    for item in out["item"]:
        t = int(true.get(item, 0))
        assert got.loc[item, "min_count"] <= t <= got.loc[item, "max_count"]
    # error window respects the theoretical n/(k+1) bound (the mergeable
    # Misra-Gries guarantee: per-block decrements + final-trim decrement
    # together stay within one stream's worth of error)
    assert ((got["max_count"] - got["min_count"]) <= n / (k + 1)).all()
    # top item is exactly the most frequent
    assert out.iloc[0]["item"] == "item0"


def test_block_structure_invariant_guarantee(skewed_ds):
    """The same mandatory set must be present at any block structure."""
    ds, vals = skewed_ds
    n = len(vals)
    k = 32
    true = pd.Series(vals).value_counts()
    mandatory = set(true[true > n / (k + 1)].index)
    for parts in (1, 4, 64):
        out = mg_heavy_hitters(
            ray.data.from_pandas(pd.DataFrame({"v": vals}))
            .repartition(parts), "v", k=k)
        assert mandatory <= set(out["item"])


def test_exact_when_under_k(ray_session):
    vals = np.repeat(["a", "b", "c"], [5, 3, 2])
    ds = ray.data.from_pandas(pd.DataFrame({"v": vals})).repartition(4)
    out = mg_heavy_hitters(ds, "v", k=16)
    got = dict(zip(out["item"], out["min_count"]))
    assert got == {"a": 5, "b": 3, "c": 2}
    # no trimming happened anywhere → zero error window
    assert (out["max_count"] == out["min_count"]).all()


def test_null_values_are_ignored(ray_session):
    ds = ray.data.from_pandas(
        pd.DataFrame({"v": ["a", None, "a", "b", None]}))
    out = mg_heavy_hitters(ds, "v", k=4)
    assert dict(zip(out["item"], out["min_count"])) == {"a": 2, "b": 1}


def test_random_streams_property(ray_session):
    """Randomized: for arbitrary streams and k, the mandatory-containment
    and bound guarantees always hold."""
    rng = np.random.default_rng(33)
    for trial in range(5):
        n_items = int(rng.integers(5, 120))
        # zipf-ish random frequencies
        freqs = np.maximum(1, (2000 / (np.arange(n_items) + 1)
                               * rng.uniform(0.3, 1.5, n_items))).astype(int)
        vals = np.repeat([f"i{j}" for j in range(n_items)], freqs)
        rng.shuffle(vals)
        k = int(rng.integers(4, 48))
        ds = ray.data.from_pandas(pd.DataFrame({"v": vals})) \
            .repartition(int(rng.integers(1, 12)))
        out = mg_heavy_hitters(ds, "v", k=k)
        n = len(vals)
        true = pd.Series(vals).value_counts()
        mandatory = set(true[true > n / (k + 1)].index)
        assert mandatory <= set(out["item"]), (trial, k)
        got = out.set_index("item")
        for item in out["item"]:
            t = int(true.get(item, 0))
            assert got.loc[item, "min_count"] <= t \
                <= got.loc[item, "max_count"], (trial, item)
        assert ((got["max_count"] - got["min_count"])
                <= n / (k + 1) + 1e-9).all(), (trial, k)


def test_grouped_guarantee(ray_session):
    from cmc_knowledge_graph_text2ttl_ray.pipelines.sketches import (
        grouped_mg_heavy_hitters,
    )

    rng = np.random.default_rng(9)
    rows = []
    for g, n_items, scale in (("a", 80, 1500), ("b", 30, 400)):
        for i in range(n_items):
            rows.extend([(g, f"{g}{i}")] * max(1, scale // (i + 1)))
    df = pd.DataFrame(rows, columns=["g", "v"])
    df = df.sample(frac=1.0, random_state=3).reset_index(drop=True)
    ds = ray.data.from_pandas(df).repartition(8)
    k = 16
    out = grouped_mg_heavy_hitters(ds, "g", "v", k=k)
    for g, sub in df.groupby("g"):
        true = sub["v"].value_counts()
        n = len(sub)
        mandatory = set(true[true > n / (k + 1)].index)
        got_items = set(out[out["g"] == g]["item"])
        assert mandatory <= got_items, g
        gsub = out[out["g"] == g].set_index("item")
        for item in got_items:
            t = int(true.get(item, 0))
            assert gsub.loc[item, "min_count"] <= t \
                <= gsub.loc[item, "max_count"], (g, item)


def test_mg_check_row_planted(ray_session, tmp_path):
    """The oracle-backed MG check row on a planted skewed corpus: exact
    token count, zero mandatory misses, zero containment violations."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from cmc_knowledge_graph_text2ttl_ray.pipelines.sketches import (
        docs_heavy_words_mg_check,
    )

    rng = np.random.default_rng(17)
    texts, total = [], 0
    for d in range(40):
        words = ["hot"] * 50 + [f"w{rng.integers(0, 500)}" for _ in range(60)]
        total += len(words)
        texts.append(" ".join(words))
    pq.write_table(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    }), str(tmp_path / "documents.parquet"))

    out = docs_heavy_words_mg_check(str(tmp_path), k=8)
    assert out.to_dict("records") == [{
        "k": 8, "n_words": total,
        "mandatory_missing": 0, "containment_violations": 0,
    }]
