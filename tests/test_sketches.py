"""HyperLogLog distinct counting: accuracy, mergeability, determinism."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


def test_hll_partial_merge_equals_whole():
    """max-merge of per-chunk registers == registers of the whole array
    (the property that makes per-block partials correct)."""
    from cmc_knowledge_graph_text2ttl_ray.pipelines.sketches import _hll_partial

    rng = np.random.RandomState(3)
    vals = rng.randint(0, 10_000, size=30_000)
    whole = _hll_partial(vals, 12)
    merged = np.zeros_like(whole)
    for chunk in np.array_split(vals, 7):
        merged = np.maximum(merged, _hll_partial(chunk, 12))
    assert np.array_equal(whole, merged)


def test_hll_accuracy_50k_distinct():
    from cmc_knowledge_graph_text2ttl_ray.pipelines.sketches import (
        _hll_estimate,
        _hll_partial,
    )

    true_n = 50_000
    vals = np.arange(true_n, dtype=np.int64)
    est = _hll_estimate(_hll_partial(vals, 12))
    assert abs(est - true_n) / true_n < 0.05  # 1.6% expected at p=12


def test_hll_small_range_linear_counting():
    from cmc_knowledge_graph_text2ttl_ray.pipelines.sketches import (
        _hll_estimate,
        _hll_partial,
    )

    vals = np.arange(150, dtype=np.int64)
    est = _hll_estimate(_hll_partial(vals, 12))
    assert abs(est - 150) < 5


def test_hll_vs_exact_on_events(ray_session, tmp_path):
    from cmc_knowledge_graph_text2ttl_ray.pipelines.sketches import (
        events_distinct_users,
        events_users_hll,
    )

    rng = np.random.RandomState(9)
    users = rng.randint(0, 4000, size=20_000)
    pq.write_table(pa.table({"user_id": pa.array(users, pa.int64())}),
                   str(tmp_path / "events.parquet"))
    exact = int(events_distinct_users(str(tmp_path))["n_users"].iloc[0])
    assert exact == len(np.unique(users))
    est = float(events_users_hll(str(tmp_path))["n_users_est"].iloc[0])
    assert abs(est - exact) / exact < 0.05
    # determinism: identical estimate on a second run
    est2 = float(events_users_hll(str(tmp_path))["n_users_est"].iloc[0])
    assert est == est2


def test_hll_check_row_exact_and_bounded(ray_session, tmp_path):
    """The oracle-backed HLL row: exact count matches numpy, the 3-sigma
    boolean holds, and both are deterministic across block layouts."""
    from cmc_knowledge_graph_text2ttl_ray.pipelines.sketches import (
        events_users_hll_check,
    )

    rng = np.random.RandomState(11)
    users = rng.randint(0, 7000, size=30_000)
    tbl = pa.table({"user_id": pa.array(users, pa.int64())})
    pq.write_table(tbl, str(tmp_path / "events.parquet"))
    out = events_users_hll_check(str(tmp_path))
    assert list(sorted(out.columns)) == ["hll_within_bound", "n_users_exact"]
    assert int(out["n_users_exact"].iloc[0]) == len(np.unique(users))
    assert bool(out["hll_within_bound"].iloc[0]) is True
    # block-layout invariance: many tiny row groups → same row
    pq.write_table(tbl, str(tmp_path / "events.parquet"),
                   row_group_size=1_000)
    out2 = events_users_hll_check(str(tmp_path))
    assert out2.equals(out)


def test_bloom_prefilter_prunes_but_stays_exact(ray_session):
    """The bloom prefilter must never drop a true match (no false
    negatives); the exact join then equals the plain semi-join result
    regardless of false positives — checked at a tiny n_bits where FPs
    are guaranteed."""
    import duckdb

    from cmc_knowledge_graph_text2ttl_ray.pipelines.relational import (
        bloom_semi_join_revenue,
    )

    sf = "/root/testdata/sf0.001"
    tiny = bloom_semi_join_revenue(sf, n_bits=1 << 10)  # heavy FP regime
    big = bloom_semi_join_revenue(sf, n_bits=1 << 20)
    assert tiny.equals(big)
    want = duckdb.connect().execute(f"""
        SELECT l_returnflag,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
               COUNT(*) AS n_items
        FROM read_parquet('{sf}/lineitem.parquet')
        WHERE l_orderkey IN (
            SELECT o_orderkey FROM read_parquet('{sf}/orders.parquet')
            WHERE o_orderpriority = '1-URGENT')
        GROUP BY l_returnflag ORDER BY l_returnflag""").df()
    assert list(big["n_items"]) == list(want["n_items"])


def test_tdigest_merge_invariance_and_accuracy():
    """Different block splits of the same data give near-identical
    quantiles, and rank error stays within the delta bound on a
    heavy-tailed distribution."""
    import numpy as np

    from cmc_knowledge_graph_text2ttl_ray.pipelines.sketches import (
        _tdigest_compress,
        tdigest_quantile,
    )

    rng = np.random.default_rng(11)
    v = np.sort(rng.lognormal(0.0, 2.0, 100_000))
    qs = np.array([0.01, 0.1, 0.5, 0.9, 0.99])

    def digest_via_blocks(n_blocks, seed):
        parts = np.array_split(
            np.random.default_rng(seed).permutation(v), n_blocks)
        ms, ws = [], []
        for b in parts:
            b = np.sort(b)
            m, w = _tdigest_compress(b, np.ones_like(b), 200)
            ms.append(m)
            ws.append(w)
        m = np.concatenate(ms)
        w = np.concatenate(ws)
        o = np.argsort(m, kind="stable")
        return _tdigest_compress(m[o], w[o], 200)

    for n_blocks, seed in [(1, 0), (13, 1), (64, 2)]:
        m, w = digest_via_blocks(n_blocks, seed)
        assert w.sum() == len(v)
        est = tdigest_quantile(m, w, qs)
        ranks = np.searchsorted(v, est) / len(v)
        assert np.abs(ranks - qs).max() < 0.005


def test_tdigest_events_vs_exact(ray_session):
    """The single-pass sketch agrees with the exact multi-pass quantiles
    on the real events table within rank tolerance."""
    import numpy as np
    import pyarrow.parquet as pq

    from cmc_knowledge_graph_text2ttl_ray.pipelines.sketches import (
        events_value_quantiles_tdigest,
    )

    sf = "/root/testdata/sf0.001"
    got = events_value_quantiles_tdigest(sf)
    vals = np.sort(pq.read_table(f"{sf}/events.parquet",
                                 columns=["value"])["value"]
                   .to_numpy(zero_copy_only=False).astype(float))
    vals = vals[~np.isnan(vals)]
    ranks = np.searchsorted(vals, got["value_est"].to_numpy()) / len(vals)
    assert np.abs(ranks - got["q"].to_numpy()).max() < 0.01
    # determinism
    again = events_value_quantiles_tdigest(sf)
    assert (got["value_est"] == again["value_est"]).all()


def test_tdigest_empty_and_tiny():
    import numpy as np

    from cmc_knowledge_graph_text2ttl_ray.pipelines.sketches import (
        _tdigest_compress,
        tdigest_quantile,
    )

    m, w = _tdigest_compress(np.empty(0), np.empty(0), 100)
    assert len(m) == 0
    assert np.isnan(tdigest_quantile(m, w, [0.5])[0])
    m, w = _tdigest_compress(np.array([3.0]), np.array([1.0]), 100)
    assert tdigest_quantile(m, w, [0.0, 0.5, 1.0]).tolist() == [3.0, 3.0, 3.0]


def test_grouped_hll_close_to_exact(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data

    from cmc_knowledge_graph_text2ttl_ray.pipelines.sketches import (
        grouped_hll_distinct,
    )

    rng = np.random.default_rng(4)
    df = pd.DataFrame({
        "g": np.repeat(["a", "b", "c"], [4000, 2000, 500]),
        "v": np.concatenate([rng.integers(0, 1500, 4000),
                             rng.integers(0, 300, 2000),
                             rng.integers(0, 50, 500)]),
    })
    ds = ray.data.from_pandas(df).repartition(8)
    out = grouped_hll_distinct(ds, "g", "v", p=12).to_pandas() \
        .set_index("g")["n_distinct_est"]
    exact = df.groupby("g")["v"].nunique()
    for g in ("a", "b", "c"):
        assert abs(out[g] - exact[g]) / exact[g] < 0.05, (g, out[g], exact[g])


def test_grouped_hll_block_invariant(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data

    from cmc_knowledge_graph_text2ttl_ray.pipelines.sketches import (
        grouped_hll_distinct,
    )

    df = pd.DataFrame({"g": ["x"] * 300 + ["y"] * 100,
                       "v": list(range(300)) + list(range(50)) * 2})
    runs = []
    for parts in (1, 7):
        ds = ray.data.from_pandas(df).repartition(parts)
        runs.append(grouped_hll_distinct(ds, "g", "v").to_pandas()
                    .sort_values("g").reset_index(drop=True))
    pd.testing.assert_frame_equal(runs[0], runs[1])

def test_cm_sketch_guarantees_and_merge_invariance(ray_session, tmp_path):
    """est ≥ true always; est ≤ true + ceil(e/width·N) for planted heavy
    and light keys on a skewed stream; block layout doesn't change the
    merged table."""
    import math

    import ray.data

    from cmc_knowledge_graph_text2ttl_ray.pipelines.sketches import (
        _cm_estimate,
        cm_sketch,
    )

    rng = np.random.RandomState(7)
    # Zipf-ish: key_i appears ~ 50_000 / (i+1) times
    vals = np.concatenate([
        np.repeat(f"k{i}", 50_000 // (i + 1)) for i in range(200)
    ])
    rng.shuffle(vals)
    width, depth = 512, 4
    for blocks in (2, 16):
        ds = ray.data.from_pandas(
            pd.DataFrame({"v": vals})).repartition(blocks)
        tbl, n = cm_sketch(ds, "v", width=width, depth=depth)
        assert n == len(vals)
        uniq, true = np.unique(vals, return_counts=True)
        est = _cm_estimate(tbl, uniq.astype(object), width, depth)
        bound = math.ceil(math.e / width * n)
        assert (est >= true).all()          # structural: never undercounts
        # the ε-bound holds per key with prob ≥ 1 − e^−depth ≈ 0.982;
        # over 200 keys assert coverage, not all (a few misses expected)
        within = (est <= true + bound).mean()
        assert within >= 0.95, within
        # the 20 heaviest keys dominate their rows — they must all hold
        top = np.argsort(true)[-20:]
        assert (est[top] <= true[top] + bound).all()
        if blocks == 2:
            tbl_first = tbl
    assert (tbl_first == tbl).all()  # merge is layout-invariant


def test_cm_check_row_on_events(ray_session, tmp_path):
    from cmc_knowledge_graph_text2ttl_ray.pipelines.sketches import (
        events_type_count_cm_check,
    )

    rng = np.random.RandomState(5)
    types = rng.choice(["a", "b", "c"], size=9_000)
    pq.write_table(pa.table({"event_type": pa.array(types, pa.string())}),
                   str(tmp_path / "events.parquet"),
                   row_group_size=1_000)
    out = events_type_count_cm_check(str(tmp_path))
    assert out["cm_within_bound"].all()
    counts = dict(zip(out["event_type"], out["n_events"]))
    u, c = np.unique(types, return_counts=True)
    assert counts == dict(zip(u.tolist(), (int(x) for x in c)))


def test_tdigest_check_row_planted(ray_session, tmp_path):
    """The oracle-backed t-digest check row on a planted skewed value
    distribution: exact count, every quantile's measured rank within the
    bound."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from cmc_knowledge_graph_text2ttl_ray.pipelines.sketches import (
        events_value_tdigest_check,
    )

    rng = np.random.default_rng(23)
    vals = np.concatenate([rng.exponential(5.0, 30_000),
                           rng.normal(100.0, 1.0, 5_000)])
    pq.write_table(pa.table({"value": pa.array(vals, pa.float64())}),
                   str(tmp_path / "events.parquet"))
    out = events_value_tdigest_check(str(tmp_path))
    assert (out["n_events"] == len(vals)).all()
    assert out["rank_within_bound"].all(), out.to_dict("records")


def test_bloom_filter_no_false_negatives_and_fpr():
    """Structural no-false-negative guarantee + FPR near theory on a
    random member/non-member split (driver-side kernels)."""
    from cmc_knowledge_graph_text2ttl_ray.pipelines.sketches import (
        _bloom_partial, bloom_contains,
    )

    rng = np.random.default_rng(11)
    members = rng.choice(10_000_000, size=4000, replace=False)
    others = np.setdiff1d(rng.choice(10_000_000, size=6000, replace=False),
                          members)
    n_bits, k = 1 << 16, 7
    words = _bloom_partial(members, n_bits, k)
    assert bloom_contains(members, words, k).all()
    fpr = bloom_contains(others, words, k).mean()
    theory = (1 - np.exp(-k * len(members) / n_bits)) ** k
    assert fpr <= 3 * theory + 8 / len(others)


def test_bloom_build_block_invariant(ray_session):
    """The merged bitmap is an OR over set bits — identical under any
    block structure; string keys exercise the object-dtype hash path."""
    import ray.data

    from cmc_knowledge_graph_text2ttl_ray.pipelines.sketches import (
        bloom_build, bloom_contains,
    )

    vals = [f"key-{i}" for i in range(3000)]
    df = pd.DataFrame({"v": vals})
    bitmaps = []
    for parts in (1, 4, 64):
        ds = ray.data.from_pandas(df).repartition(parts)
        bitmaps.append(bloom_build(ds, "v", n_bits=1 << 15, k=7, fanin=8))
    assert np.array_equal(bitmaps[0], bitmaps[1])
    assert np.array_equal(bitmaps[0], bitmaps[2])
    probe = np.array(vals[:100] + ["absent-x", "absent-y"], dtype=object)
    hits = bloom_contains(probe, bitmaps[0], 7)
    assert hits[:100].all()


def test_bloom_check_row_on_events(ray_session):
    """The oracle-compared row: exact counts, zero false negatives,
    bound boolean TRUE at sf0.001."""
    import duckdb

    from cmc_knowledge_graph_text2ttl_ray.pipelines.sketches import (
        events_user_bloom_check,
    )

    sf = "/root/testdata/sf0.001"
    got = events_user_bloom_check(sf)
    want = duckdb.connect().execute(f"""
        SELECT CAST((SELECT COUNT(DISTINCT user_id)
                     FROM read_parquet('{sf}/events.parquet')
                     WHERE user_id % 2 = 0) AS BIGINT) AS n_members,
               CAST((SELECT COUNT(DISTINCT user_id)
                     FROM read_parquet('{sf}/events.parquet')
                     WHERE user_id % 2 <> 0) AS BIGINT) AS n_nonmembers
    """).df()
    assert int(got["n_members"][0]) == int(want["n_members"][0])
    assert int(got["n_nonmembers"][0]) == int(want["n_nonmembers"][0])
    assert int(got["false_negatives"][0]) == 0
    assert bool(got["fpr_within_bound"][0])
