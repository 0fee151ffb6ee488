"""Skew-safe join: planted hot key takes the broadcast path, result
identical to a plain join."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from cmc_knowledge_graph_text2ttl_ray.pipelines.relational import (
    skew_safe_join_priority_quantity,
)


@pytest.fixture(scope="module")
def skew_dir(tmp_path_factory):
    """lineitem with one orderkey carrying 5000 of 6000 rows."""
    d = tmp_path_factory.mktemp("skewjoin")
    rng = np.random.default_rng(13)
    hot = np.full(5000, 7, dtype=np.int64)
    cold = rng.integers(100, 400, 1000).astype(np.int64)
    keys = np.concatenate([hot, cold])
    li = pd.DataFrame({
        "l_orderkey": keys,
        "l_quantity": rng.integers(1, 50, len(keys)).astype("float64"),
    })
    okeys = np.unique(keys)
    orders = pd.DataFrame({
        "o_orderkey": okeys,
        "o_orderpriority": np.where(okeys % 2 == 0, "1-URGENT", "3-MEDIUM"),
    })
    pq.write_table(pa.Table.from_pandas(li, preserve_index=False),
                   d / "lineitem.parquet")
    pq.write_table(pa.Table.from_pandas(orders, preserve_index=False),
                   d / "orders.parquet")
    return str(d), li, orders


def test_matches_plain_join_under_skew(ray_session, skew_dir):
    d, li, orders = skew_dir
    got = skew_safe_join_priority_quantity(d, hot_k=8)
    exp = (li.merge(orders, left_on="l_orderkey", right_on="o_orderkey")
           .groupby("o_orderpriority", as_index=False)["l_quantity"].sum()
           .rename(columns={"l_quantity": "total_qty"})
           .sort_values("o_orderpriority").reset_index(drop=True))
    exp["total_qty"] = exp["total_qty"].round(2)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    # the hot key (freq 5000/6000 ≫ n/(k+1)) is guaranteed in the MG
    # sketch, so the broadcast path carried it — sanity: hot priority
    # present in the output
    hot_pr = orders[orders["o_orderkey"] == 7]["o_orderpriority"].iloc[0]
    assert hot_pr in set(got["o_orderpriority"])


def test_retention_cohorts_paths_agree(ray_session, tmp_path):
    """Broadcast vs distributed-join cohort paths produce identical
    matrices on a small planted event log."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from cmc_knowledge_graph_text2ttl_ray.pipelines.relational import (
        events_retention_cohorts,
    )

    rng = np.random.default_rng(2)
    n = 400
    ts = (np.datetime64("2025-01-01") +
          rng.integers(0, 20, n).astype("timedelta64[D]"))
    ev = pd.DataFrame({"ts": ts.astype("datetime64[us]"),
                       "user_id": rng.integers(0, 30, n).astype("int64")})
    d = tmp_path / "ret"
    d.mkdir()
    pq.write_table(pa.Table.from_pandas(ev, preserve_index=False),
                   d / "events.parquet")
    a = events_retention_cohorts(str(d)).to_pandas() \
        .reset_index(drop=True)
    b = events_retention_cohorts(str(d), broadcast_threshold=0) \
        .to_pandas().reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
    # offset 0 row exists for every cohort (a user is active on their
    # first day by definition)
    z = a[a["day_offset"] == 0]
    assert set(z["cohort_day"]) == set(a["cohort_day"])


def test_rolling_active_users_hand_case(ray_session, tmp_path):
    """3-day window over a tiny planted log matches hand computation."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from cmc_knowledge_graph_text2ttl_ray.pipelines.relational import (
        events_rolling_active_users,
    )

    # user 1 active d0, d2; user 2 active d0; user 3 active d4
    days = np.array(["2025-01-01", "2025-01-03", "2025-01-01",
                     "2025-01-05", "2025-01-03"], dtype="datetime64[us]")
    ev = pd.DataFrame({"ts": days,
                       "user_id": pd.array([1, 1, 2, 3, 1],
                                           dtype="int64")})
    d = tmp_path / "wau"
    d.mkdir()
    pq.write_table(pa.Table.from_pandas(ev, preserve_index=False),
                   d / "events.parquet")
    out = events_rolling_active_users(str(d), window=3).to_pandas()
    got = dict(zip(out["day"].astype(str).str[:10], out["active_users"]))
    # observed days: 01, 03, 05. Window 3 (trailing):
    #   01: users{1,2}=2 ; 03: users{1 (01,03), 2 (01)}=2 ; 05: {1(03),3}=2
    assert got == {"2025-01-01": 2, "2025-01-03": 2, "2025-01-05": 2}


def test_segment_year_pivot_shape(ray_session):
    """Pivot over the sf0.001 tables: one row per segment, year columns
    sum to the orders row count."""
    import pyarrow.parquet as pq_

    from cmc_knowledge_graph_text2ttl_ray.pipelines.relational import (
        segment_year_pivot,
    )

    sf = "/root/testdata/sf0.001"
    out = segment_year_pivot(sf)
    n_orders = pq_.read_metadata(f"{sf}/orders.parquet").num_rows
    ycols = [c for c in out.columns if c.startswith("y")]
    assert out[ycols].to_numpy().sum() == n_orders
    assert out["c_mktsegment"].is_unique


def test_q16_join_path_parity(ray_session):
    """The distributed (anti-join + inner-join) q16 path returns exactly
    the broadcast path's table — forced via broadcast_threshold=0."""
    from cmc_knowledge_graph_text2ttl_ray.pipelines.relational import (
        q16_supplier_part_counts,
    )

    sf = "/root/testdata/sf0.001"
    bcast = q16_supplier_part_counts(sf)
    joined = q16_supplier_part_counts(sf, broadcast_threshold=0)
    assert bcast.equals(joined)
    assert len(bcast) > 0
