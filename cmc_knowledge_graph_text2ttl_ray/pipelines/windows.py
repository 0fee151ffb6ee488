"""Windowed / stateful event-stream operators.

The reference is strictly batch with no windowing (SURVEY §2.10); these are
engine additions for event tables. Sessionization is the canonical
"stateful per key, ordered within key" operator: expressed Ray-Data-first
as ONE exchange on ``hash(user) % P`` coarse partitions followed by a
cross-user VECTORIZED kernel per partition (sort by (user, ts), detect
boundaries, per-user cumulative ops via pandas ``groupby`` at C speed) —
NOT a per-user ``map_groups`` call, which pays per-group Python overhead
linear in the number of users (see
``functions/cluster.py::coarse_group_reduce``). The partitioning contract
is unchanged: all events of one user land in one partition; partition
count scales with the data, so one task never holds more than ~rows/P.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data

from cmc_knowledge_graph_text2ttl_ray.functions.cluster import (
    coarse_group_reduce,
)

__all__ = ["sessionize", "user_sessions", "user_event_gaps",
           "events_top_per_user"]

GAP_MINUTES = 30


def _with_sessions(g: pd.DataFrame, gap: pd.Timedelta) -> pd.DataFrame:
    """Vectorized per-user session numbering for ALL users of a partition:
    sort by (user, ts, event_id); a session opens on a user change or a
    gap over the threshold; ``session_seq`` is the per-user cumsum."""
    g = g.sort_values(["user_id", "ts", "event_id"], kind="stable")
    user = g["user_id"].to_numpy()
    new_user = np.empty(len(g), dtype=bool)
    if len(g):
        new_user[0] = True
        new_user[1:] = user[1:] != user[:-1]
    new_session = g["ts"].diff().gt(gap).to_numpy() | new_user
    g = g.assign(
        session_seq=pd.Series(new_session, index=g.index)
        .groupby(g["user_id"], sort=False).cumsum().astype("int64"))
    return g


def sessionize(events_ds, gap_minutes: int = GAP_MINUTES):
    """Assign session ids per user: a new session starts when the gap to the
    previous event exceeds ``gap_minutes``. Returns per-event rows with
    ``session_seq`` (1-based per user)."""
    gap = pd.Timedelta(minutes=gap_minutes)
    return coarse_group_reduce(
        events_ds, ["user_id"], lambda g: _with_sessions(g, gap))


def user_sessions(sf_dir: str, gap_minutes: int = GAP_MINUTES):
    """Per-user session stats: number of sessions + events."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "ts", "user_id"]
    )
    gap = pd.Timedelta(minutes=gap_minutes)

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        s = _with_sessions(g, gap)
        agg = s.groupby("user_id", sort=False).agg(
            n_sessions=("session_seq", "max"),
            n_events=("session_seq", "size"))
        return pd.DataFrame({
            "user_id": agg.index.to_numpy(),
            "n_sessions": agg["n_sessions"].to_numpy(dtype=np.int64),
            "n_events": agg["n_events"].to_numpy(dtype=np.int64),
        })

    return coarse_group_reduce(ds, ["user_id"], combine)


def user_event_gaps(sf_dir: str):
    """Per-user LAG() statistics: inter-event gap seconds (count / avg /
    max) ordered by (ts, event_id) within each user — the window-function
    shape ``LAG(ts) OVER (PARTITION BY user ORDER BY ts)``."""

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "ts", "user_id"]
    )

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="stable")
        user = g["user_id"].to_numpy()
        gaps = g["ts"].diff().dt.total_seconds()
        if len(g):
            first = np.empty(len(g), dtype=bool)
            first[0] = True
            first[1:] = user[1:] != user[:-1]
            gaps = gaps.mask(pd.Series(first, index=g.index))
        agg = gaps.groupby(g["user_id"], sort=False).agg(
            ["count", "mean", "max"])
        from cmc_knowledge_graph_text2ttl_ray.functions.rounding import round_half_away

        mean = pd.Series(round_half_away(agg["mean"].to_numpy(), 4),
                         index=agg.index)
        return pd.DataFrame({
            "user_id": agg.index.to_numpy(),
            "n_gaps": agg["count"].to_numpy(dtype=np.int64),
            "avg_gap_s": mean.where(agg["count"] > 0, None).to_numpy(),
            "max_gap_s": agg["max"].where(agg["count"] > 0, None).to_numpy(),
        })

    return coarse_group_reduce(ds, ["user_id"], combine)


def events_top_per_user(sf_dir: str, k: int = 3):
    """Per-user top-k events by value — the ROW_NUMBER() OVER
    (PARTITION BY user ORDER BY value DESC, event_id) ≤ k window shape,
    with the rank returned."""

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "value"]
    )

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "value", "event_id"],
                          ascending=[True, False, True], kind="stable")
        rnk = g.groupby("user_id", sort=False).cumcount() + 1
        g = g.assign(rnk=rnk.astype("int64"))
        return g[g["rnk"] <= k][["user_id", "event_id", "value", "rnk"]]

    return coarse_group_reduce(ds, ["user_id"], combine)


def user_running_totals(sf_dir: str):
    """Per-event running totals within each user — the
    ``SUM(value) OVER (PARTITION BY user ORDER BY ts, event_id ROWS
    UNBOUNDED PRECEDING)`` window shape, plus the running row number.
    No rounding: the cumsum is evaluated in the exact order the SQL
    window uses, so both sides produce bit-identical doubles.

    Same partitioning contract as the rest of this module: ONE exchange
    on hash(user) % P, then a cross-user vectorized kernel (sort once,
    segmented cumsum via groupby) per coarse partition. The cumulative
    sum is evaluated in the same (ts, event_id) order the SQL window
    uses, so the floating-point result is bit-deterministic."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "value"],
    )

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="stable")
        grp = g.groupby("user_id", sort=False)["value"]
        return pd.DataFrame({
            "event_id": g["event_id"].to_numpy(np.int64),
            "user_id": g["user_id"].to_numpy(np.int64),
            "running_sum": grp.cumsum().to_numpy(),
            "running_n": (g.groupby("user_id", sort=False).cumcount()
                          + 1).to_numpy(np.int64),
        })

    return coarse_group_reduce(ds, ["user_id"], combine)


def funnel_counts(sf_dir: str, stages=("view", "click", "purchase")):
    """Funnel analysis: how many users progress through the ordered stage
    sequence (first 'view', then the first 'click' strictly after it,
    then the first 'purchase' strictly after that) — the sequential
    pattern-match shape product analytics runs over event streams.

    Same contract as the rest of the module: ONE exchange on
    hash(user) % P; inside each coarse partition the stage-by-stage
    "first event after t" is a vectorized cross-user kernel (sort once,
    per-stage groupby-first against the running per-user threshold).
    Only per-partition stage counts (len(stages) rows each) leave the
    tasks."""

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts", "event_type"]
    )

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts"], kind="stable")
        # running per-user threshold: ts of the previous stage's first hit
        thresh = None  # None = stage 0: no lower bound
        counts = []
        for stage in stages:
            e = g[g["event_type"] == stage]
            if thresh is not None:
                e = e.merge(thresh, on="user_id", how="inner")
                e = e[e["ts"] > e["prev_ts"]]
            first = (e.groupby("user_id", as_index=False)["ts"].min()
                     .rename(columns={"ts": "prev_ts"}))
            counts.append(len(first))
            thresh = first
        return pd.DataFrame({"stage": list(stages),
                             "n_users": np.asarray(counts, np.int64)})

    parts = coarse_group_reduce(ds, ["user_id"], combine).to_pandas()
    out = (parts.groupby("stage", as_index=False)["n_users"].sum()
           .astype({"n_users": "int64"}))
    # present in funnel order, not alphabetical
    order = {s: i for i, s in enumerate(stages)}
    return (out.assign(_o=out["stage"].map(order)).sort_values("_o")
            .drop(columns="_o").reset_index(drop=True))
