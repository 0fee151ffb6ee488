"""Windowed / stateful event-stream operators.

The reference is strictly batch with no windowing (SURVEY §2.10); these are
engine additions for event tables. Sessionization is the canonical
"stateful per key, ordered within key" operator: expressed Ray-Data-first as
``groupby(user).map_groups`` with an in-group sort — the partitioning
assumption (all events of a user fit one group) is the documented contract.
"""

from __future__ import annotations

import pandas as pd
import ray.data

__all__ = ["sessionize", "user_sessions", "user_event_gaps",
           "events_top_per_user"]

GAP_MINUTES = 30


def sessionize(events_ds, gap_minutes: int = GAP_MINUTES):
    """Assign session ids per user: a new session starts when the gap to the
    previous event exceeds ``gap_minutes``. Returns per-event rows with
    ``session_seq`` (1-based per user)."""

    gap = pd.Timedelta(minutes=gap_minutes)

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"], kind="stable")
        new_session = g["ts"].diff().gt(gap)
        if len(new_session):
            # diff() of the first row is NaT → gt gives False, not NaN; the
            # first event always opens a session.
            new_session.iloc[0] = True
        g["session_seq"] = new_session.cumsum().astype("int64")
        return g

    return events_ds.groupby("user_id").map_groups(per_user, batch_format="pandas")


def user_sessions(sf_dir: str, gap_minutes: int = GAP_MINUTES):
    """Per-user session stats: number of sessions + events."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "ts", "user_id"]
    )
    sessions = sessionize(ds, gap_minutes)

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "user_id": [g["user_id"].iloc[0]],
                "n_sessions": [int(g["session_seq"].max())],
                "n_events": [len(g)],
            }
        )

    return sessions.groupby("user_id").map_groups(per_user, batch_format="pandas")


def user_event_gaps(sf_dir: str):
    """Per-user LAG() statistics: inter-event gap seconds (count / avg /
    max) ordered by (ts, event_id) within each user — the window-function
    shape ``LAG(ts) OVER (PARTITION BY user ORDER BY ts)``.

    Scale shape: one ``groupby(user).map_groups`` shuffle; within a group
    everything is a vectorized sort + diff. Contract (as for
    :func:`sessionize`): one user's events fit one group — keys are users,
    so group size is bounded by per-user activity, not corpus size."""

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "ts", "user_id"]
    )

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"], kind="stable")
        gaps = g["ts"].diff().dt.total_seconds().dropna()
        return pd.DataFrame({
            "user_id": [g["user_id"].iloc[0]],
            "n_gaps": [int(len(gaps))],
            "avg_gap_s": [round(float(gaps.mean()), 4) if len(gaps) else None],
            "max_gap_s": [float(gaps.max()) if len(gaps) else None],
        })

    return ds.groupby("user_id").map_groups(per_user, batch_format="pandas")


def events_top_per_user(sf_dir: str, k: int = 3):
    """Per-user top-k events by value — the ROW_NUMBER() OVER
    (PARTITION BY user ORDER BY value DESC, event_id) ≤ k window shape,
    with the rank returned. Same one-shuffle map_groups contract."""

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "value"]
    )

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["value", "event_id"],
                          ascending=[False, True], kind="stable").head(k)
        g = g.assign(rnk=pd.RangeIndex(1, len(g) + 1).astype("int64"))
        return g[["user_id", "event_id", "value", "rnk"]]

    return ds.groupby("user_id").map_groups(per_user, batch_format="pandas")
