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

__all__ = ["sessionize", "user_sessions"]

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
