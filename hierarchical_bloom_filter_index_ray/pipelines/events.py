"""Windowed aggregates over the ``events`` stream table.

The reference's streaming semantics (SURVEY.md §2.11) are count-based
tumbling trees inside a sliding window; on a batch engine "streaming"
becomes deterministic windowing by time bucket: window assignment is a
vectorized
``map_batches`` and the aggregate is a pre-combined groupby.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd


def tumbling_window_agg(sf_dir: str, *, window_minutes: int = 60
                        ) -> "rd.Dataset":
    """(event_type, window_start, n_events, sum_value): tumbling event-time
    windows per event type."""
    span_us = window_minutes * 60 * 1_000_000

    def assign(batch: pa.Table) -> pa.Table:
        ts = batch["ts"].cast(pa.int64())
        win = pc.multiply(pc.floor(pc.divide(ts, span_us)).cast(pa.int64()),
                          span_us)
        return pa.table({
            "event_type": batch["event_type"],
            "window_start": win.cast(pa.timestamp("us")),
            "value": batch["value"],
        })

    from ray.data.aggregate import Count, Sum
    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["ts", "event_type", "value"])
    return (ds.map_batches(assign, batch_format="pyarrow")
            .groupby(["event_type", "window_start"])
            .aggregate(Count(alias_name="n_events"),
                       Sum("value", alias_name="sum_value")))


def sessionize(sf_dir: str, *, gap_minutes: int = 30) -> "rd.Dataset":
    """Per-user session windows (session = events gapped < gap_minutes):
    sorted per-user pandas logic inside ``groupby(user_id).map_groups``.
    Output one row per session: (user_id, session_start, session_end,
    n_events, sum_value)."""
    import pandas as pd

    gap = np.timedelta64(gap_minutes * 60, "s")

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"])
        new_sess = (g["ts"].diff() > gap).cumsum()
        out = g.groupby(new_sess).agg(
            session_start=("ts", "min"), session_end=("ts", "max"),
            n_events=("event_id", "count"), sum_value=("value", "sum"))
        out["user_id"] = g["user_id"].iloc[0]
        return out.reset_index(drop=True)[
            ["user_id", "session_start", "session_end", "n_events",
             "sum_value"]]

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "ts", "user_id", "value"])
    return ds.groupby("user_id").map_groups(per_user, batch_format="pandas")
