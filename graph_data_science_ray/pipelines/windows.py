"""Windowed aggregates over the events stream table.

Ray Data is a batch engine (like the reference, which has no streaming machinery at
all — SURVEY.md §1.3); stream-shaped inputs are treated as an ordered, partitioned
log.  A tumbling window = partial pre-aggregation per batch (one row per
(user, window) per batch) followed by a small ``groupby`` final combine — the
partial/final pattern that keeps the wide shuffle tiny."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _tumble_partial(batch: pa.Table, window: str) -> pa.Table:
    df = batch.select(["user_id", "ts", "value"]).to_pandas()
    df["window_start"] = df["ts"].dt.floor(window)
    g = df.groupby(["user_id", "window_start"], sort=False).agg(
        n_events=("value", "size"), sum_value=("value", "sum")).reset_index()
    # strip pandas metadata: distinct per-batch metadata defeats Ray's schema
    # dedup cache and spams "Failed to hash the schemas" warnings
    return pa.Table.from_pandas(g, preserve_index=False).replace_schema_metadata(None)


def tumbling_window(events_ds, window: str = "h"):
    """(user_id, window_start, n_events, sum_value) per tumbling window."""
    from ray.data.aggregate import Sum

    partial = events_ds.map_batches(lambda t: _tumble_partial(t, window),
                                    batch_format="pyarrow")
    return partial.groupby(["user_id", "window_start"]).aggregate(
        Sum("n_events", alias_name="n_events"),
        Sum("sum_value", alias_name="sum_value"))


def sessionize(events_ds, gap_seconds: float = 1800.0):
    """Session windows per user: events sorted by ts within user; a gap > threshold
    starts a new session.  Ordering assumption: per-user event streams fit a group
    (groupby(user).map_groups over ts-sorted rows)."""

    def _sessions(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("ts")
        gaps = g["ts"].diff().dt.total_seconds().fillna(np.inf)
        sid = (gaps > gap_seconds).cumsum()
        out = g.groupby(sid).agg(
            user_id=("user_id", "first"), session_start=("ts", "min"),
            session_end=("ts", "max"), n_events=("ts", "size"),
            sum_value=("value", "sum"))
        return out.reset_index(drop=True)

    return events_ds.groupby("user_id").map_groups(_sessions, batch_format="pandas")
