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


def _user_bucket_fn(num_buckets: int):
    def _user_bucket(t: pa.Table) -> pa.Table:
        u = t.column("user_id").to_numpy(zero_copy_only=False).astype(np.uint64)
        b = ((u * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(38)) \
            % np.uint64(num_buckets)
        return t.append_column("bucket", pa.array(b.astype(np.int64)))
    return _user_bucket


def _event_buckets(events_ds) -> int:
    """Bucket count scaled to the event-log size (metadata row count; each
    user-bucket group task holds ~|events|/B rows — round-2 VERDICT #5)."""
    from ..stages.bucketing import adaptive_bucket_count, rows_if_cheap
    return adaptive_bucket_count(rows_if_cheap(events_ds))


def tumbling_window(events_ds, window: str = "h"):
    """(user_id, window_start, n_events, sum_value) per tumbling window.

    Final combine is hash-bucketed by user (all of a user's windows land in one
    group) with a vectorized in-group reduce — Ray's two-key sort aggregate on
    (user, window) pays a comparison sort of every partial row."""
    nb = _event_buckets(events_ds)
    partial = events_ds.map_batches(lambda t: _tumble_partial(t, window),
                                    batch_format="pyarrow")

    def _combine(g: pd.DataFrame) -> pa.Table:
        out = g.groupby(["user_id", "window_start"], sort=False).agg(
            n_events=("n_events", "sum"),
            sum_value=("sum_value", "sum")).reset_index()
        # emit Arrow with metadata stripped — per-group pandas metadata defeats
        # Ray's schema-dedup cache ("Failed to hash the schemas" spam)
        return pa.Table.from_pandas(out, preserve_index=False) \
            .replace_schema_metadata(None)

    return partial.map_batches(_user_bucket_fn(nb), batch_format="pyarrow") \
        .groupby("bucket").map_groups(
            lambda g: _combine(g.drop(columns=["bucket"])),
            batch_format="pandas")


def sessionize(events_ds, gap_seconds: float = 1800.0):
    """Session windows per user: events sorted by ts within user; a gap > threshold
    starts a new session.  Ordering assumption: per-user event streams fit a group
    (groupby(user).map_groups over ts-sorted rows)."""

    def _sessions(g: pd.DataFrame) -> pa.Table:
        # one vectorized pass over a whole USER-BUCKET: sort (user, ts), a
        # user change or a gap > threshold starts a new session id
        g = g.sort_values(["user_id", "ts"])
        new_user = g["user_id"].ne(g["user_id"].shift())
        gaps = g["ts"].diff().dt.total_seconds()
        sid = (new_user | (gaps > gap_seconds)).cumsum()
        out = g.groupby(sid).agg(
            user_id=("user_id", "first"), session_start=("ts", "min"),
            session_end=("ts", "max"), n_events=("ts", "size"),
            sum_value=("value", "sum"))
        return pa.Table.from_pandas(out.reset_index(drop=True),
                                    preserve_index=False) \
            .replace_schema_metadata(None)

    nb = _event_buckets(events_ds)
    return events_ds.map_batches(_user_bucket_fn(nb), batch_format="pyarrow") \
        .groupby("bucket").map_groups(
            lambda g: _sessions(g.drop(columns=["bucket"])),
            batch_format="pandas")
