"""Ordered-funnel analysis over an event log.

The classic product-analytics custom operator Ray Data lacks: for each user,
the longest prefix of an ordered step list completed in timestamp order
(step k matches only STRICTLY AFTER the time step k-1 matched; the greedy
earliest-match rule, which is optimal for "did the user complete the
prefix").  Deterministic tie-break: at equal timestamps the lower event_id
wins, and a same-timestamp event can NOT satisfy the next step (strict >).

Scale shape: one user-hash exchange routes each user's events to a single
partition (the repo's known-partitioner exchange — no sampled sort), then a
vectorized per-partition scan computes every user's depth; the driver sees
only the per-step user counts (len(steps) rows) or the per-user depth table.
SQL oracle: iterated min-over-window joins (one CTE per step).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def funnel_depths(events_ds, steps, *, user_col: str = "user_id",
                  type_col: str = "event_type", ts_col: str = "ts",
                  id_col: str = "event_id", num_buckets: int = 0):
    """Per-user funnel depth: (user, depth) where depth = number of leading
    ``steps`` completed in order (0 if the first step never occurs)."""
    from ..stages.exchange import exchange, hash_parts

    steps = list(steps)
    if not steps:
        raise ValueError("steps must be non-empty")
    if num_buckets <= 0:
        from ..stages.bucketing import adaptive_bucket_count, rows_if_cheap
        num_buckets = adaptive_bucket_count(rows_if_cheap(events_ds))

    cols = [user_col, type_col, ts_col, id_col]

    def _depth(p: int, t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"user": pa.array([], pa.int64()),
                             "depth": pa.array([], pa.int64())})
        users = t.column(user_col).to_numpy(zero_copy_only=False)
        types = np.asarray(t.column(type_col).to_pylist(), dtype=object)
        ts = t.column(ts_col).cast(pa.timestamp("us"), safe=False) \
            .cast(pa.int64()).to_numpy(zero_copy_only=False)
        eid = t.column(id_col).to_numpy(zero_copy_only=False)
        # sort by (user, ts, event_id): each user's events contiguous in
        # deterministic time order
        order = np.lexsort((eid, ts, users))
        users, types, ts = users[order], types[order], ts[order]
        uu = np.unique(users)
        uidx_all = np.searchsorted(uu, users)
        depth = np.zeros(uu.shape[0], dtype=np.int64)
        # per-step sweep over ALL users at once: cur[u] = match time of the
        # previous step (+inf once the user fell out of the funnel)
        cur = np.full(uu.shape[0], -(2 ** 62), dtype=np.int64)
        for k, s in enumerate(steps):
            m = types == s
            uidx = uidx_all[m]
            tm = ts[m]
            ok = tm > cur[uidx]
            best = np.full(uu.shape[0], 2 ** 62, dtype=np.int64)
            # events are time-sorted, so the FIRST valid hit per user is the
            # min; minimum.at folds them without per-user loops
            np.minimum.at(best, uidx[ok], tm[ok])
            hit = best < 2 ** 62
            depth[hit] = k + 1
            cur = best  # +inf for non-hitters: they can never match again
        return pa.table({"user": pa.array(uu.astype(np.int64)),
                         "depth": pa.array(depth)})

    return exchange(events_ds.select_columns(cols),
                    hash_parts(user_col, P=num_buckets), num_buckets,
                    combine=_depth)


def funnel_counts(events_ds, steps, **kw):
    """Per-step completion counts: (step, event_type, users_reached) — the
    funnel chart.  users_reached(k) = users whose depth >= k+1."""
    import ray

    from ..stages.blocks import nonempty_arrow_refs

    depths = funnel_depths(events_ds, steps, **kw)
    refs, _ = nonempty_arrow_refs(depths)
    hist = np.zeros(len(steps) + 1, dtype=np.int64)
    for t in ray.get(list(refs)):
        if t.num_rows and t.num_columns:
            np.add.at(hist, t.column("depth").to_numpy(zero_copy_only=False), 1)
    reached = np.cumsum(hist[::-1])[::-1]  # users with depth >= k
    return pa.table({
        "step": pa.array(np.arange(1, len(steps) + 1, dtype=np.int64)),
        "event_type": pa.array(list(steps), pa.string()),
        "users_reached": pa.array(reached[1:]),
    })


def retention_cohorts(events_ds, *, user_col: str = "user_id",
                      ts_col: str = "ts", num_buckets: int = 0):
    """Weekly retention matrix: cohort = ISO week (Monday-aligned index,
    weeks since 1970-01-05) of each user's FIRST event; cell
    (cohort_week, week_offset) counts users from that cohort active
    ``offset`` weeks later.  One user-hash exchange (a user's whole history
    in one partition), vectorized per-partition fold, and the driver sums
    only the tiny per-partition (cohort, offset, n) matrices.
    SQL oracle: date_trunc('week') + date_diff arithmetic, exact integers."""
    import ray

    from ..stages.blocks import nonempty_arrow_refs
    from ..stages.exchange import exchange, hash_parts

    if num_buckets <= 0:
        from ..stages.bucketing import adaptive_bucket_count, rows_if_cheap
        num_buckets = adaptive_bucket_count(rows_if_cheap(events_ds))

    US_PER_DAY = 86_400_000_000

    def _fold(p: int, t: pa.Table) -> pa.Table:
        empty = pa.table({"cohort_week": pa.array([], pa.int64()),
                          "week_offset": pa.array([], pa.int64()),
                          "n": pa.array([], pa.int64())})
        if t.num_rows == 0:
            return empty
        users = t.column(user_col).to_numpy(zero_copy_only=False)
        us = t.column(ts_col).cast(pa.timestamp("us"), safe=False) \
            .cast(pa.int64()).to_numpy(zero_copy_only=False)
        d = np.floor_divide(us, US_PER_DAY)
        monday = d - np.mod(d + 3, 7)      # Monday of the event's ISO week
        wk = np.floor_divide(monday - 4, 7)  # weeks since Monday 1970-01-05
        # distinct (user, week), user's min week = cohort
        order = np.lexsort((wk, users))
        u, w = users[order], wk[order]
        keep = np.concatenate(([True], (u[1:] != u[:-1]) | (w[1:] != w[:-1])))
        u, w = u[keep], w[keep]
        first = np.concatenate(([True], u[1:] != u[:-1]))
        cohort = np.repeat(w[first], np.diff(
            np.append(np.flatnonzero(first), u.shape[0])))
        off = w - cohort
        key = cohort * 100_000 + off       # offsets are < ~2000 weeks
        kk, cnt = np.unique(key, return_counts=True)
        return pa.table({
            "cohort_week": pa.array(np.floor_divide(kk, 100_000)),
            "week_offset": pa.array(np.mod(kk, 100_000)),
            "n": pa.array(cnt.astype(np.int64))})

    parts = exchange(events_ds.select_columns([user_col, ts_col]),
                     hash_parts(user_col, P=num_buckets), num_buckets,
                     combine=_fold)
    refs, _ = nonempty_arrow_refs(parts)
    acc: dict = {}
    for t in ray.get(list(refs)):
        if t.num_rows == 0 or t.num_columns == 0:
            continue
        for c, o, n in zip(t.column("cohort_week").to_pylist(),
                           t.column("week_offset").to_pylist(),
                           t.column("n").to_pylist()):
            acc[(c, o)] = acc.get((c, o), 0) + n
    ks = sorted(acc)
    return pa.table({
        "cohort_week": pa.array([k[0] for k in ks], pa.int64()),
        "week_offset": pa.array([k[1] for k in ks], pa.int64()),
        "active_users": pa.array([acc[k] for k in ks], pa.int64())})
