"""Ordered funnel analysis (functions/funnel.py)."""
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _events(rows, parts=3):
    """rows: (event_id, user, type, ts_us)"""
    import ray.data as rd
    t = pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "user_id": pa.array([r[1] for r in rows], pa.int64()),
        "event_type": pa.array([r[2] for r in rows], pa.string()),
        "ts": pa.array([r[3] for r in rows], pa.timestamp("us")),
    })
    return rd.from_arrow(t).repartition(parts)


class TestFunnel:
    def test_strict_ordering_and_depths(self):
        from graph_data_science_ray.functions.funnel import funnel_depths
        rows = [
            # user 1: A then B then C in order -> depth 3
            (0, 1, "A", 10), (1, 1, "B", 20), (2, 1, "C", 30),
            # user 2: B before A -> depth 1 (A at 50, no B after)
            (3, 2, "B", 40), (4, 2, "A", 50),
            # user 3: A and B SAME timestamp -> strict > fails -> depth 1
            (5, 3, "A", 60), (6, 3, "B", 60),
            # user 4: no A at all -> depth 0
            (7, 4, "B", 70), (8, 4, "C", 80),
            # user 5: A, B, then B again, C between the Bs -> A(10) B(20) C(25)
            (9, 5, "A", 10), (10, 5, "B", 20), (11, 5, "C", 25), (12, 5, "B", 30),
        ]
        out = funnel_depths(_events(rows), ["A", "B", "C"], num_buckets=4) \
            .to_pandas().set_index("user")
        assert out.loc[1].depth == 3
        assert out.loc[2].depth == 1
        assert out.loc[3].depth == 1
        assert out.loc[4].depth == 0
        assert out.loc[5].depth == 3

    def test_greedy_earliest_is_optimal_here(self):
        from graph_data_science_ray.functions.funnel import funnel_depths
        # A(10), A(30), B(20): greedy takes A@10 -> B@20 ok (late A would fail)
        rows = [(0, 1, "A", 10), (1, 1, "A", 30), (2, 1, "B", 20)]
        out = funnel_depths(_events(rows, 1), ["A", "B"]).to_pandas()
        assert out.depth.tolist() == [2]

    def test_counts_monotone_and_layout_invariant(self):
        from graph_data_science_ray.functions.funnel import funnel_counts
        rng = np.random.default_rng(7)
        rows = [(i, int(rng.integers(0, 40)),
                 ["A", "B", "C"][int(rng.integers(0, 3))],
                 int(rng.integers(0, 10_000))) for i in range(600)]
        a = funnel_counts(_events(rows, 1), ["A", "B", "C"]).to_pandas()
        b = funnel_counts(_events(rows, 9), ["A", "B", "C"]).to_pandas()
        assert a.equals(b)
        assert (a.users_reached.diff().dropna() <= 0).all()  # funnel narrows

    def test_empty_steps_raise(self):
        from graph_data_science_ray.functions.funnel import funnel_depths
        with pytest.raises(ValueError):
            funnel_depths(_events([(0, 1, "A", 1)]), [])


class TestRetentionCohorts:
    def _ev(self, rows, parts=3):
        import ray.data as rd
        return rd.from_arrow(pa.table({
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
        })).repartition(parts)

    def test_known_matrix(self):
        from graph_data_science_ray.functions.funnel import retention_cohorts
        WEEK = 7 * 86_400_000_000
        # epoch 345600us*1e6 = 1970-01-05 Monday 00:00 -> week index 0
        w0 = 4 * 86_400_000_000
        rows = [
            (1, w0), (1, w0 + WEEK), (1, w0 + 2 * WEEK),   # active w0,w1,w2
            (2, w0), (2, w0 + 2 * WEEK),                   # active w0,w2
            (3, w0 + WEEK),                                # cohort w1 only
            (1, w0 + 10),                                  # same week dup
        ]
        out = retention_cohorts(self._ev(rows), num_buckets=4).to_pandas()
        got = {(c, o): n for c, o, n in
               zip(out.cohort_week, out.week_offset, out.active_users)}
        assert got == {(0, 0): 2, (0, 1): 1, (0, 2): 2, (1, 0): 1}

    def test_matches_duckdb(self):
        import duckdb
        from graph_data_science_ray.functions.funnel import retention_cohorts
        rng = np.random.default_rng(3)
        base = 1_700_000_000_000_000  # somewhere in 2023
        rows = [(int(rng.integers(0, 30)),
                 base + int(rng.integers(0, 90)) * 86_400_000_000)
                for _ in range(400)]
        out = retention_cohorts(self._ev(rows, 7), num_buckets=4) \
            .to_pandas().reset_index(drop=True)
        tb = self._ev(rows, 1).to_pandas()
        want = duckdb.sql("""
            WITH w AS (SELECT user_id,
                              (date_diff('day', DATE '1970-01-05',
                                         date_trunc('week', ts)) // 7)::BIGINT AS wk
                       FROM tb),
            f AS (SELECT user_id, min(wk) AS cohort FROM w GROUP BY user_id),
            a AS (SELECT DISTINCT w.user_id, f.cohort, w.wk - f.cohort AS off
                  FROM w JOIN f USING (user_id))
            SELECT cohort AS cohort_week, off AS week_offset,
                   count(*)::BIGINT AS active_users
            FROM a GROUP BY 1, 2 ORDER BY 1, 2""").df().reset_index(drop=True)
        assert out.equals(want)


def test_retention_ns_timestamps_match_us():
    """timestamp[ns] input (the pandas default) must produce the same matrix
    as timestamp[us] — the unit-normalization regression the review caught."""
    import ray.data as rd
    from graph_data_science_ray.functions.funnel import retention_cohorts
    base = 1_700_000_000_000_000
    rows_u = [(i % 9, base + (i % 40) * 86_400_000_000) for i in range(120)]
    t_us = pa.table({"user_id": pa.array([r[0] for r in rows_u], pa.int64()),
                     "ts": pa.array([r[1] for r in rows_u], pa.timestamp("us"))})
    t_ns = t_us.set_column(1, "ts", t_us.column("ts").cast(pa.timestamp("ns")))
    a = retention_cohorts(rd.from_arrow(t_us).repartition(3), num_buckets=2)
    b = retention_cohorts(rd.from_arrow(t_ns).repartition(3), num_buckets=2)
    assert a.equals(b)
    assert a.num_rows > 1
