"""Relational custom operators (functions/relational.py, windows.hopping_window,
text.vocab_top_terms): semantics pinned against DuckDB on synthetic inputs plus
edge cases the exchange must survive (empty sides, single bucket, overlap)."""

import duckdb
import numpy as np
import pyarrow as pa
import pytest


def _to_table(x):
    import ray
    if isinstance(x, pa.Table):
        return x
    tabs = [t for t in ray.get(x.to_arrow_refs())
            if t.num_rows and t.num_columns]
    return (pa.concat_tables(tabs, promote_options="permissive")
            if tabs else pa.table({}))


def _sorted_df(t: pa.Table):
    df = t.to_pandas().sort_index(axis=1)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def _assert_tables_equal(got: pa.Table, exp: pa.Table, float_cols=()):
    g, e = _sorted_df(got), _sorted_df(exp)
    assert g.shape == e.shape, (g.shape, e.shape)
    assert list(g.columns) == list(e.columns)
    for c in g.columns:
        a, b = g[c].to_numpy(), e[c].to_numpy()
        if c in float_cols or a.dtype.kind == "f":
            np.testing.assert_allclose(a.astype(float), b.astype(float),
                                       atol=1e-9)
        else:
            assert (a == b).all(), c


def _events(n=400, seed=7):
    rng = np.random.default_rng(seed)
    ts = np.sort(rng.integers(0, 10**7, n)) * 1_000_000  # us, second-aligned-ish
    return pa.table({
        "event_id": np.arange(n, dtype=np.int64),
        "ts": ts.astype("datetime64[us]"),
        "user_id": rng.integers(0, 25, n).astype(np.int64),
        "event_type": pa.array(rng.choice(["click", "view", "buy"], n)),
        "value": np.round(rng.random(n) * 100, 3),
    })


class TestAsofJoin:
    def _run(self, left, right, direction="backward", num_buckets=None):
        import ray.data as rd
        from graph_data_science_ray import asof_join
        res = asof_join(rd.from_arrow(left), rd.from_arrow(right),
                        on="user_id", left_ts="ts", right_ts="ts",
                        right_cols=["event_id", "ts"], direction=direction,
                        num_buckets=num_buckets)
        return _to_table(res)

    def _oracle(self, left, right, op):
        con = duckdb.connect()
        con.register("l", left)
        con.register("r", right)
        return con.execute(f"""
            SELECT l.event_id, l.ts, l.user_id, l.event_type, l.value,
                   r.event_id AS event_id_r, r.ts AS ts_r
            FROM l ASOF JOIN r ON l.user_id = r.user_id AND l.ts {op} r.ts
        """).arrow()

    def test_backward_matches_duckdb(self):
        ev = _events()
        right = ev.filter(pa.compute.equal(ev.column("event_type"), "click")) \
            .select(["event_id", "ts", "user_id"])
        got = self._run(ev, right)
        exp = self._oracle(ev, right, ">=")
        _assert_tables_equal(got, exp)

    def test_forward_matches_duckdb(self):
        ev = _events(seed=11)
        right = ev.filter(pa.compute.equal(ev.column("event_type"), "buy")) \
            .select(["event_id", "ts", "user_id"])
        got = self._run(ev, right, direction="forward")
        exp = self._oracle(ev, right, "<=")
        _assert_tables_equal(got, exp)

    def test_bucket_count_invariance(self):
        ev = _events(seed=3)
        right = ev.filter(pa.compute.equal(ev.column("event_type"), "view")) \
            .select(["event_id", "ts", "user_id"])
        a = self._run(ev, right, num_buckets=1)
        b = self._run(ev, right, num_buckets=7)
        _assert_tables_equal(a, b)

    def test_empty_right_side(self):
        import ray.data as rd
        from graph_data_science_ray import asof_join
        ev = _events(n=50)
        right = ev.slice(0, 0).select(["event_id", "ts", "user_id"])
        res = asof_join(rd.from_arrow(ev), rd.from_arrow(right),
                        on="user_id", right_cols=["event_id", "ts"])
        assert _to_table(res).num_rows == 0  # inner semantics


class TestRangeJoin:
    def test_disjoint_bands(self):
        import ray.data as rd
        from graph_data_science_ray import range_join
        rng = np.random.default_rng(5)
        t = pa.table({"k": np.arange(1000, dtype=np.int64),
                      "v": rng.random(1000) * 10})
        bands = pa.table({"band": ["a", "b", "c"],
                          "lo": [0.0, 2.0, 5.0], "hi": [2.0, 5.0, 8.0]})
        got = _to_table(range_join(rd.from_arrow(t), bands, "v"))
        con = duckdb.connect()
        con.register("t", t)
        exp = con.execute("""
            SELECT t.k, t.v, b.band
            FROM t JOIN (VALUES ('a',0.0,2.0),('b',2.0,5.0),('c',5.0,8.0))
                        b(band, lo, hi)
            ON t.v >= b.lo AND t.v < b.hi""").arrow()
        _assert_tables_equal(got, exp)

    def test_overlapping_bands_emit_multiple(self):
        import ray.data as rd
        from graph_data_science_ray import range_join
        t = pa.table({"k": np.arange(100, dtype=np.int64),
                      "v": np.linspace(0, 9.99, 100)})
        bands = pa.table({"band": ["wide", "narrow"],
                          "lo": [0.0, 4.0], "hi": [10.0, 6.0]})
        got = _to_table(range_join(rd.from_arrow(t), bands, "v"))
        con = duckdb.connect()
        con.register("t", t)
        exp = con.execute("""
            SELECT t.k, t.v, b.band
            FROM t JOIN (VALUES ('wide',0.0,10.0),('narrow',4.0,6.0))
                        b(band, lo, hi)
            ON t.v >= b.lo AND t.v < b.hi""").arrow()
        assert got.num_rows > 100  # overlap duplicates rows
        _assert_tables_equal(got, exp)


class TestTopKPerGroup:
    def test_matches_window_function(self):
        import ray.data as rd
        from graph_data_science_ray import top_k_per_group
        rng = np.random.default_rng(9)
        t = pa.table({"doc_id": np.arange(500, dtype=np.int64),
                      "lang": pa.array(rng.choice(["en", "de", "fr", "es"], 500)),
                      "n": rng.integers(0, 50, 500).astype(np.int64)})
        got = _to_table(top_k_per_group(rd.from_arrow(t), "lang", "n", 5,
                                        tiebreak="doc_id"))
        con = duckdb.connect()
        con.register("t", t)
        exp = con.execute("""
            SELECT doc_id, lang, n FROM (
              SELECT *, row_number() OVER
                 (PARTITION BY lang ORDER BY n DESC, doc_id) rn FROM t)
            WHERE rn <= 5""").arrow()
        _assert_tables_equal(got.select(["doc_id", "lang", "n"]), exp)

    def test_smallest_and_int_groups(self):
        import ray.data as rd
        from graph_data_science_ray import top_k_per_group
        rng = np.random.default_rng(2)
        t = pa.table({"id": np.arange(300, dtype=np.int64),
                      "g": rng.integers(0, 10, 300).astype(np.int64),
                      "v": rng.random(300)})
        got = _to_table(top_k_per_group(rd.from_arrow(t), "g", "v", 2,
                                        largest=False, tiebreak="id"))
        con = duckdb.connect()
        con.register("t", t)
        exp = con.execute("""
            SELECT id, g, v FROM (
              SELECT *, row_number() OVER
                 (PARTITION BY g ORDER BY v ASC, id) rn FROM t)
            WHERE rn <= 2""").arrow()
        _assert_tables_equal(got.select(["id", "g", "v"]), exp)

    def test_k_exceeds_group_size(self):
        import ray.data as rd
        from graph_data_science_ray import top_k_per_group
        t = pa.table({"id": np.arange(6, dtype=np.int64),
                      "g": pa.array(["x", "x", "y", "y", "y", "z"]),
                      "v": np.arange(6, dtype=np.float64)})
        got = _to_table(top_k_per_group(rd.from_arrow(t), "g", "v", 100,
                                        tiebreak="id"))
        assert got.num_rows == 6  # everything survives


class TestGroupedQuantiles:
    def test_matches_quantile_cont(self):
        import ray.data as rd
        from graph_data_science_ray import grouped_quantiles
        rng = np.random.default_rng(4)
        t = pa.table({"g": pa.array(rng.choice(["a", "b", "c"], 2000)),
                      "v": rng.random(2000) * 100})
        got = _to_table(grouped_quantiles(rd.from_arrow(t), "g", "v",
                                          (0.1, 0.5, 0.9)))
        con = duckdb.connect()
        con.register("t", t)
        exp = con.execute("""
            SELECT g, 0.1 AS q, quantile_cont(v, 0.1) AS value FROM t GROUP BY 1
            UNION ALL
            SELECT g, 0.5, quantile_cont(v, 0.5) FROM t GROUP BY 1
            UNION ALL
            SELECT g, 0.9, quantile_cont(v, 0.9) FROM t GROUP BY 1""").arrow()
        _assert_tables_equal(got, exp, float_cols=("q", "value"))

    def test_int_group_column(self):
        import ray.data as rd
        from graph_data_science_ray import grouped_quantiles
        rng = np.random.default_rng(8)
        t = pa.table({"g": rng.integers(0, 5, 500).astype(np.int64),
                      "v": rng.random(500)})
        got = _to_table(grouped_quantiles(rd.from_arrow(t), "g", "v", (0.5,)))
        con = duckdb.connect()
        con.register("t", t)
        exp = con.execute("SELECT g, 0.5 AS q, quantile_cont(v, 0.5) AS value "
                          "FROM t GROUP BY 1").arrow()
        _assert_tables_equal(got, exp, float_cols=("q", "value"))


class TestHoppingWindow:
    def test_matches_duckdb(self):
        import ray.data as rd
        from graph_data_science_ray import hopping_window
        ev = _events(n=600, seed=13)
        got = _to_table(hopping_window(rd.from_arrow(ev), 3600, 1800))
        con = duckdb.connect()
        con.register("events", ev)
        exp = con.execute("""
            SELECT ((epoch_us(ts)//1800000000) - i) * 1800000000 AS window_us,
                   count(*)::BIGINT AS n_events, sum(value) AS sum_value
            FROM events, range(2) r(i) GROUP BY 1""").arrow()
        _assert_tables_equal(got, exp, float_cols=("sum_value",))

    def test_size_must_align(self):
        import ray.data as rd
        from graph_data_science_ray import hopping_window
        with pytest.raises(ValueError):
            hopping_window(rd.from_arrow(_events(n=10)), 3600, 1000)

    def test_each_event_in_k_windows(self):
        import ray.data as rd
        from graph_data_science_ray import hopping_window
        ev = _events(n=200, seed=1)
        got = _to_table(hopping_window(rd.from_arrow(ev), 7200, 1800))  # k=4
        total = sum(got.column("n_events").to_pylist())
        assert total == 200 * 4


class TestVocabTopTerms:
    def test_matches_duckdb(self):
        import ray.data as rd
        from graph_data_science_ray import vocab_top_terms
        rng = np.random.default_rng(6)
        words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]
        texts = [" ".join(rng.choice(words, rng.integers(3, 30)))
                 for _ in range(300)]
        docs = pa.table({"text": pa.array(texts)})
        got = vocab_top_terms(rd.from_arrow(docs), 4)
        con = duckdb.connect()
        con.register("documents", docs)
        exp = con.execute("""
            WITH toks AS (SELECT unnest(string_split(lower(text), ' ')) term
                          FROM documents)
            SELECT term, count(*)::BIGINT AS cnt FROM toks WHERE term <> ''
            GROUP BY term ORDER BY cnt DESC, term LIMIT 4""").arrow()
        _assert_tables_equal(got, exp)

    def test_tie_break_is_lexicographic(self):
        import ray.data as rd
        from graph_data_science_ray import vocab_top_terms
        docs = pa.table({"text": pa.array(["b a", "a b", "c c"])})
        got = vocab_top_terms(rd.from_arrow(docs), 2)
        # counts: a=2, b=2, c=2 -> keep 'a', 'b' (lexicographic at the cut)
        assert sorted(got.column("term").to_pylist()) == ["a", "b"]


class TestReviewRegressions:
    """Round-5 review fixes: null keys/timestamps, ns alignment, big ints."""

    def test_hopping_unaligned_ns_timestamps(self):
        """Nanosecond timestamps not aligned to whole microseconds must not
        abort the job (safe-cast regression)."""
        import ray.data as rd
        from graph_data_science_ray import hopping_window
        ts = pa.array(np.array([1_000_000_123, 3_600_000_000_456],
                               dtype="datetime64[ns]"))
        ev = pa.table({"ts": ts, "value": pa.array([1.0, 2.0])})
        got = _to_table(hopping_window(rd.from_arrow(ev), 3600, 1800))
        assert sum(got.column("n_events").to_pylist()) == 4  # k=2 each

    def test_asof_null_timestamps_dropped(self):
        """A null merge key must drop that row (inner semantics), not abort
        the bucket task (pd.merge_asof raises on null keys)."""
        import ray.data as rd
        from graph_data_science_ray import asof_join
        left = pa.table({"user_id": pa.array([1, 1], pa.int64()),
                         "ts": pa.array([10, None], pa.int64()),
                         "x": pa.array([5, 6], pa.int64())})
        right = pa.table({"user_id": pa.array([1, 1], pa.int64()),
                          "ts": pa.array([9, None], pa.int64()),
                          "y": pa.array([7, 8], pa.int64())})
        out = _to_table(asof_join(rd.from_arrow(left), rd.from_arrow(right),
                                  on="user_id", right_cols=["y"],
                                  num_buckets=2))
        assert out.num_rows == 1
        assert out.column("x").to_pylist() == [5]
        assert out.column("y").to_pylist() == [7]

    def test_asof_large_int64_carry_exact(self):
        """Right-side int64 values above 2^53 must survive exactly even when
        the bucket has unmatched left rows (the float64 round-trip silently
        corrupted them before)."""
        import ray.data as rd
        from graph_data_science_ray import asof_join
        big = 2**60 + 1
        left = pa.table({"user_id": pa.array([1, 1], pa.int64()),
                         "ts": pa.array([10, 1], pa.int64())})  # ts=1 unmatched
        right = pa.table({"user_id": pa.array([1], pa.int64()),
                          "ts": pa.array([9], pa.int64()),
                          "big_id": pa.array([big], pa.int64())})
        out = _to_table(asof_join(rd.from_arrow(left), rd.from_arrow(right),
                                  on="user_id", right_cols=["big_id"],
                                  num_buckets=2))
        assert out.column("big_id").to_pylist() == [big]

    def test_null_bucket_key_raises(self):
        from graph_data_science_ray.functions.relational import \
            _col_bucket_values
        col = pa.chunked_array([pa.array([1, None], pa.int64())])
        with pytest.raises(ValueError, match="null"):
            _col_bucket_values(col, 4)
        scol = pa.chunked_array([pa.array(["a", None])])
        with pytest.raises(ValueError, match="null"):
            _col_bucket_values(scol, 4)

    def test_model_catalog_load_requires_base_dir(self):
        from graph_data_science_ray.state.models import ModelCatalog
        with pytest.raises(ValueError, match="base_dir"):
            ModelCatalog().load("m")


class TestRollingAgg:
    def _run(self, t, window, nparts=6, **kw):
        import ray.data
        from graph_data_science_ray.functions.relational import rolling_agg
        ds = ray.data.from_arrow(t).repartition(nparts)
        out = rolling_agg(ds, partition_col="user_id", order_col="ts",
                          value_col="value", window=window,
                          tiebreak="event_id", round_digits=6, **kw)
        return _to_table(out)

    def _oracle(self, t, window):
        con = duckdb.connect()
        con.register("ev", t)
        return con.sql(f"""
            SELECT event_id, user_id, ts, value,
                   count(*) OVER w AS roll_cnt,
                   round(sum(value) OVER w, 6) AS roll_sum,
                   round(min(value) OVER w, 6) AS roll_min,
                   round(max(value) OVER w, 6) AS roll_max,
                   round(avg(value) OVER w, 6) AS roll_avg
            FROM ev WINDOW w AS (
              PARTITION BY user_id ORDER BY ts, event_id
              ROWS BETWEEN {window - 1} PRECEDING AND CURRENT ROW)
            ORDER BY event_id""").arrow()

    def _tab(self, n=1500, keys=40, seed=3):
        rng = np.random.default_rng(seed)
        return pa.table({
            "event_id": np.arange(n, dtype=np.int64),
            "user_id": rng.integers(0, keys, n).astype(np.int64),
            "ts": rng.integers(0, 500, n).astype(np.int64),  # many ties
            "value": rng.normal(50, 30, n)})

    def test_matches_duckdb(self):
        t = self._tab()
        got = self._run(t, window=5).sort_by("event_id")
        exp = self._oracle(t, window=5)
        _assert_tables_equal(got, exp)

    def test_window_one_is_identity(self):
        t = self._tab(n=300, keys=7)
        got = self._run(t, window=1).sort_by("event_id")
        v = got.column("value").to_numpy()
        from graph_data_science_ray.functions.compat import round_half_away
        np.testing.assert_array_equal(got.column("roll_sum").to_numpy(),
                                      round_half_away(v, 6))
        assert (got.column("roll_cnt").to_numpy() == 1).all()

    def test_window_exceeds_partition(self):
        # window larger than any key's row count == unbounded-preceding frame
        t = self._tab(n=200, keys=50)
        got = self._run(t, window=1000).sort_by("event_id")
        exp = self._oracle(t, window=1000)
        _assert_tables_equal(got, exp)

    def test_partition_layout_invariance(self):
        t = self._tab(n=600, keys=11)
        a = self._run(t, window=4, nparts=2).sort_by("event_id")
        b = self._run(t, window=4, nparts=13).sort_by("event_id")
        _assert_tables_equal(a, b)

    def test_rejects_bad_window_and_null_values(self):
        import ray.data
        from graph_data_science_ray.functions.relational import rolling_agg
        t = self._tab(n=50, keys=3)
        with pytest.raises(ValueError, match="window"):
            rolling_agg(ray.data.from_arrow(t), partition_col="user_id",
                        order_col="ts", value_col="value", window=0)
        tn = t.set_column(t.schema.get_field_index("value"), "value",
                          pa.array([None] * t.num_rows, pa.float64()))
        with pytest.raises(Exception, match="null"):
            _to_table(rolling_agg(ray.data.from_arrow(tn),
                                  partition_col="user_id", order_col="ts",
                                  value_col="value", window=3))


class TestRollingRangeAgg:
    def _tab(self, n=2000, keys=30, seed=9):
        rng = np.random.default_rng(seed)
        return pa.table({
            "event_id": np.arange(n, dtype=np.int64),
            "user_id": rng.integers(0, keys, n).astype(np.int64),
            "ts": rng.integers(0, 1000, n).astype(np.int64),  # dense: many ties
            "value": rng.normal(5, 2, n)})

    def _run(self, t, interval, nparts=5):
        import ray.data
        from graph_data_science_ray.functions.relational import (
            rolling_range_agg)
        out = rolling_range_agg(ray.data.from_arrow(t).repartition(nparts),
                                partition_col="user_id", ts_col="ts",
                                value_col="value", interval_us=interval,
                                round_digits=6)
        return _to_table(out).select(
            ["event_id", "roll_cnt", "roll_sum", "roll_avg"]) \
            .sort_by("event_id")

    def test_matches_duckdb_range_frames_with_ties(self):
        t = self._tab()
        got = self._run(t, 100)
        con = duckdb.connect()
        con.register("ev", t)
        exp = con.sql("""
            SELECT event_id, count(*) OVER w AS roll_cnt,
                   round(sum(value) OVER w, 6) AS roll_sum,
                   round(avg(value) OVER w, 6) AS roll_avg
            FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts
              RANGE BETWEEN 100 PRECEDING AND CURRENT ROW)
            ORDER BY event_id""").arrow()
        _assert_tables_equal(got, exp)

    def test_zero_interval_counts_exactly_the_peers(self):
        t = self._tab(n=500, keys=5)
        got = self._run(t, 0)
        # frame = all rows of the key sharing this exact ts
        df = t.to_pandas()
        peers = df.groupby(["user_id", "ts"])["value"].transform("count")
        got_by_eid = got.to_pandas().set_index("event_id")["roll_cnt"]
        assert (got_by_eid.loc[df["event_id"]].to_numpy()
                == peers.to_numpy()).all()

    def test_row_order_independence_with_ties(self):
        t = self._tab(n=800, keys=7)
        perm = np.random.default_rng(1).permutation(800)
        t2 = t.take(pa.array(perm, type=pa.int64()))
        a = self._run(t, 50, nparts=2)
        b = self._run(t2, 50, nparts=11)
        _assert_tables_equal(a, b)

    def test_validation(self):
        import ray.data
        from graph_data_science_ray.functions.relational import (
            rolling_range_agg)
        with pytest.raises(ValueError, match="interval_us"):
            rolling_range_agg(ray.data.from_arrow(self._tab(n=10)),
                              partition_col="user_id", ts_col="ts",
                              value_col="value", interval_us=-1)


class TestGroupedAgg:
    def _tab(self, n=5000, seed=4):
        rng = np.random.default_rng(seed)
        return pa.table({
            "g": pa.array([f"g{i}" for i in rng.integers(0, 7, n)]),
            "k": rng.integers(0, 20, n).astype(np.int64),
            "v": rng.normal(3, 1, n),
            "q": rng.integers(-5, 50, n).astype(np.int64)})

    def test_matches_duckdb_multi_key_multi_agg(self):
        import ray.data
        from graph_data_science_ray.functions.relational import grouped_agg
        t = self._tab()
        out = _to_table(grouped_agg(
            ray.data.from_arrow(t).repartition(6), ["g", "k"],
            {"v": ("sum", "min", "max", "mean", "count"),
             "q": ("sum", "min")}, round_digits=6))
        con = duckdb.connect()
        con.register("t", t)
        exp = con.sql("""
            SELECT g, k, round(sum(v),6) AS sum_v, round(min(v),6) AS min_v,
                   round(max(v),6) AS max_v, round(avg(v),6) AS mean_v,
                   count(v) AS count_v, sum(q) AS sum_q, min(q) AS min_q
            FROM t GROUP BY 1,2""").arrow()
        _assert_tables_equal(out, exp)

    def test_integer_sums_exact_and_layout_invariant(self):
        import ray.data
        from graph_data_science_ray.functions.relational import grouped_agg
        t = self._tab(n=2000)
        a = _to_table(grouped_agg(ray.data.from_arrow(t).repartition(2),
                                  "g", {"q": "sum"}, num_buckets=3))
        b = _to_table(grouped_agg(ray.data.from_arrow(t).repartition(13),
                                  "g", {"q": "sum"}, num_buckets=17))
        _assert_tables_equal(a, b)
        assert a.column("sum_q").type == pa.int64()

    def test_validation(self):
        import ray.data
        from graph_data_science_ray.functions.relational import grouped_agg
        ds = ray.data.from_arrow(self._tab(n=20))
        with pytest.raises(ValueError, match="unknown aggregate"):
            grouped_agg(ds, "g", {"v": "median"})
        with pytest.raises(ValueError, match="not in schema"):
            grouped_agg(ds, "g", {"nope": "sum"})
        with pytest.raises(ValueError, match="at least one"):
            grouped_agg(ds, "g", {})


class TestDistinct:
    def test_matches_duckdb_and_layout_invariant(self):
        import ray.data
        from graph_data_science_ray.functions.relational import distinct
        rng = np.random.default_rng(6)
        n = 8000
        t = pa.table({"a": pa.array([f"s{i}" for i in
                                     rng.integers(0, 12, n)]),
                      "b": rng.integers(0, 30, n).astype(np.int64),
                      "c": rng.normal(size=n)})
        got = _to_table(distinct(ray.data.from_arrow(t).repartition(7),
                                 ["a", "b"]))
        con = duckdb.connect()
        con.register("t", t)
        exp = con.sql("SELECT DISTINCT a, b FROM t").arrow()
        _assert_tables_equal(got, exp)
        got2 = _to_table(distinct(ray.data.from_arrow(t).repartition(2),
                                  ["a", "b"], num_buckets=5))
        _assert_tables_equal(got, got2)

    def test_single_column_and_validation(self):
        import ray.data
        from graph_data_science_ray.functions.relational import distinct
        t = pa.table({"x": pa.array([3, 1, 3, 2, 1], pa.int64())})
        got = _to_table(distinct(ray.data.from_arrow(t), "x"))
        assert sorted(got.column("x").to_pylist()) == [1, 2, 3]
        with pytest.raises(ValueError, match="at least one"):
            distinct(ray.data.from_arrow(t), [])
        with pytest.raises(ValueError, match="not in schema"):
            distinct(ray.data.from_arrow(t), "zzz")
