"""Hypothesis property tests for the pure (non-Ray) kernels behind the
relational/link-prediction operators — randomized edge cases (ties, empty
groups, singletons, duplicate keys) beyond the fixed-seed suites."""

import numpy as np
import pyarrow as pa
from hypothesis import given, settings, strategies as st


small_ints = st.integers(min_value=0, max_value=9)


@st.composite
def grouped_rows(draw, max_rows=60):
    n = draw(st.integers(min_value=0, max_value=max_rows))
    g = draw(st.lists(small_ints, min_size=n, max_size=n))
    v = draw(st.lists(st.integers(min_value=-50, max_value=50),
                      min_size=n, max_size=n))
    return np.asarray(g, dtype=np.int64), np.asarray(v, dtype=np.int64)


class TestTopKKernel:
    @settings(max_examples=60, deadline=None)
    @given(grouped_rows(), st.integers(min_value=1, max_value=5),
           st.booleans())
    def test_matches_brute_force(self, rows, k, largest):
        from graph_data_science_ray.functions.relational import _topk_kernel
        g, v = rows
        ids = np.arange(g.shape[0], dtype=np.int64)
        t = pa.table({"g": g, "v": v, "id": ids})
        got = _topk_kernel(t, "g", "v", k, largest, "id")
        # brute force: per group sort by (v desc/asc, id asc), take k
        expect = set()
        for grp in np.unique(g):
            members = [(v[i], i) for i in np.nonzero(g == grp)[0]]
            members.sort(key=lambda x: (-x[0] if largest else x[0], x[1]))
            expect.update(i for _, i in members[:k])
        assert set(got.column("id").to_pylist()) == expect

    @settings(max_examples=30, deadline=None)
    @given(grouped_rows())
    def test_k_one_is_group_extreme(self, rows):
        from graph_data_science_ray.functions.relational import _topk_kernel
        g, v = rows
        t = pa.table({"g": g, "v": v,
                      "id": np.arange(g.shape[0], dtype=np.int64)})
        got = _topk_kernel(t, "g", "v", 1, True, "id")
        for grp, val in zip(got.column("g").to_pylist(),
                            got.column("v").to_pylist()):
            assert val == v[g == grp].max()


@st.composite
def digraph(draw, max_n=12):
    n = draw(st.integers(min_value=2, max_value=max_n))
    m = draw(st.integers(min_value=0, max_value=3 * n))
    edges = draw(st.lists(
        st.tuples(st.integers(0, n - 1), st.integers(0, n - 1)),
        min_size=m, max_size=m))
    edges = sorted({(a, b) for a, b in edges if a != b})
    return n, edges


class TestLinkPredKernel:
    @settings(max_examples=60, deadline=None)
    @given(digraph())
    def test_multi_matches_set_brute_force(self, g):
        from graph_data_science_ray.functions.linkpred import \
            _pair_scores_multi
        n, edges = g
        src = np.asarray([e[0] for e in edges], dtype=np.int64)
        dst = np.asarray([e[1] for e in edges], dtype=np.int64)
        # out-direction CSR of the (already deduped, loop-free) edge list
        order = np.lexsort((dst, src))
        s, d = src[order], dst[order]
        indptr = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(np.bincount(s, minlength=n), out=indptr[1:])
        degrees = np.diff(indptr)
        out_sets = [set() for _ in range(n)]
        for a, b in edges:
            out_sets[a].add(b)
        # every ordered pair, incl. a == b
        aa, bb = np.meshgrid(np.arange(n), np.arange(n))
        a_arr = aa.ravel().astype(np.int64)
        b_arr = bb.ravel().astype(np.int64)
        got = _pair_scores_multi(indptr, d, degrees, a_arr, b_arr,
                                 ["common_neighbors", "total_neighbors",
                                  "preferential_attachment"])
        for i, (x, y) in enumerate(zip(a_arr, b_arr)):
            common = len(out_sets[x] & out_sets[y]) if x != y else 0
            total = (len(out_sets[x] | out_sets[y]) if x != y
                     else len(out_sets[x]))
            assert got["common_neighbors"][i] == common, (x, y)
            assert got["total_neighbors"][i] == total, (x, y)
            assert got["preferential_attachment"][i] == \
                len(out_sets[x]) * len(out_sets[y])


class TestHoppingMath:
    @settings(max_examples=40, deadline=None)
    @given(st.lists(st.integers(min_value=0, max_value=10**9),
                    min_size=0, max_size=50),
           st.sampled_from([(3600, 1800), (7200, 1800), (3600, 3600)]))
    def test_every_event_in_exactly_k_windows(self, ts_seconds, sz):
        size_s, slide_s = sz
        k = size_s // slide_s
        ts = np.asarray(ts_seconds, dtype=np.int64) * 1_000_000
        slide_us = np.int64(slide_s) * 1_000_000
        base = (ts // slide_us) * slide_us
        ws = (base[None, :] - (np.arange(k, dtype=np.int64)[:, None]
                               * slide_us))
        # membership: ws <= ts < ws + size
        size_us = np.int64(size_s) * 1_000_000
        ok = (ws <= ts[None, :]) & (ts[None, :] < ws + size_us)
        assert ok.all()  # every replica window truly contains its event
        # and no other aligned window does
        total_windows = np.unique(
            np.concatenate([ws.ravel(), ws.ravel() + slide_us]))
        for t in ts:
            n_in = int(((total_windows <= t)
                        & (t < total_windows + size_us)).sum())
            assert n_in <= k


class TestSessionizeKernel:
    @settings(max_examples=40, deadline=None)
    @given(st.lists(st.tuples(st.integers(0, 3),
                              st.integers(0, 10**6)),
                    min_size=0, max_size=60))
    def test_sessions_partition_events(self, rows):
        # the NumPy gap-scan must assign every event to exactly one session
        # and sessions must not overlap per user
        gap_s = 100.0
        u = np.asarray([r[0] for r in rows], dtype=np.int64)
        ts = (np.asarray([r[1] for r in rows], dtype=np.int64)
              * 1_000_000_000)
        if len(rows) == 0:
            return
        import pyarrow as pa
        from graph_data_science_ray.pipelines.windows import sessionize
        import ray.data as rd
        t = pa.table({"user_id": u,
                      "ts": ts.view("datetime64[ns]"),
                      "value": np.ones(u.shape[0])})
        out = sessionize(rd.from_arrow(t), gap_seconds=gap_s)
        import ray
        tabs = [x for x in ray.get(out.to_arrow_refs()) if x.num_rows]
        tot = sum(int(x.column("n_events").to_numpy().sum()) for x in tabs)
        assert tot == u.shape[0]


class TestSplitmixBuckets:
    @settings(max_examples=30, deadline=None)
    @given(st.lists(st.integers(min_value=0, max_value=2**40),
                    min_size=1, max_size=200),
           st.integers(min_value=1, max_value=64))
    def test_bucket_range_and_determinism(self, keys, P):
        from graph_data_science_ray.functions.relational import \
            _col_bucket_values
        col = pa.chunked_array([pa.array(keys, type=pa.int64())])
        b1 = _col_bucket_values(col, P)
        b2 = _col_bucket_values(col, P)
        assert (b1 == b2).all()
        assert b1.min() >= 0 and b1.max() < P
        # equal keys always land in the same bucket
        import collections
        seen = collections.defaultdict(set)
        for k, b in zip(keys, b1):
            seen[k].add(int(b))
        assert all(len(v) == 1 for v in seen.values())
