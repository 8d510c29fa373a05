"""Triangle count + LCC conformance (FIXTURES.md §5)."""

import numpy as np
import pytest

from graph_data_science_ray import Graph, local_clustering_coefficient, triangle_count


def counts(res):
    return res.table.column("triangles").to_numpy(zero_copy_only=False)


class TestShapes:
    """IntersectingTriangleCountTest.java:42-106 families (UNDIRECTED)."""

    def test_line(self):
        g = Graph.from_edge_list([("a", "b"), ("b", "c")], orientation="undirected")
        res = triangle_count(g, execution="local")
        assert res.global_count == 0
        assert counts(res).tolist() == [0, 0, 0]

    def test_no_edges(self):
        g = Graph(3, np.array([], dtype=np.int64), np.array([], dtype=np.int64))
        res = triangle_count(g, execution="local")
        assert res.global_count == 0

    def test_single_edge_and_parallel(self):
        g = Graph.from_edge_list([("a", "b"), ("a", "b"), ("b", "a")],
                                 orientation="undirected")
        res = triangle_count(g, execution="local")
        assert res.global_count == 0

    @pytest.mark.parametrize("k", [1, 2, 4, 8, 100])
    def test_independent_triangles(self, k):
        src, dst = [], []
        for i in range(k):
            a, b, c = 3 * i, 3 * i + 1, 3 * i + 2
            src += [a, b, c]
            dst += [b, c, a]
        g = Graph.from_edges(src, dst, n=3 * k, orientation="undirected")
        res = triangle_count(g, execution="local")
        assert res.global_count == k
        assert np.all(counts(res) == 1)

    def test_clique5(self):
        src, dst = [], []
        for i in range(5):
            for j in range(i + 1, 5):
                src.append(i)
                dst.append(j)
        g = Graph.from_edges(src, dst, n=5, orientation="undirected")
        res = triangle_count(g, execution="local")
        assert res.global_count == 10
        assert np.all(counts(res) == 6)


DOC_EDGES = [("michael", "karin"), ("michael", "chris"), ("will", "michael"),
             ("mark", "michael"), ("mark", "will"), ("alice", "michael"),
             ("will", "chris"), ("chris", "karin")]
DOC_NODES = sorted({a for e in DOC_EDGES for a in e})


class TestDocExample:
    def graph(self):
        return Graph.from_edge_list(DOC_EDGES, nodes=DOC_NODES,
                                    orientation="undirected")

    def test_counts(self):
        res = triangle_count(self.graph(), execution="local")
        got = dict(zip(DOC_NODES, counts(res)))
        assert got == {"michael": 3, "chris": 2, "will": 2, "karin": 1,
                       "mark": 1, "alice": 0}
        assert res.global_count == 3

    def test_max_degree_exclusion(self):
        # michael (degree 5) excluded → -1; everyone else 0
        # (triangle-count.adoc:447-466, IntersectingTriangleCount.java:162-166)
        res = triangle_count(self.graph(), max_degree=4, execution="local")
        got = dict(zip(DOC_NODES, counts(res)))
        assert got["michael"] == -1
        assert all(got[k] == 0 for k in DOC_NODES if k != "michael")

    def test_max_degree_validation(self):
        with pytest.raises(ValueError):
            triangle_count(self.graph(), max_degree=1)

    def test_ray_mode(self):
        res = triangle_count(self.graph(), execution="ray", num_partitions=2)
        got = dict(zip(DOC_NODES, counts(res)))
        assert got == {"michael": 3, "chris": 2, "will": 2, "karin": 1,
                       "mark": 1, "alice": 0}
        assert res.global_count == 3

    def test_lcc(self):
        t, avg = local_clustering_coefficient(self.graph(), execution="local")
        got = dict(zip(DOC_NODES, t.column("coefficient").to_numpy()))
        # C(michael) = 2*3/(5*4) = 0.3; C(karin) = 2*1/(2*1) = 1.0
        assert got["michael"] == pytest.approx(0.3)
        assert got["karin"] == pytest.approx(1.0)
        assert got["alice"] == 0.0
        assert avg == pytest.approx(np.mean(list(got.values())))


class TestRandomizedVsBruteForce:
    def test_vs_n3_oracle(self):
        rng = np.random.default_rng(11)
        for trial in range(4):
            n = int(rng.integers(10, 40))
            m = int(rng.integers(5, 120))
            src = rng.integers(0, n, m)
            dst = rng.integers(0, n, m)
            g = Graph.from_edges(src, dst, n=n, orientation="undirected")
            res = triangle_count(g, execution="local")
            # O(n^3) brute force on the dedup'd adjacency matrix
            A = np.zeros((n, n), dtype=bool)
            A[src, dst] = True
            A[dst, src] = True
            np.fill_diagonal(A, False)
            per_node = np.zeros(n, dtype=int)
            total = 0
            for a in range(n):
                for b in range(a + 1, n):
                    if not A[a, b]:
                        continue
                    for c in range(b + 1, n):
                        if A[a, c] and A[b, c]:
                            total += 1
                            per_node[[a, b, c]] += 1
            assert res.global_count == total, trial
            assert np.array_equal(counts(res), per_node), trial


def test_bucketed_edge_key_mode_matches():
    """The 100 TB degradation path (hash-bucketed wedge-edge matching) counts
    identically to the broadcast path."""
    import numpy as np

    from graph_data_science_ray import Graph, triangle_count
    rng = np.random.default_rng(61)
    n, m = 400, 3000
    g = Graph.from_edges(rng.integers(0, n, m), rng.integers(0, n, m), n=n,
                         orientation="undirected", aggregation="single")
    a = triangle_count(g, execution="ray", num_partitions=4)
    b = triangle_count(g, execution="ray", num_partitions=4,
                       edge_key_mode="bucketed")
    assert a.global_count == b.global_count
    assert np.array_equal(
        a.table.column("triangles").to_numpy(zero_copy_only=False),
        b.table.column("triangles").to_numpy(zero_copy_only=False))


def test_streaming_triangle_count_matches():
    """Fully streaming prep (Dataset → bucketed dedup → layout → spec-loading
    wedge workers → union-grouped key match) equals the in-memory path."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from graph_data_science_ray import Graph, triangle_count
    from graph_data_science_ray.pipelines.triangles import (
        triangle_count_streaming)
    rng = np.random.default_rng(62)
    n, m = 500, 4000
    src = rng.integers(0, n, m)
    dst = rng.integers(0, n, m)
    g = Graph.from_edges(src, dst, n=n, orientation="undirected",
                         aggregation="single")
    ref = triangle_count(g, execution="local")
    ds = ray.data.from_arrow(pa.table({"src": src, "dst": dst})).repartition(8)
    got = triangle_count_streaming(ds, n=n, num_partitions=4)
    assert got.global_count == ref.global_count
    assert np.array_equal(
        got.table.column("triangles").to_numpy(zero_copy_only=False),
        ref.table.column("triangles").to_numpy(zero_copy_only=False))


def test_streaming_triangle_count_from_parquet_graph(tmp_path):
    import numpy as np

    from graph_data_science_ray import Graph, ParquetGraph, triangle_count
    from graph_data_science_ray.pipelines.triangles import (
        triangle_count_streaming)
    rng = np.random.default_rng(63)
    n, m = 300, 2000
    g = Graph.from_edges(rng.integers(0, n, m), rng.integers(0, n, m), n=n,
                         aggregation="single")
    g.save(str(tmp_path / "g"), num_partitions=3)
    pg = ParquetGraph(str(tmp_path / "g"))
    ref = triangle_count(g, execution="local")
    got = triangle_count_streaming(pg, num_partitions=4,
                                   work_dir=str(tmp_path / "tc"))
    assert got.global_count == ref.global_count
    assert np.array_equal(
        got.table.column("triangles").to_numpy(zero_copy_only=False),
        ref.table.column("triangles").to_numpy(zero_copy_only=False))


def test_ray_default_is_streaming_and_matches_local():
    """execution="ray" without edge_key_mode routes through the streaming
    prep (no driver |E| arrays) and is bit-equal to the local kernel,
    including maxDegree exclusion (-1 sentinels)."""
    import numpy as np

    from graph_data_science_ray import Graph, triangle_count
    rng = np.random.default_rng(64)
    n, m = 400, 5000
    # power-law-ish: hub 0 attracts extra edges
    src = np.concatenate([rng.integers(0, n, m), np.zeros(150, np.int64)])
    dst = np.concatenate([rng.integers(0, n, m), rng.integers(1, n, 150)])
    g = Graph.from_edges(src, dst, n=n, orientation="undirected",
                         aggregation="single")
    for md in (None, 8, 40):
        ref = triangle_count(g, execution="local", max_degree=md)
        got = triangle_count(g, execution="ray", num_partitions=4,
                             max_degree=md, streaming_threshold=0)
        assert got.global_count == ref.global_count, md
        assert np.array_equal(
            got.table.column("triangles").to_numpy(zero_copy_only=False),
            ref.table.column("triangles").to_numpy(zero_copy_only=False)), md
    # exclusion actually happened: the hub reports -1
    res = triangle_count(g, execution="ray", max_degree=8, num_partitions=4,
                         streaming_threshold=0)
    tri = res.table.column("triangles").to_numpy(zero_copy_only=False)
    assert (tri == -1).any()
    # default routing: small |E| under execution="ray" takes the bucketed
    # in-memory-prep DISTRIBUTED kernel (edge_key_mode="bucketed",
    # triangles.py:138) — results unchanged
    small = triangle_count(g, execution="ray", num_partitions=4)
    assert small.global_count == triangle_count(g, execution="local").global_count


def test_streaming_reused_work_dir_drops_stale_partitions(tmp_path):
    """Round-2 ADVICE: a reused work_dir must not leak a previous run's
    partition files into a run whose bounds make that partition empty."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from graph_data_science_ray import Graph, triangle_count
    from graph_data_science_ray.pipelines.triangles import (
        triangle_count_streaming)
    wd = str(tmp_path / "tc_work")
    rng = np.random.default_rng(65)
    # run 1: large dense-ish graph -> many non-empty partitions
    n1, m1 = 300, 4000
    s1, d1 = rng.integers(0, n1, m1), rng.integers(0, n1, m1)
    ds1 = ray.data.from_arrow(pa.table({"src": s1, "dst": d1})).repartition(4)
    triangle_count_streaming(ds1, n=n1, num_partitions=6, work_dir=wd)
    # run 2 in the SAME work_dir: tiny graph -> most partitions empty
    edges = [(0, 1), (1, 2), (0, 2), (2, 3)]
    s2 = np.array([e[0] for e in edges])
    d2 = np.array([e[1] for e in edges])
    ds2 = ray.data.from_arrow(pa.table({"src": s2, "dst": d2}))
    got = triangle_count_streaming(ds2, n=4, num_partitions=6, work_dir=wd)
    g = Graph.from_edges(s2, d2, n=4, orientation="undirected",
                         aggregation="single")
    ref = triangle_count(g, execution="local")
    assert got.global_count == ref.global_count == 1
    assert np.array_equal(
        got.table.column("triangles").to_numpy(zero_copy_only=False),
        ref.table.column("triangles").to_numpy(zero_copy_only=False))


def test_packed_key_overflow_guard():
    import pytest

    from graph_data_science_ray.pipelines.triangles import _check_key_packable
    _check_key_packable(3_000_000_000)  # fine
    with pytest.raises(ValueError):
        _check_key_packable(4_000_000_000)


def test_triangle_stream_matches_brute_force():
    """triangle_stream emits exactly the (a, b, c) triples (ref
    alpha/.../impl/triangle/TriangleStream.java), rows sorted, a < b < c."""
    import numpy as np

    from graph_data_science_ray import Graph, triangle_stream
    rng = np.random.default_rng(91)
    n, m = 60, 400
    g = Graph.from_edges(rng.integers(0, n, m), rng.integers(0, n, m), n=n,
                         orientation="undirected", aggregation="single")
    adj = np.zeros((n, n), dtype=bool)
    for s, d in zip(g.src, g.dst):
        if s != d:
            adj[s, d] = adj[d, s] = True
    expect = sorted((a, b, c)
                    for a in range(n) for b in range(a + 1, n)
                    for c in range(b + 1, n)
                    if adj[a, b] and adj[b, c] and adj[a, c])
    loc = triangle_stream(g, execution="local")
    got_loc = list(zip(loc.column("node_a").to_pylist(),
                       loc.column("node_b").to_pylist(),
                       loc.column("node_c").to_pylist()))
    assert got_loc == expect
    ray_t = triangle_stream(g, execution="ray", num_partitions=3)
    got_ray = list(zip(ray_t.column("node_a").to_pylist(),
                       ray_t.column("node_b").to_pylist(),
                       ray_t.column("node_c").to_pylist()))
    assert got_ray == expect
    # dataset mode: same triples, unsorted, never concatenated on the driver
    ds = triangle_stream(g, execution="ray", num_partitions=3,
                         as_dataset=True)
    got_ds = sorted((r["node_a"], r["node_b"], r["node_c"])
                    for r in ds.take_all())
    assert got_ds == expect


def test_triangle_stream_empty_and_triangle_free():
    import numpy as np

    from graph_data_science_ray import Graph, triangle_stream
    g = Graph.from_edges(np.array([0, 1]), np.array([1, 2]), n=4,
                         orientation="undirected", aggregation="single")
    assert triangle_stream(g, execution="local").num_rows == 0
    g2 = Graph.from_edges(np.empty(0, np.int64), np.empty(0, np.int64), n=3)
    assert triangle_stream(g2).num_rows == 0


def test_streaming_hub_skew_matches_local_and_balances():
    """Power-law hub graph: the wedge-emission bounds must follow C(outdeg, 2)
    mass, not C(deg, 2) — full-degree quantiles spend every cut inside the
    hub ranks (whose oriented out-degree is ~0) and funnel >99% of wedge
    generation into partition 0 (the round-5 triangles_300k 194s collapse)."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from graph_data_science_ray import Graph, triangle_count
    from graph_data_science_ray.pipelines.triangles import (
        triangle_count_streaming)
    from graph_data_science_ray.sources.generator import random_edge_table

    src, dst, _ = random_edge_table(4000, 8, distribution="power_law", seed=7)
    n = 4000
    g = Graph.from_edges(src, dst, n=n, orientation="undirected",
                         aggregation="single")
    ref = triangle_count(g, execution="local")
    ds = ray.data.from_arrow(pa.table({"src": src, "dst": dst})).repartition(8)
    got = triangle_count_streaming(ds, n=n, num_partitions=8)
    assert got.global_count == ref.global_count
    assert np.array_equal(
        got.table.column("triangles").to_numpy(zero_copy_only=False),
        ref.table.column("triangles").to_numpy(zero_copy_only=False))

    # balance invariant of the fix: outdeg-based quantile cuts spread the
    # wedge mass (no partition holds ~everything on this hub-heavy graph)
    a = np.minimum(src, dst); b = np.maximum(src, dst)
    keep = a != b
    key = a[keep].astype(np.int64) * n + b[keep]
    uq = np.unique(key)
    ca, cb = uq // n, uq % n
    deg = np.bincount(ca, minlength=n) + np.bincount(cb, minlength=n)
    order = np.lexsort((np.arange(n), deg))
    rank = np.empty(n, dtype=np.int64)
    rank[order] = np.arange(n)
    outdeg_r = np.bincount(np.minimum(rank[ca], rank[cb]), minlength=n)
    odf = outdeg_r.astype(np.float64)
    w = odf * np.maximum(odf - 1.0, 0.0) / 2.0
    cum = np.cumsum(w)
    P = 8
    cuts = np.searchsorted(cum, cum[-1] * np.arange(1, P) / P)
    bounds = np.unique(np.concatenate(([0], cuts, [n]))).astype(np.int64)
    part = np.clip(np.searchsorted(bounds, np.arange(n), side="right") - 1,
                   0, len(bounds) - 2)
    per_part = np.bincount(part, weights=w, minlength=len(bounds) - 1)
    assert per_part.max() <= 0.5 * w.sum()  # no single-partition collapse
