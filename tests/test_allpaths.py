"""All-pairs shortest paths stream (MSBFSAllShortestPaths.java /
WeightedAllShortestPaths.java): brute-force BFS/Dijkstra oracles, local vs
sharded equality, source restriction, no self-pairs."""

import numpy as np
import pyarrow as pa
import pytest

from graph_data_science_ray import Graph, all_shortest_paths


def _bfs_pairs(n, edges, sources):
    adj = [[] for _ in range(n)]
    for s, d in edges:
        adj[s].append(d)
    rows = set()
    for s in sources:
        dist = {s: 0}
        q = [s]
        while q:
            nq = []
            for u in q:
                for v in adj[u]:
                    if v not in dist:
                        dist[v] = dist[u] + 1
                        nq.append(v)
            q = nq
        for t, d in dist.items():
            if t != s:
                rows.add((s, t, float(d)))
    return rows


def _rows(t: pa.Table):
    return set(zip(t.column("source").to_pylist(),
                   t.column("target").to_pylist(),
                   t.column("distance").to_pylist()))


def _random_edges(n, m, seed):
    rng = np.random.default_rng(seed)
    src = rng.integers(0, n, m)
    dst = rng.integers(0, n, m)
    keep = src != dst
    return list({(int(a), int(b)) for a, b in zip(src[keep], dst[keep])})


class TestUnweighted:
    def test_matches_bfs(self):
        edges = _random_edges(40, 160, seed=1)
        g = Graph.from_edges(np.array([e[0] for e in edges]),
                             np.array([e[1] for e in edges]), n=40)
        t = all_shortest_paths(g, execution="local")
        assert _rows(t) == _bfs_pairs(40, edges, range(40))

    def test_sharded_equals_local(self):
        edges = _random_edges(150, 500, seed=2)
        g = Graph.from_edges(np.array([e[0] for e in edges]),
                             np.array([e[1] for e in edges]), n=150)
        a = all_shortest_paths(g, execution="local")
        b = all_shortest_paths(g, execution="ray", num_partitions=3)
        assert _rows(a) == _rows(b)

    def test_source_restriction_and_no_self_pairs(self):
        edges = [(0, 1), (1, 2), (2, 0), (2, 3)]
        g = Graph.from_edges(np.array([e[0] for e in edges]),
                             np.array([e[1] for e in edges]), n=5)
        t = all_shortest_paths(g, sources=np.array([0]))
        got = _rows(t)
        assert got == {(0, 1, 1.0), (0, 2, 2.0), (0, 3, 3.0)}
        assert all(s != tg for s, tg, _ in got)

    def test_more_than_64_sources(self):
        # crosses the 64-bit batch boundary in the mask layout
        edges = [(i, i + 1) for i in range(99)]
        g = Graph.from_edges(np.array([e[0] for e in edges]),
                             np.array([e[1] for e in edges]), n=100)
        t = all_shortest_paths(g, execution="local")
        assert t.num_rows == 100 * 99 // 2  # path graph: all ordered pairs i<j
        b = all_shortest_paths(g, execution="ray", num_partitions=2)
        assert _rows(t) == _rows(b)

    def test_as_dataset(self):
        edges = _random_edges(30, 100, seed=4)
        g = Graph.from_edges(np.array([e[0] for e in edges]),
                             np.array([e[1] for e in edges]), n=30)
        ds = all_shortest_paths(g, execution="local", as_dataset=True)
        import ray
        tabs = [t for t in ray.get(ds.to_arrow_refs()) if t.num_rows]
        assert _rows(pa.concat_tables(tabs)) == _bfs_pairs(30, edges,
                                                           range(30))


class TestWeighted:
    def test_matches_per_source_dijkstra(self):
        import heapq
        rng = np.random.default_rng(7)
        edges = _random_edges(35, 140, seed=7)
        w = {e: float(np.round(rng.random() * 5 + 0.1, 3)) for e in edges}
        g = Graph.from_edges(np.array([e[0] for e in edges]),
                             np.array([e[1] for e in edges]),
                             np.array([w[e] for e in edges]), n=35)
        t = all_shortest_paths(g, weighted=True)
        adj = [[] for _ in range(35)]
        # mirror the engine's parallel-edge handling by reading ITS csr
        sh = g.shards(1, "natural")[0]
        for u in range(35):
            for e in range(sh.indptr[u], sh.indptr[u + 1]):
                adj[u].append((int(sh.indices[e]), float(sh.weights[e])))
        exp = set()
        for s in range(35):
            dist = {s: 0.0}
            h = [(0.0, s)]
            while h:
                d, u = heapq.heappop(h)
                if d > dist.get(u, np.inf):
                    continue
                for v, wt in adj[u]:
                    nd = d + wt
                    if nd < dist.get(v, np.inf) - 1e-15:
                        dist[v] = nd
                        heapq.heappush(h, (nd, v))
            for tgt, d in dist.items():
                if tgt != s:
                    exp.add((s, tgt, round(d, 9)))
        got = {(s, tg, round(d, 9)) for s, tg, d in _rows(t)}
        assert got == exp

    def test_negative_weight_rejected(self):
        g = Graph.from_edges(np.array([0]), np.array([1]),
                             np.array([-1.0]), n=2)
        with pytest.raises(ValueError):
            all_shortest_paths(g, weighted=True)


class TestSplitRelationships:
    def _graph(self, seed=5):
        rng = np.random.default_rng(seed)
        src = rng.integers(0, 60, 400).astype(np.int64)
        dst = rng.integers(0, 60, 400).astype(np.int64)
        keep = src != dst
        return Graph.from_edges(src[keep], dst[keep],
                                np.round(rng.random(int(keep.sum())), 3),
                                n=60)

    def test_counts_and_partition(self):
        from graph_data_science_ray import split_relationships
        g = self._graph()
        m = g.src.shape[0]
        train, test = split_relationships(g, 0.2,
                                          negative_sampling_ratio=1.5,
                                          seed=42)
        n_pos = int(m * 0.2)
        n_neg = int(1.5 * m * 0.2)
        labels = np.asarray(test.column("label").to_pylist())
        assert (labels == 1.0).sum() == n_pos
        assert (labels == 0.0).sum() == n_neg
        assert train.src.shape[0] == m - n_pos
        # train ∪ positives == original edge multiset
        orig = sorted(zip(g.src.tolist(), g.dst.tolist()))
        pos_mask = labels == 1.0
        s = np.asarray(test.column("source").to_pylist())[pos_mask]
        t = np.asarray(test.column("target").to_pylist())[pos_mask]
        recomposed = sorted(zip(np.concatenate([train.src, s]).tolist(),
                                np.concatenate([train.dst, t]).tolist()))
        assert recomposed == orig

    def test_negatives_are_non_edges(self):
        from graph_data_science_ray import split_relationships
        g = self._graph(seed=9)
        _, test = split_relationships(g, 0.3, seed=7)
        labels = np.asarray(test.column("label").to_pylist())
        s = np.asarray(test.column("source").to_pylist())[labels == 0.0]
        t = np.asarray(test.column("target").to_pylist())[labels == 0.0]
        edges = set(zip(g.src.tolist(), g.dst.tolist()))
        assert all((a, b) not in edges and a != b for a, b in zip(s, t))

    def test_seed_determinism(self):
        from graph_data_science_ray import split_relationships
        g = self._graph(seed=2)
        _, t1 = split_relationships(g, 0.25, seed=11)
        _, t2 = split_relationships(g, 0.25, seed=11)
        assert t1.equals(t2)
        _, t3 = split_relationships(g, 0.25, seed=12)
        assert not t1.equals(t3)

    def test_train_keeps_weights(self):
        from graph_data_science_ray import split_relationships
        g = self._graph(seed=3)
        train, _ = split_relationships(g, 0.1, seed=1)
        assert train.weight is not None
        assert train.weight.shape[0] == train.src.shape[0]


class TestSplitReviewRegressions:
    """Round-5 review: undirected leakage, negative dedup."""

    def test_undirected_no_reverse_leakage(self):
        """A held-out positive's REVERSE direction must leave the train graph
        too (UndirectedEdgeSplitter.java) — otherwise every test edge leaks
        into training."""
        from graph_data_science_ray import split_relationships
        rng = np.random.default_rng(3)
        src = rng.integers(0, 40, 150).astype(np.int64)
        dst = rng.integers(0, 40, 150).astype(np.int64)
        keep = src != dst
        g = Graph.from_edges(src[keep], dst[keep], n=40,
                             orientation="undirected", aggregation="single")
        train, test = split_relationships(g, 0.4, undirected=True, seed=7)
        labels = np.asarray(test.column("label").to_pylist())
        s = np.asarray(test.column("source").to_pylist())[labels == 1.0]
        t = np.asarray(test.column("target").to_pylist())[labels == 1.0]
        train_keys = set(zip(train.src.tolist(), train.dst.tolist()))
        for a, b in zip(s.tolist(), t.tolist()):
            assert (a, b) not in train_keys, f"held-out ({a},{b}) in train"
            assert (b, a) not in train_keys, f"reverse ({b},{a}) leaked"
        # positives are canonical pairs, counted over pairs not directed rows
        assert (s < t).all()
        assert (labels == 1.0).sum() == int((g.src < g.dst).sum() * 0.4)

    def test_negatives_are_distinct(self):
        from graph_data_science_ray import split_relationships
        g = Graph.from_edges([0], [1], n=3)
        _, test = split_relationships(g, 1.0, negative_sampling_ratio=6.0,
                                      seed=0)
        labels = np.asarray(test.column("label").to_pylist())
        s = np.asarray(test.column("source").to_pylist())[labels == 0.0]
        t = np.asarray(test.column("target").to_pylist())[labels == 0.0]
        pairs = list(zip(s.tolist(), t.tolist()))
        assert len(pairs) == len(set(pairs)), "duplicate negative pairs"

    def test_undirected_negatives_not_edges_either_direction(self):
        from graph_data_science_ray import split_relationships
        g = Graph.from_edges([0, 1, 2], [1, 2, 3], n=6,
                             orientation="undirected")
        _, test = split_relationships(g, 0.5, undirected=True,
                                      negative_sampling_ratio=2.0, seed=1)
        labels = np.asarray(test.column("label").to_pylist())
        s = np.asarray(test.column("source").to_pylist())[labels == 0.0]
        t = np.asarray(test.column("target").to_pylist())[labels == 0.0]
        edges = set(zip(g.src.tolist(), g.dst.tolist()))
        for a, b in zip(s.tolist(), t.tolist()):
            assert (a, b) not in edges and (b, a) not in edges


class TestAspReviewRegressions:
    def test_duplicate_sources_local_equals_ray(self, ray_session):
        """A duplicated source must emit rows for BOTH copies in both paths
        (the local kernel's fancy-index |= silently kept one lane before)."""
        from graph_data_science_ray import all_shortest_paths
        rng = np.random.default_rng(2)
        src = rng.integers(0, 80, 400).astype(np.int64)
        dst = rng.integers(0, 80, 400).astype(np.int64)
        keep = src != dst
        g = Graph.from_edges(src[keep], dst[keep], n=80, aggregation="single")
        loc = all_shortest_paths(g, sources=[3, 3, 7], execution="local")
        ray_t = all_shortest_paths(g, sources=[3, 3, 7], execution="ray",
                                   num_partitions=2)
        if hasattr(ray_t, "to_arrow_refs"):
            import pyarrow as pa
            import ray as _ray
            ray_t = pa.concat_tables(
                [t for t in _ray.get(ray_t.to_arrow_refs()) if t.num_rows])
        def _key(t):
            return sorted(zip(t.column("source").to_pylist(),
                              t.column("target").to_pylist(),
                              t.column("distance").to_pylist()))
        assert _key(loc) == _key(ray_t)

    def test_partitions_exceeding_cpus_complete(self, ray_session):
        """More shard actors than CPUs must not deadlock (fractional-CPU
        guard; this hung forever before the fix)."""
        from graph_data_science_ray import all_shortest_paths
        rng = np.random.default_rng(4)
        src = rng.integers(0, 200, 1200).astype(np.int64)
        dst = rng.integers(0, 200, 1200).astype(np.int64)
        keep = src != dst
        g = Graph.from_edges(src[keep], dst[keep], n=200,
                             aggregation="single")
        out = all_shortest_paths(g, sources=[0, 1, 2], execution="ray",
                                 num_partitions=6)  # session has 4 CPUs
        n = out.count() if hasattr(out, "count") else out.num_rows
        assert n > 0
