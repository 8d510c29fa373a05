"""Alpha-tier algorithms: closeness/harmonic centrality (GDS fixtures) and SCC
(Tarjan vs forward-backward equality, brute-force reachability oracle)."""

import numpy as np
import pytest

from graph_data_science_ray import Graph
from graph_data_science_ray.pipelines.centrality import (closeness_centrality,
                                                         harmonic_centrality)
from graph_data_science_ray.pipelines.scc import scc


class TestCloseness:
    def test_path_graph_fixture(self):
        """ClosenessCentralityTest.java:55-100: 5-path, expected
        0.4 0.57 0.67 0.57 0.4."""
        edges = [("a", "b"), ("b", "a"), ("b", "c"), ("c", "b"), ("c", "d"),
                 ("d", "c"), ("d", "e"), ("e", "d")]
        g = Graph.from_edge_list(edges, nodes=list("abcde"))
        c = closeness_centrality(g).column("centrality") \
            .to_numpy(zero_copy_only=False)
        np.testing.assert_allclose(c, [0.4, 4 / 7, 2 / 3, 4 / 7, 0.4], atol=0.01)

    def test_wasserman_faust(self):
        edges = [("a", "b"), ("b", "a"), ("b", "c"), ("c", "b"), ("c", "d"),
                 ("d", "c"), ("d", "e"), ("e", "d")]
        g = Graph.from_edge_list(edges, nodes=list("abcde"))
        c = closeness_centrality(g, wasserman_faust=True) \
            .column("centrality").to_numpy(zero_copy_only=False)
        base = np.asarray([0.4, 4 / 7, 2 / 3, 4 / 7, 0.4])
        np.testing.assert_allclose(c, base, atol=0.01)  # reach=n-1 here → same

    def test_distributed_matches(self):
        rng = np.random.default_rng(81)
        g = Graph.from_edges(rng.integers(0, 80, 300), rng.integers(0, 80, 300),
                             n=80, aggregation="single")
        a = closeness_centrality(g, execution="local").column("centrality")
        b = closeness_centrality(g, execution="ray").column("centrality")
        np.testing.assert_allclose(a.to_numpy(zero_copy_only=False),
                                   b.to_numpy(zero_copy_only=False), atol=1e-12)


class TestHarmonic:
    def test_fixture(self):
        """HarmonicCentralityTest.java:40-83: a-b, b-c, d-e undirected →
        0.375, 0.5, 0.375, 0.25, 0.25."""
        g = Graph.from_edge_list([("a", "b"), ("b", "c"), ("d", "e")],
                                 nodes=list("abcde"), orientation="undirected")
        c = harmonic_centrality(g).column("centrality") \
            .to_numpy(zero_copy_only=False)
        np.testing.assert_allclose(c, [0.375, 0.5, 0.375, 0.25, 0.25], atol=0.01)


class TestScc:
    def _brute(self, g):
        n = g.n
        reach = np.zeros((n, n), dtype=bool)
        np.fill_diagonal(reach, True)
        for s, d in zip(g.src, g.dst):
            reach[s, d] = True
        for k in range(n):
            reach |= reach[:, k][:, None] & reach[k, :][None, :]
        comp = np.full(n, -1, dtype=np.int64)
        for v in range(n):
            members = np.nonzero(reach[v] & reach[:, v])[0]
            comp[v] = members.min()
        return comp

    def test_cycles_and_tails(self):
        # two 3-cycles bridged one-way, plus a dangling tail
        edges = [(0, 1), (1, 2), (2, 0), (3, 4), (4, 5), (5, 3), (2, 3), (5, 6)]
        g = Graph.from_edges([e[0] for e in edges], [e[1] for e in edges], n=7)
        c = scc(g, execution="local").column("component") \
            .to_numpy(zero_copy_only=False)
        assert c.tolist() == [0, 0, 0, 3, 3, 3, 6]

    @pytest.mark.parametrize("mode", ["local", "fb"])
    def test_random_vs_bruteforce(self, mode):
        rng = np.random.default_rng(82)
        n, m = 40, 120
        g = Graph.from_edges(rng.integers(0, n, m), rng.integers(0, n, m), n=n,
                             aggregation="single")
        c = scc(g, execution=mode).column("component") \
            .to_numpy(zero_copy_only=False)
        np.testing.assert_array_equal(c, self._brute(g))

    def test_tarjan_equals_fb(self):
        rng = np.random.default_rng(83)
        n, m = 300, 900
        g = Graph.from_edges(rng.integers(0, n, m), rng.integers(0, n, m), n=n,
                             aggregation="single")
        a = scc(g, execution="local").column("component")
        b = scc(g, execution="fb").column("component")
        np.testing.assert_array_equal(a.to_numpy(zero_copy_only=False),
                                      b.to_numpy(zero_copy_only=False))


class TestRandomWalks:
    def _graph(self):
        rng = np.random.default_rng(91)
        n, m = 60, 400
        return Graph.from_edges(rng.integers(0, n, m), rng.integers(0, n, m),
                                n=n, aggregation="single")

    def test_walks_follow_edges(self):
        from graph_data_science_ray.pipelines.walks import random_walks
        g = self._graph()
        edge_set = set(zip(g.src.tolist(), g.dst.tolist()))
        t = random_walks(g, walks_per_node=2, walk_length=10, seed=1)
        assert t.num_rows == g.n * 2
        for path in t.column("path").to_pylist()[:50]:
            for a, b in zip(path[:-1], path[1:]):
                assert (a, b) in edge_set

    def test_deterministic_per_seed(self):
        from graph_data_science_ray.pipelines.walks import random_walks
        g = self._graph()
        a = random_walks(g, walks_per_node=1, walk_length=8, seed=5)
        b = random_walks(g, walks_per_node=1, walk_length=8, seed=5)
        assert a.column("path").to_pylist() == b.column("path").to_pylist()
        c = random_walks(g, walks_per_node=1, walk_length=8, seed=6)
        assert a.column("path").to_pylist() != c.column("path").to_pylist()

    def test_return_factor_bias(self):
        """Tiny p (cheap returns) must produce far more immediate backtracks
        than huge p, on an undirected path-rich graph."""
        from graph_data_science_ray.pipelines.walks import random_walks
        rng = np.random.default_rng(92)
        n, m = 40, 200
        g = Graph.from_edges(rng.integers(0, n, m), rng.integers(0, n, m),
                             n=n, orientation="undirected", aggregation="single")

        def backtrack_rate(p):
            t = random_walks(g, walks_per_node=4, walk_length=20,
                             return_factor=p, seed=3)
            back = total = 0
            for path in t.column("path").to_pylist():
                for i in range(2, len(path)):
                    total += 1
                    back += path[i] == path[i - 2]
            return back / max(total, 1)

        assert backtrack_rate(0.05) > backtrack_rate(20.0) + 0.1

    def test_sink_terminates_walk(self):
        from graph_data_science_ray.pipelines.walks import random_walks
        g = Graph.from_edges([0, 1], [1, 2], n=3)  # 2 is a sink
        t = random_walks(g, walks_per_node=1, walk_length=10, seed=2)
        paths = {r["start_node"]: r["path"] for r in t.to_pylist()}
        assert paths[0] == [0, 1, 2]
        assert paths[2] == [2]


class TestSpanningTree:
    """PrimTest.java:95-148: 5-node fixture + isolated y,z; min/max trees from
    every start node agree with a brute-force Kruskal oracle."""

    EDGES = [("a", "b", 1.0), ("a", "c", 2.0), ("b", "c", 3.0),
             ("b", "d", 4.0), ("c", "e", 5.0), ("d", "e", 6.0)]
    NODES = list("abcde") + ["y", "z"]

    def _graph(self):
        return Graph.from_edge_list(self.EDGES, nodes=self.NODES)

    def _kruskal_weight(self, maximum):
        import itertools
        edges = sorted(self.EDGES, key=lambda e: e[2], reverse=maximum)
        parent = {n: n for n in self.NODES}

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x
        total = 0.0
        for a, b, w in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[ra] = rb
                total += w
        return total

    @pytest.mark.parametrize("start", range(5))
    @pytest.mark.parametrize("maximum", [False, True])
    def test_prim_all_starts(self, start, maximum):
        from graph_data_science_ray.pipelines.spanning import spanning_tree
        g = self._graph()
        res = spanning_tree(g, start, maximum=maximum)
        assert res["effective_node_count"] == 5
        t = res["table"]
        parent = t.column("parent").to_numpy(zero_copy_only=False)
        assert parent[5] == -1 and parent[6] == -1  # y, z unreached
        assert res["total_weight"] == pytest.approx(self._kruskal_weight(maximum))


class TestTraversal:
    def test_bfs_order(self):
        from graph_data_science_ray.pipelines.spanning import bfs
        g = Graph.from_edge_list([("a", "b"), ("a", "c"), ("b", "d"), ("c", "d"),
                                  ("d", "e")], nodes=list("abcde"))
        t = bfs(g, 0)
        assert t.column("vid").to_pylist() == [0, 1, 2, 3, 4]

    def test_bfs_max_depth(self):
        from graph_data_science_ray.pipelines.spanning import bfs
        g = Graph.from_edge_list([("a", "b"), ("b", "c")], nodes=list("abc"))
        t = bfs(g, 0, max_depth=1)
        assert t.column("vid").to_pylist() == [0, 1]

    def test_dfs_preorder(self):
        from graph_data_science_ray.pipelines.spanning import dfs
        g = Graph.from_edge_list([("a", "b"), ("a", "c"), ("b", "d")],
                                 nodes=list("abcd"))
        t = dfs(g, 0)
        assert t.column("vid").to_pylist() == [0, 1, 3, 2]  # smaller-vid first
