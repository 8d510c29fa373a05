"""Shortest paths vs a dense Bellman-Ford oracle."""

import numpy as np
import pytest

from graph_data_science_ray import Graph
from graph_data_science_ray.pipelines.paths import (dag_longest_path,
                                                    shortest_paths)


def bellman_ford(n, src, dst, w, source):
    dist = np.full(n, np.inf)
    dist[source] = 0.0
    for _ in range(n):
        nd = dist.copy()
        np.minimum.at(nd, dst, dist[src] + w)
        if np.array_equal(nd, dist):
            break
        dist = nd
    return dist


def test_weighted_sssp_small():
    edges = [("a", "b", 1.0), ("b", "c", 2.0), ("a", "c", 5.0), ("c", "d", 1.0),
             ("b", "d", 10.0)]
    g = Graph.from_edge_list(edges)
    res = shortest_paths(g, "a", execution="local")
    assert res.table.column("distance").to_pylist() == [0.0, 1.0, 3.0, 4.0]


def test_unreachable_is_inf():
    g = Graph.from_edges([0], [1], n=3)
    res = shortest_paths(g, 0, weighted=False, execution="local")
    d = res.table.column("distance").to_numpy(zero_copy_only=False)
    assert d[2] == np.inf and d.tolist()[:2] == [0.0, 1.0]


def test_randomized_vs_bellman_ford():
    rng = np.random.default_rng(23)
    for trial in range(4):
        n = int(rng.integers(20, 60))
        m = int(rng.integers(30, 150))
        src = rng.integers(0, n, m)
        dst = rng.integers(0, n, m)
        w = rng.random(m) * 5
        g = Graph.from_edges(src, dst, w, n=n, aggregation="min")
        res = shortest_paths(g, 0, execution="local",
                             num_partitions=int(rng.integers(1, 4)))
        exp = bellman_ford(n, g.src, g.dst, g.weight, 0)
        np.testing.assert_allclose(
            res.table.column("distance").to_numpy(zero_copy_only=False), exp,
            atol=1e-9)


def test_actor_mode_agrees():
    rng = np.random.default_rng(29)
    g = Graph.from_edges(rng.integers(0, 80, 300), rng.integers(0, 80, 300),
                         rng.random(300), n=80, aggregation="min")
    lo = shortest_paths(g, 5, execution="local")
    ac = shortest_paths(g, 5, execution="ray", num_partitions=3)
    np.testing.assert_allclose(
        ac.table.column("distance").to_numpy(zero_copy_only=False),
        lo.table.column("distance").to_numpy(zero_copy_only=False), atol=1e-12)


def test_negative_weights_rejected():
    g = Graph.from_edges([0], [1], [-1.0], n=2)
    with pytest.raises(ValueError):
        shortest_paths(g, 0)


class TestDijkstraPaths:
    """Path reconstruction vs the reference fixture (DijkstraTest.java:101-155):
    a->f shortest path is a,c,e,d,f with costs 0,2,5,9,20."""

    def _graph(self):
        from graph_data_science_ray import Graph
        edges = [("a", "b", 4), ("a", "c", 2), ("b", "c", 5), ("b", "d", 10),
                 ("c", "e", 3), ("d", "f", 11), ("e", "d", 4)]
        return Graph.from_edge_list(edges, nodes=list("abcdef"))

    def test_source_target_path(self):
        from graph_data_science_ray.pipelines.paths import dijkstra
        g = self._graph()
        t = dijkstra(g, "a", targets=["f"], execution="local")
        assert t.num_rows == 1
        assert t.column("total_cost").to_pylist() == [20.0]
        assert t.column("node_ids").to_pylist() == [[0, 2, 4, 3, 5]]
        assert t.column("costs").to_pylist() == [[0.0, 2.0, 5.0, 9.0, 20.0]]

    def test_single_source_all_targets(self):
        from graph_data_science_ray.pipelines.paths import dijkstra
        g = self._graph()
        t = dijkstra(g, 0, execution="local")
        by_target = {r["target_node"]: r for r in t.to_pylist()}
        assert by_target[5]["total_cost"] == 20.0
        assert by_target[1]["node_ids"] == [0, 1]
        assert by_target[4]["node_ids"] == [0, 2, 4]

    def test_distributed_matches_local(self):
        from graph_data_science_ray.pipelines.paths import dijkstra
        g = self._graph()
        tl = dijkstra(g, 0, execution="local")
        tr = dijkstra(g, 0, execution="ray", num_partitions=2)
        assert tl.to_pylist() == tr.to_pylist()

    def test_parquet_graph_reconstruction(self, tmp_path):
        """Point-lookup reconstruction against the edges_rev layout."""
        import numpy as np

        from graph_data_science_ray import ParquetGraph
        from graph_data_science_ray.pipelines.paths import dijkstra
        g = self._graph()
        g.save(str(tmp_path / "g"), num_partitions=2)
        pg = ParquetGraph(str(tmp_path / "g"))
        t = dijkstra(pg, 0, targets=[5], execution="ray")
        assert t.column("node_ids").to_pylist() == [[0, 2, 4, 3, 5]]
        assert t.column("total_cost").to_pylist() == [20.0]

    def test_unweighted_hop_paths(self):
        from graph_data_science_ray import Graph
        from graph_data_science_ray.pipelines.paths import dijkstra
        g = Graph.from_edge_list([("a", "b"), ("b", "c"), ("a", "c")],
                                 nodes=list("abc"))
        t = dijkstra(g, 0, weighted=False, execution="local")
        by_target = {r["target_node"]: r for r in t.to_pylist()}
        assert by_target[2]["node_ids"] == [0, 2]  # direct hop beats a,b,c
        assert by_target[2]["total_cost"] == 1.0


class TestAStar:
    """AStarTest.java:85-135: shipping-route fixture, expected path nA..nH,nX
    with aggregated costs."""

    def test_source_target(self):
        import numpy as np

        from graph_data_science_ray import Graph
        from graph_data_science_ray.pipelines.paths_local import astar
        nodes = ["nA", "nB", "nC", "nD", "nE", "nF", "nG", "nH", "nI", "nJ",
                 "nK", "nL", "nM", "nN", "nO", "nP", "nX"]
        lat = {"nA": 1.304444, "nB": 1.1892, "nC": 8.83055556, "nD": 10.82916667,
               "nE": 11.9675, "nF": 16.0728, "nG": 20.5325, "nH": 29.32611111,
               "nI": -2.0428, "nJ": -8.3256, "nK": -8.5945, "nL": -8.2211,
               "nM": -1.8558, "nN": 3.96861111, "nO": 12.76305556,
               "nP": 22.32027778, "nX": 35.562222}
        lon = {"nA": 103.717373, "nB": 103.4689, "nC": 111.8725,
               "nD": 113.9722222, "nE": 115.2366667, "nF": 119.6128,
               "nG": 121.845, "nH": 131.2988889, "nI": 108.6225, "nJ": 115.8872,
               "nK": 116.6867, "nL": 125.2411, "nM": 126.5572, "nN": 128.3052778,
               "nO": 131.2980556, "nP": 134.7, "nX": 140.059187}
        edges = [("nA", "nB", 29.0), ("nB", "nC", 694.0), ("nC", "nD", 172.0),
                 ("nD", "nE", 101.0), ("nE", "nF", 357.0), ("nF", "nG", 299.0),
                 ("nG", "nH", 740.0), ("nH", "nX", 587.0), ("nB", "nI", 389.0),
                 ("nI", "nJ", 584.0), ("nJ", "nK", 82.0), ("nK", "nL", 528.0),
                 ("nL", "nM", 391.0), ("nM", "nN", 364.0), ("nN", "nO", 554.0),
                 ("nO", "nP", 603.0), ("nP", "nX", 847.0)]
        order = sorted(nodes)
        g = Graph.from_edge_list(edges, nodes=order, node_props={
            "latitude": lat, "longitude": lon})
        s, t = order.index("nA"), order.index("nX")
        res = astar(g, s, t)
        assert res.num_rows == 1
        path = res.column("node_ids").to_pylist()[0]
        names = [order[v] for v in path]
        assert names == ["nA", "nB", "nC", "nD", "nE", "nF", "nG", "nH", "nX"]
        np.testing.assert_allclose(
            res.column("costs").to_pylist()[0],
            [0.0, 29.0, 723.0, 895.0, 996.0, 1353.0, 1652.0, 2392.0, 2979.0])


class TestYens:
    """YensTest.java:85-165: k=1..7 expected paths c→h, including the
    equal-cost tie emission order."""

    EXPECTED = [
        (5.0, "cefh"), (7.0, "cegh"), (8.0, "cdfh"), (8.0, "cedfh"),
        (8.0, "cefgh"), (11.0, "cdfgh"), (11.0, "cedfgh")]

    def _graph(self):
        from graph_data_science_ray import Graph
        edges = [("c", "d", 3.0), ("c", "e", 2.0), ("d", "f", 4.0),
                 ("e", "d", 1.0), ("e", "f", 2.0), ("e", "g", 3.0),
                 ("f", "g", 2.0), ("f", "h", 1.0), ("g", "h", 2.0)]
        return Graph.from_edge_list(edges, nodes=list("cdefgh"))

    @pytest.mark.parametrize("k", [1, 2, 3, 4, 5, 6, 7])
    def test_k_paths(self, k):
        from graph_data_science_ray.pipelines.paths_local import yens
        g = self._graph()
        nodes = list("cdefgh")
        res = yens(g, nodes.index("c"), nodes.index("h"), k=k)
        got = [(c, "".join(nodes[v] for v in p))
               for c, p in zip(res.column("total_cost").to_pylist(),
                               res.column("node_ids").to_pylist())]
        assert got == [e for e in self.EXPECTED[:k]]


def dag_longest_oracle(n, src, dst, w):
    """Topological DP oracle (Kahn order)."""
    indeg = np.bincount(dst, minlength=n)
    dist = np.zeros(n)
    from collections import deque
    adj = [[] for _ in range(n)]
    for s, d, wt in zip(src, dst, w):
        adj[int(s)].append((int(d), float(wt)))
    q = deque(np.nonzero(indeg == 0)[0].tolist())
    while q:
        u = q.popleft()
        for v, wt in adj[u]:
            dist[v] = max(dist[v], dist[u] + wt)
            indeg[v] -= 1
            if indeg[v] == 0:
                q.append(v)
    return dist


class TestDagLongestPath:
    def test_small_diamond(self):
        # a->b->d (2 hops) beats a->d (1 hop); c isolated source
        g = Graph.from_edges([0, 1, 0], [1, 3, 3], n=5)
        res = dag_longest_path(g, execution="local")
        assert res.table.column("distance").to_pylist() == \
            [0.0, 1.0, 0.0, 2.0, 0.0]

    def test_randomized_vs_topological_dp(self):
        rng = np.random.default_rng(41)
        for trial in range(4):
            n = int(rng.integers(30, 80))
            m = int(rng.integers(40, 200))
            # layered construction guarantees a DAG: edges go low vid -> high
            src = rng.integers(0, n - 1, m)
            span = rng.integers(1, 10, m)
            dst = np.minimum(src + span, n - 1)
            keep = src != dst
            src, dst = src[keep], dst[keep]
            w = rng.random(src.shape[0]) * 4
            g = Graph.from_edges(src, dst, w, n=n, aggregation="max")
            res = dag_longest_path(g, execution="local",
                                   num_partitions=int(rng.integers(1, 4)))
            exp = dag_longest_oracle(n, g.src, g.dst, g.weight)
            np.testing.assert_allclose(
                res.table.column("distance").to_numpy(zero_copy_only=False),
                exp, atol=1e-9)

    def test_unweighted_chain_depth(self):
        n = 50
        g = Graph.from_edges(np.arange(n - 1), np.arange(1, n), n=n)
        res = dag_longest_path(g, weighted=False, execution="local")
        np.testing.assert_array_equal(
            res.table.column("distance").to_numpy(zero_copy_only=False),
            np.arange(n, dtype=float))

    def test_actor_mode_agrees(self):
        rng = np.random.default_rng(43)
        n, m = 400, 1600
        src = rng.integers(0, n - 1, m)
        dst = np.minimum(src + rng.integers(1, 20, m), n - 1)
        keep = src != dst
        w = rng.random(int(keep.sum())) * 3
        g = Graph.from_edges(src[keep], dst[keep], w, n=n, aggregation="max")
        loc = dag_longest_path(g, execution="local")
        act = dag_longest_path(g, execution="ray", num_partitions=4)
        np.testing.assert_allclose(
            act.table.column("distance").to_numpy(zero_copy_only=False),
            loc.table.column("distance").to_numpy(zero_copy_only=False),
            atol=1e-9)

    def test_cycle_rejected(self):
        g = Graph.from_edges([0, 1, 2], [1, 2, 0], n=3)
        with pytest.raises(ValueError, match="not a DAG"):
            dag_longest_path(g, execution="local", max_iterations=50)
