"""Shortest paths vs a dense Bellman-Ford oracle."""

import numpy as np
import pytest

from graph_data_science_ray import Graph
from graph_data_science_ray.pipelines.paths import shortest_paths


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
