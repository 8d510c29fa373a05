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
