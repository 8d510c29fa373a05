"""Distributed Louvain level-0 (pipelines/louvain_dist.py): the shard-actor
path must equal the sequential kernel bit-for-bit when the kernel runs the
same color schedule, at a scale where the sequential path alone would be the
bottleneck (round-2 VERDICT next-round #3)."""

import numpy as np
import pytest

from graph_data_science_ray import Graph
from graph_data_science_ray.pipelines.louvain import (louvain,
                                                      modularity_optimization)
from graph_data_science_ray.pipelines.louvain_dist import (
    _segment_mex, modularity_optimization_distributed)


class TestSegmentMex:
    def test_basic(self):
        seg = np.array([0, 0, 0, 1, 1, 3])
        val = np.array([0, 1, 3, 1, 2, 0])
        np.testing.assert_array_equal(_segment_mex(seg, val, 4),
                                      [2, 0, 0, 1])

    def test_empty(self):
        np.testing.assert_array_equal(
            _segment_mex(np.empty(0, np.int64), np.empty(0, np.int64), 3),
            [0, 0, 0])

    def test_duplicates_and_order(self):
        seg = np.array([0, 0, 0, 0])
        val = np.array([2, 0, 0, 1])
        np.testing.assert_array_equal(_segment_mex(seg, val, 1), [3])


def _random_graph(n, m, seed, weighted=False):
    rng = np.random.default_rng(seed)
    src = rng.integers(0, n, m)
    dst = rng.integers(0, n, m)
    w = rng.random(m) + 0.1 if weighted else None
    return Graph.from_edges(src, dst, w, n=n, orientation="undirected",
                            aggregation="single")


class TestDistributedEqualsLocal:
    @pytest.mark.parametrize("n,m,parts", [(2000, 12000, 3), (500, 1500, 5)])
    def test_small_graphs(self, n, m, parts):
        g = _random_graph(n, m, seed=n)
        dres, colors = modularity_optimization_distributed(
            g, num_partitions=parts)
        lres = modularity_optimization(g.n, g.src, g.dst, None, colors=colors)
        np.testing.assert_array_equal(dres.communities, lres.communities)
        assert dres.modularity == pytest.approx(lres.modularity, abs=1e-9)
        assert dres.ran_iterations == lres.ran_iterations
        assert dres.did_converge == lres.did_converge

    def test_100k_node_graph(self):
        """The VERDICT's 'done' bar: distributed == sequential-with-injected-
        colors on a >=100k-node random graph; no |E|-sized driver prep in the
        distributed path (edges live in shard actors)."""
        g = _random_graph(100_000, 400_000, seed=7)
        dres, colors = modularity_optimization_distributed(
            g, num_partitions=4, max_iterations=3)
        lres = modularity_optimization(g.n, g.src, g.dst, None, colors=colors,
                                       max_iterations=3)
        np.testing.assert_array_equal(dres.communities, lres.communities)
        assert dres.modularity == pytest.approx(lres.modularity, abs=1e-9)
        assert dres.modularity > 0.1  # actually found structure

    def test_weighted_and_seeded(self):
        g = _random_graph(800, 4000, seed=11, weighted=True)
        seeds = np.arange(800, dtype=np.int64) % 37 + 100
        dres, colors = modularity_optimization_distributed(
            g, seeds=seeds, num_partitions=3)
        lres = modularity_optimization(g.n, g.src, g.dst, g.weight,
                                       seeds=seeds, colors=colors)
        np.testing.assert_array_equal(dres.communities, lres.communities)
        assert dres.modularity == pytest.approx(lres.modularity, abs=1e-9)


class TestLouvainRayExecution:
    def test_multi_level_ray(self):
        """louvain(execution='ray'): level 0 distributed, levels >= 1 on the
        summarized graph; structure quality matches the local path."""
        rng = np.random.default_rng(13)
        # planted partition: 8 clusters of 50, dense inside, sparse across
        blocks, size = 8, 50
        n = blocks * size
        src, dst = [], []
        for b in range(blocks):
            base = b * size
            inside = rng.integers(0, size, (600, 2)) + base
            src.extend(inside[:, 0])
            dst.extend(inside[:, 1])
        cross = rng.integers(0, n, (150, 2))
        src.extend(cross[:, 0])
        dst.extend(cross[:, 1])
        g = Graph.from_edges(src, dst, n=n, orientation="undirected",
                             aggregation="single")
        res_ray = louvain(g, execution="ray", num_partitions=3)
        res_loc = louvain(g)
        # both must recover the planted structure (same quality, possibly
        # different ids — trajectories use different color schedules)
        from graph_data_science_ray.pipelines.louvain import modularity_of
        comm_ray = res_ray.table.column("community").to_numpy(
            zero_copy_only=False)
        q_ray = modularity_of(g, comm_ray)
        q_loc = res_loc.modularity
        assert q_ray == pytest.approx(q_loc, abs=0.02)
        assert q_ray > 0.5
        # determinism: same schedule, same result
        res_ray2 = louvain(g, execution="ray", num_partitions=3)
        np.testing.assert_array_equal(
            comm_ray,
            res_ray2.table.column("community").to_numpy(zero_copy_only=False))


class TestLouvainAutoAndCoarseLevels:
    def test_auto_routes_small_local_and_matches(self):
        """Bare louvain(g) on a small graph stays sequential and equals the
        explicit local path exactly."""
        g = _random_graph(1_000, 5_000, seed=21)
        a = louvain(g)  # auto -> local (|E| < dist_threshold)
        b = louvain(g, execution="local")
        np.testing.assert_array_equal(
            a.table.column("community").to_numpy(zero_copy_only=False),
            b.table.column("community").to_numpy(zero_copy_only=False))

    def test_power_law_ray_quality_matches_local(self):
        """Round-3 VERDICT next-round #5: equality extended to a power-law
        graph — the distributed path (forced via dist_threshold=0, so coarse
        levels >0 also run the shard-actor kernel) recovers the same
        modularity as the sequential path and is deterministic."""
        from graph_data_science_ray.pipelines.louvain import modularity_of
        from graph_data_science_ray.sources.generator import random_graph
        g0 = random_graph(3_000, 6, distribution="power_law", seed=31)
        g = Graph.from_edges(g0.src, g0.dst, n=g0.n, orientation="undirected",
                             aggregation="single")
        res_ray = louvain(g, execution="ray", num_partitions=3,
                          dist_threshold=0)
        res_loc = louvain(g, execution="local")
        comm_ray = res_ray.table.column("community").to_numpy(
            zero_copy_only=False)
        q_ray = modularity_of(g, comm_ray)
        assert q_ray == pytest.approx(res_loc.modularity, abs=0.03)
        res_ray2 = louvain(g, execution="ray", num_partitions=3,
                           dist_threshold=0)
        np.testing.assert_array_equal(
            comm_ray,
            res_ray2.table.column("community").to_numpy(zero_copy_only=False))
