"""Graph canonicalization, orientation, aggregation, partitioning, persistence."""

import numpy as np
import pytest

from graph_data_science_ray import Graph
from graph_data_science_ray.state.graph import (canonicalize_edges,
                                                degree_balanced_bounds)


class TestCanonicalize:
    def test_sorted(self):
        s, d, w = canonicalize_edges([3, 1, 1], [0, 2, 1], [1.0, 2.0, 3.0])
        assert s.tolist() == [1, 1, 3]
        assert d.tolist() == [1, 2, 0]
        assert w.tolist() == [3.0, 2.0, 1.0]

    def test_orientation_reverse(self):
        s, d, _ = canonicalize_edges([0, 1], [1, 2], orientation="reverse")
        assert s.tolist() == [1, 2] and d.tolist() == [0, 1]

    def test_orientation_undirected(self):
        s, d, _ = canonicalize_edges([0], [1], orientation="undirected")
        assert s.tolist() == [0, 1] and d.tolist() == [1, 0]

    @pytest.mark.parametrize("agg,expected", [
        ("sum", 5.0), ("min", 2.0), ("max", 3.0), ("count", 2.0), ("single", 2.0)])
    def test_aggregation(self, agg, expected):
        # ref core/Aggregation.java:31-100 parallel-edge policies
        s, d, w = canonicalize_edges([0, 0], [1, 1], [2.0, 3.0], aggregation=agg)
        assert s.shape[0] == 1 and w[0] == expected

    def test_none_keeps_multigraph(self):
        s, d, w = canonicalize_edges([0, 0], [1, 1], [2.0, 3.0], aggregation="none")
        assert s.shape[0] == 2


class TestPartitioning:
    def test_degree_balanced(self):
        # hub at vertex 0 with 90 edges, the rest sparse: partitions balance edges
        src = np.concatenate([np.zeros(90, dtype=np.int64),
                              np.arange(1, 11, dtype=np.int64)])
        bounds = degree_balanced_bounds(20, 4, np.sort(src))
        assert bounds[0] == 0 and bounds[-1] == 20
        assert np.all(np.diff(bounds) > 0)

    def test_shards_cover_all_edges(self):
        rng = np.random.default_rng(5)
        g = Graph.from_edges(rng.integers(0, 50, 200), rng.integers(0, 50, 200), n=50)
        for P in (1, 3, 8):
            shards = g.shards(P)
            assert sum(s.num_edges for s in shards) == g.num_edges
            assert shards[0].lo == 0 and shards[-1].hi == 50

    def test_undirected_shards_double(self):
        g = Graph.from_edges([0, 1], [1, 2], n=3)
        shards = g.shards(2, orientation="undirected")
        assert sum(s.num_edges for s in shards) == 4


class TestPersistence:
    def test_save_load_roundtrip(self, tmp_path):
        rng = np.random.default_rng(9)
        g = Graph.from_edges(rng.integers(0, 30, 100), rng.integers(0, 30, 100),
                             rng.random(100), n=30,
                             keys=np.array([f"k{i}" for i in range(30)], dtype=object),
                             node_props={"seed": np.arange(30)})
        g.save(str(tmp_path / "g"), num_partitions=4)
        g2 = Graph.load(str(tmp_path / "g"))
        assert g2.n == g.n
        assert np.array_equal(g2.src, g.src)
        assert np.array_equal(g2.dst, g.dst)
        np.testing.assert_allclose(g2.weight, g.weight)
        assert list(g2.keys) == [f"k{i}" for i in range(30)]
        assert np.array_equal(g2.node_props["seed"], np.arange(30))

    def test_saved_layout_is_partitioned(self, tmp_path):
        g = Graph.from_edges(np.arange(100), np.roll(np.arange(100), 1), n=100)
        g.save(str(tmp_path / "g"), num_partitions=4)
        import os
        fwd = os.listdir(tmp_path / "g" / "edges_fwd")
        assert len([f for f in fwd if f.endswith(".parquet")]) == 4
        assert (tmp_path / "g" / "edges_rev").exists()
        assert (tmp_path / "g" / "manifest.json").exists()


class TestRowOrderInvariance:
    def test_permuted_input_same_results(self):
        from graph_data_science_ray import pagerank
        rng = np.random.default_rng(13)
        src = rng.integers(0, 40, 150)
        dst = rng.integers(0, 40, 150)
        g1 = Graph.from_edges(src, dst, n=40, aggregation="single")
        perm = rng.permutation(150)
        g2 = Graph.from_edges(src[perm], dst[perm], n=40, aggregation="single")
        r1 = pagerank(g1, tolerance=0, max_iterations=20, execution="local")
        r2 = pagerank(g2, tolerance=0, max_iterations=20, execution="local")
        np.testing.assert_allclose(
            r1.table.column("score").to_numpy(zero_copy_only=False),
            r2.table.column("score").to_numpy(zero_copy_only=False), atol=1e-12)


class TestParquetShardCache:
    """The first actor-BSP run on a ParquetGraph publishes each actor's built
    CSR to the object store; later runs map the cached shards zero-copy
    instead of re-reading the layout (the GDS graph-catalog analogue)."""

    def test_second_run_uses_cache_and_matches(self, tmp_path):
        import ray

        from graph_data_science_ray import wcc
        from graph_data_science_ray.state.graph import Graph, ParquetGraph

        rng = np.random.default_rng(5)
        src = rng.integers(0, 3000, 9000)
        dst = rng.integers(0, 3000, 9000)
        g = Graph.from_edges(src, dst, n=3000)
        d = str(tmp_path / "layout")
        g.save(d, num_partitions=4)

        pg = ParquetGraph(d)
        assert pg._shard_ref_cache == {}
        r1 = wcc(pg, execution="ray", num_partitions=4)
        assert len(pg._shard_ref_cache) == 1  # populated by the first run
        entries = next(iter(pg._shard_ref_cache.values()))
        ref0, spec0 = entries[0]
        shard = ray.get(ref0)
        assert shard.lo == spec0.lo and shard.hi == spec0.hi
        r2 = wcc(pg, execution="ray", num_partitions=4)  # cache hit
        c1 = r1.table.column("component").to_numpy(zero_copy_only=False)
        c2 = r2.table.column("component").to_numpy(zero_copy_only=False)
        assert np.array_equal(c1, c2)
        # local-mode oracle still matches
        r3 = wcc(pg, execution="local")
        c3 = r3.table.column("component").to_numpy(zero_copy_only=False)
        assert np.array_equal(c1, c3)

    def test_lost_ref_falls_back_to_layout(self, tmp_path):
        import ray

        from graph_data_science_ray.pipelines.pregel import _resolve_shard
        from graph_data_science_ray.state.graph import Graph, ParquetGraph

        rng = np.random.default_rng(6)
        g = Graph.from_edges(rng.integers(0, 100, 400),
                             rng.integers(0, 100, 400), n=100)
        d = str(tmp_path / "layout")
        g.save(d, num_partitions=2)
        pg = ParquetGraph(d)
        bounds = pg.bounds(2)
        spec = pg.shard_spec(0, bounds)

        @ray.remote
        def _fail():
            raise RuntimeError("simulated lost object")

        bad_ref = _fail.remote()
        shard = _resolve_shard((bad_ref, spec))  # must rebuild from layout
        assert shard.lo == spec.lo and shard.hi == spec.hi
        assert shard.indices.shape[0] > 0
