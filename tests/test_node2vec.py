"""Node2Vec training (pipelines/node2vec.py) — Node2VecTest-style invariants:
determinism per seed, neighborhood-similarity structure, and the distributed
model-averaging path producing the same structure."""

import numpy as np
import pytest

from graph_data_science_ray import Graph, node2vec
from graph_data_science_ray.pipelines.node2vec import _pairs_from_paths


class TestPairGeneration:
    def test_window_pairs(self):
        paths = np.array([[0, 1, 2, 3, -1]])
        lens = np.array([4])
        c, x = _pairs_from_paths(paths, lens, window=2)
        got = sorted(zip(c.tolist(), x.tolist()))
        exp = sorted([(0, 1), (1, 0), (1, 2), (2, 1), (2, 3), (3, 2),
                      (0, 2), (2, 0), (1, 3), (3, 1)])
        assert got == exp

    def test_short_walks(self):
        paths = np.array([[5, -1, -1], [7, 8, -1]])
        lens = np.array([1, 2])
        c, x = _pairs_from_paths(paths, lens, window=3)
        assert sorted(zip(c.tolist(), x.tolist())) == [(7, 8), (8, 7)]


def _two_cliques(k=8):
    """Two k-cliques joined by one bridge edge: within-clique pairs must
    embed closer than cross-clique pairs."""
    edges = []
    for base in (0, k):
        for i in range(k):
            for j in range(i + 1, k):
                edges.append((base + i, base + j))
    edges.append((0, k))
    return Graph.from_edges([e[0] for e in edges], [e[1] for e in edges],
                            n=2 * k, orientation="undirected")


def _cos(a, b):
    return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12))


class TestNode2Vec:
    def test_determinism(self):
        g = _two_cliques()
        t1 = node2vec(g, embedding_dimension=32, walks_per_node=4,
                      walk_length=20, iterations=2, seed=5)
        t2 = node2vec(g, embedding_dimension=32, walks_per_node=4,
                      walk_length=20, iterations=2, seed=5)
        e1 = np.asarray(t1.column("embedding").to_pylist())
        e2 = np.asarray(t2.column("embedding").to_pylist())
        np.testing.assert_array_equal(e1, e2)
        t3 = node2vec(g, embedding_dimension=32, walks_per_node=4,
                      walk_length=20, iterations=2, seed=6)
        assert not np.array_equal(
            e1, np.asarray(t3.column("embedding").to_pylist()))

    def test_community_structure(self):
        g = _two_cliques(8)
        t = node2vec(g, embedding_dimension=32, walks_per_node=20,
                     walk_length=30, window_size=5, iterations=20,
                     initial_learning_rate=0.1, seed=3)
        e = np.asarray(t.column("embedding").to_pylist())
        within, across = [], []
        for i in range(8):
            for j in range(i + 1, 8):
                within.append(_cos(e[i], e[j]))
                within.append(_cos(e[8 + i], e[8 + j]))
                across.append(_cos(e[i], e[8 + j]))
        assert np.mean(within) > np.mean(across) + 0.1

    def test_ray_execution_structure(self):
        """The sharded-actor path (node2vec_sharded.train_sharded): same
        structure + determinism invariants as local; no n×d driver arrays
        (embeddings live in vid-range shard actors)."""
        g = _two_cliques(8)
        t = node2vec(g, embedding_dimension=32, walks_per_node=20,
                     walk_length=30, window_size=5, iterations=16,
                     initial_learning_rate=0.2, seed=3,
                     execution="ray", num_partitions=2)
        e = np.asarray(t.column("embedding").to_pylist())
        assert e.shape == (16, 32)
        within = [_cos(e[i], e[j]) for i in range(8) for j in range(i + 1, 8)]
        across = [_cos(e[i], e[8 + j]) for i in range(8) for j in range(8)]
        assert np.mean(within) > np.mean(across) + 0.1
        # deterministic too
        t2 = node2vec(g, embedding_dimension=32, walks_per_node=20,
                      walk_length=30, window_size=5, iterations=16,
                      initial_learning_rate=0.2, seed=3,
                      execution="ray", num_partitions=2)
        np.testing.assert_array_equal(
            e, np.asarray(t2.column("embedding").to_pylist()))

    def test_ray_as_dataset(self):
        """as_dataset=True returns the embeddings as a Dataset built from the
        per-shard refs — the n×d table never concatenated on the driver."""
        g = _two_cliques(4)
        ds = node2vec(g, embedding_dimension=8, walks_per_node=4,
                      walk_length=10, iterations=2, seed=5,
                      execution="ray", num_partitions=2, as_dataset=True)
        rows = ds.take_all()
        assert sorted(r["vid"] for r in rows) == list(range(8))
        assert all(len(r["embedding"]) == 8 for r in rows)
        with pytest.raises(ValueError):
            node2vec(g, execution="local", as_dataset=True)

    def test_isolated_nodes(self):
        g = Graph.from_edges([0, 1], [1, 0], n=4)
        t = node2vec(g, embedding_dimension=8, walks_per_node=2,
                     walk_length=5, iterations=1, seed=1)
        assert t.num_rows == 4
        e = np.asarray(t.column("embedding").to_pylist())
        assert np.isfinite(e).all()


class TestShardedWalks:
    """The sharded walk phase (node2vec_sharded): counter-based randomness
    makes the walk corpus P-independent — pairs and visit frequencies must
    EQUAL the driver-side reference kernel at any shard count."""

    def _rand_graph(self, n, m, seed):
        rng = np.random.default_rng(seed)
        return Graph.from_edges(rng.integers(0, n, m), rng.integers(0, n, m),
                                n=n, orientation="undirected",
                                aggregation="single")

    @pytest.mark.parametrize("parts", [1, 2, 3])
    def test_first_order_equality(self, parts):
        from graph_data_science_ray.pipelines.node2vec_sharded import (
            sharded_walk_pairs, walk_pairs_reference)
        g = self._rand_graph(300, 1800, seed=21)
        kw = dict(walks_per_node=3, walk_length=12, window=4, seed=9)
        rc, rx, rfreq = walk_pairs_reference(g, **kw)
        sc, sx, sfreq = sharded_walk_pairs(g, num_partitions=parts, **kw)
        np.testing.assert_array_equal(rfreq, sfreq)
        ref = sorted(zip(rc.tolist(), rx.tolist()))
        got = sorted(zip(sc.tolist(), sx.tolist()))
        assert ref == got

    @pytest.mark.parametrize("parts", [2, 3])
    def test_biased_equality(self, parts):
        """p=0.5, q=2.0: the membership exchange path."""
        from graph_data_science_ray.pipelines.node2vec_sharded import (
            sharded_walk_pairs, walk_pairs_reference)
        g = self._rand_graph(200, 1400, seed=22)
        kw = dict(walks_per_node=2, walk_length=10, window=3,
                  return_factor=0.5, in_out_factor=2.0, seed=4)
        rc, rx, rfreq = walk_pairs_reference(g, **kw)
        sc, sx, sfreq = sharded_walk_pairs(g, num_partitions=parts, **kw)
        np.testing.assert_array_equal(rfreq, sfreq)
        assert sorted(zip(rc.tolist(), rx.tolist())) == \
            sorted(zip(sc.tolist(), sx.tolist()))

    def test_sinks_and_isolates(self):
        from graph_data_science_ray.pipelines.node2vec_sharded import (
            sharded_walk_pairs, walk_pairs_reference)
        # 0->1->2 (2 is a sink), 3 isolated
        g = Graph.from_edges([0, 1], [1, 2], n=4)
        kw = dict(walks_per_node=2, walk_length=5, window=2, seed=1)
        rc, rx, rfreq = walk_pairs_reference(g, **kw)
        sc, sx, sfreq = sharded_walk_pairs(g, num_partitions=2, **kw)
        np.testing.assert_array_equal(rfreq, sfreq)
        assert rfreq[3] == 2  # isolate: counted at position 0 only
        assert sorted(zip(rc.tolist(), rx.tolist())) == \
            sorted(zip(sc.tolist(), sx.tolist()))


class TestDistributedRandomWalks:
    """random_walks(execution='ray'): the corpus comes back as a Dataset of
    per-shard tables; P-independent, edge-valid, sink-correct."""

    def _collect(self, ds):
        rows = ds.take_all()
        return {r["walk_id"]: (r["start_node"], tuple(r["path"]))
                for r in rows}

    def test_p_independence_and_validity(self):
        from graph_data_science_ray import Graph, random_walks
        rng = np.random.default_rng(31)
        n, m = 150, 900
        g = Graph.from_edges(rng.integers(0, n, m), rng.integers(0, n, m),
                             n=n, orientation="undirected",
                             aggregation="single")
        a = self._collect(random_walks(g, walks_per_node=2, walk_length=8,
                                       seed=3, execution="ray",
                                       num_partitions=2))
        b = self._collect(random_walks(g, walks_per_node=2, walk_length=8,
                                       seed=3, execution="ray",
                                       num_partitions=3))
        assert a == b
        assert len(a) == n * 2
        # every consecutive hop is a real edge; starts match walker ids
        sh = g.shards(1, "natural")[0]
        adj = {u: set(sh.indices[sh.indptr[u]:sh.indptr[u + 1]].tolist())
               for u in range(n)}
        for wid, (start, path) in a.items():
            assert path[0] == start == wid // 2
            for u, v in zip(path, path[1:]):
                assert v in adj[u], (wid, path)

    def test_biased_and_sinks(self):
        from graph_data_science_ray import Graph, random_walks
        # chain 0->1->2 (2 sink), isolate 3: every walk from 2 is length 1
        g = Graph.from_edges([0, 1], [1, 2], n=4)
        d = self._collect(random_walks(g, walks_per_node=2, walk_length=6,
                                       return_factor=0.5, in_out_factor=2.0,
                                       seed=7, execution="ray",
                                       num_partitions=2))
        assert len(d) == 8
        for wid, (start, path) in d.items():
            if start == 2:
                assert path == (2,)
            if start == 3:
                assert path == (3,)
            if start == 0:
                assert path == (0, 1, 2)  # forced chain, stops at the sink
        import pytest as _pytest
        with _pytest.raises(ValueError):
            random_walks(g, source_nodes=np.array([0]), execution="ray")


def test_ray_single_partition_training():
    """P==1: Ray doesn't split 1-tuples at num_returns=1 — every exchange
    method must return bare elements (regression for _N2VShard._ret)."""
    g = _two_cliques(4)
    t = node2vec(g, embedding_dimension=8, walks_per_node=4, walk_length=10,
                 window_size=3, iterations=2, seed=5, execution="ray",
                 num_partitions=1)
    e = np.asarray(t.column("embedding").to_pylist())
    assert e.shape == (8, 8) and np.isfinite(e).all() and (e != 0).any()
