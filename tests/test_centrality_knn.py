"""Betweenness (Brandes) vs reference fixtures
(BetweennessCentralityTest.java:60-133), K1-coloring validity, standalone
modularity optimization, exact kNN graph vs brute force."""

import numpy as np
import pytest

from graph_data_science_ray import Graph
from graph_data_science_ray.pipelines.betweenness import betweenness_centrality
from graph_data_science_ray.pipelines.coloring import (k1_coloring,
                                                       modularity_optimization)


def _bc(graph, undirected=False, **kw):
    t = betweenness_centrality(graph, undirected=undirected, **kw)
    return t.column("centrality").to_numpy(zero_copy_only=False)


class TestBetweenness:
    def test_line(self):
        g = Graph.from_edge_list([("a", "b"), ("b", "c"), ("c", "d"), ("d", "e")],
                                 nodes=list("abcde"))
        np.testing.assert_allclose(_bc(g), [0, 3, 4, 3, 0])

    def test_cycle(self):
        g = Graph.from_edge_list([("a", "b"), ("b", "c"), ("c", "a")],
                                 nodes=list("abc"))
        np.testing.assert_allclose(_bc(g), [1, 1, 1])

    def test_clique5_directed_and_undirected(self):
        edges = [("a", "b"), ("a", "c"), ("a", "d"), ("a", "e"), ("b", "c"),
                 ("b", "d"), ("b", "e"), ("c", "d"), ("c", "e"), ("d", "e")]
        g = Graph.from_edge_list(edges, nodes=list("abcde"))
        np.testing.assert_allclose(_bc(g), np.zeros(5))
        gu = Graph.from_edge_list(edges, nodes=list("abcde"),
                                  orientation="undirected")
        np.testing.assert_allclose(_bc(gu, undirected=True), np.zeros(5))

    def test_connected_cycles(self):
        edges = [("a", "b"), ("b", "c"), ("c", "a"), ("d", "e"), ("e", "f"),
                 ("f", "d"), ("a", "d"), ("d", "a")]
        g = Graph.from_edge_list(edges, nodes=list("abcdef"))
        np.testing.assert_allclose(_bc(g), [13, 4, 4, 13, 4, 4])

    def test_disconnected_cycles(self):
        edges = [("a", "b"), ("b", "c"), ("c", "a"), ("d", "e"), ("e", "f"),
                 ("f", "d")]
        g = Graph.from_edge_list(edges, nodes=list("abcdef"))
        np.testing.assert_allclose(_bc(g), np.ones(6))

    def test_diamond_directed_and_undirected(self):
        nodes = ["a1", "a2", "b", "c", "d", "e", "f"]
        edges = [("a1", "b"), ("a2", "b"), ("b", "c"), ("b", "d"), ("c", "e"),
                 ("d", "e"), ("e", "f")]
        g = Graph.from_edge_list(edges, nodes=nodes)
        np.testing.assert_allclose(_bc(g), [0, 0, 8, 3, 3, 5, 0])
        gu = Graph.from_edge_list(edges, nodes=nodes, orientation="undirected")
        np.testing.assert_allclose(_bc(gu, undirected=True),
                                   [0, 0, 9.5, 3, 3, 5.5, 0])

    def test_distributed_matches_local(self):
        rng = np.random.default_rng(31)
        n, m = 120, 600
        g = Graph.from_edges(rng.integers(0, n, m), rng.integers(0, n, m), n=n,
                             aggregation="single")
        np.testing.assert_allclose(_bc(g, execution="ray"),
                                   _bc(g, execution="local"), atol=1e-9)

    def test_sampling_bounds(self):
        g = Graph.from_edge_list([("a", "b"), ("b", "c"), ("c", "d"), ("d", "e")],
                                 nodes=list("abcde"))
        full = _bc(g)
        sampled = _bc(g, sampling_size=2, seed=7)
        assert (sampled <= full + 1e-12).all()  # subset of sources
        assert np.allclose(_bc(g, sampling_size=0), 0.0)


class TestColoring:
    def test_valid_coloring_random(self):
        rng = np.random.default_rng(32)
        n, m = 200, 1200
        g = Graph.from_edges(rng.integers(0, n, m), rng.integers(0, n, m), n=n,
                             aggregation="single")
        res = k1_coloring(g)
        assert res["did_converge"] and res["conflicts"] == 0
        assert res["color_count"] >= 1

    def test_bipartite_uses_two_colors(self):
        edges = [(i, 10 + j) for i in range(10) for j in range(10)]
        g = Graph.from_edges([e[0] for e in edges], [e[1] for e in edges], n=20)
        res = k1_coloring(g)
        assert res["conflicts"] == 0
        assert res["color_count"] == 2


class TestModularityOptimization:
    def test_two_cliques(self):
        edges = []
        for base in (0, 4):
            for i in range(4):
                for j in range(i + 1, 4):
                    edges.append((base + i, base + j))
        edges.append((0, 4))
        g = Graph.from_edges([e[0] for e in edges], [e[1] for e in edges],
                             n=8, orientation="undirected")
        res = modularity_optimization(g)
        comm = res["table"].column("community").to_numpy(zero_copy_only=False)
        assert len(set(comm[:4])) == 1 and len(set(comm[4:])) == 1
        assert res["modularity"] > 0.3 and res["did_converge"]


class TestKnnGraph:
    def test_matches_bruteforce(self):
        import ray.data

        from graph_data_science_ray.functions.knn import knn_graph
        rng = np.random.default_rng(33)
        n, d, k = 60, 8, 5
        vecs = rng.standard_normal((n, d))
        ds = ray.data.from_items(
            [{"vec_id": i, "embedding": vecs[i].tolist()} for i in range(n)])
        t = knn_graph(ds, k=k, batch_size=16)
        assert t.num_rows == n * k
        norms = np.linalg.norm(vecs, axis=1)
        sims = (vecs / norms[:, None]) @ (vecs / norms[:, None]).T
        np.fill_diagonal(sims, -np.inf)
        got = {}
        for a, b, s in zip(t.column("node1").to_pylist(),
                           t.column("node2").to_pylist(),
                           t.column("similarity").to_pylist()):
            got.setdefault(a, []).append((b, s))
        for i in range(n):
            exp_order = np.lexsort((np.arange(n), -sims[i]))[:k]
            got_ids = [b for b, _ in got[i]]
            assert got_ids == exp_order.tolist(), i
            for (b, s) in got[i]:
                assert abs(s - sims[i, b]) < 1e-9


class TestFastRP:
    """Structural conformance, mirroring the reference's FastRPTest strategy:
    determinism per seed, per-iteration unit norms bounding the result,
    identical neighborhoods ⇒ identical embeddings under default weights."""

    def _graph(self):
        rng = np.random.default_rng(41)
        n, m = 50, 300
        return Graph.from_edges(rng.integers(0, n, m), rng.integers(0, n, m),
                                n=n, aggregation="single")

    def test_shape_and_determinism(self):
        from graph_data_science_ray.pipelines.fastrp import fastrp
        g = self._graph()
        t1 = fastrp(g, embedding_dimension=32, seed=7, execution="local")
        t2 = fastrp(g, embedding_dimension=32, seed=7, execution="local")
        e1 = np.asarray(t1.column("embedding").to_pylist())
        e2 = np.asarray(t2.column("embedding").to_pylist())
        assert e1.shape == (50, 32)
        np.testing.assert_array_equal(e1, e2)
        t3 = fastrp(g, embedding_dimension=32, seed=8, execution="local")
        assert not np.array_equal(
            e1, np.asarray(t3.column("embedding").to_pylist()))

    def test_norm_bound(self):
        from graph_data_science_ray.pipelines.fastrp import fastrp
        g = self._graph()
        t = fastrp(g, embedding_dimension=64, iteration_weights=(0.0, 1.0, 1.0),
                   execution="local")
        e = np.asarray(t.column("embedding").to_pylist(), dtype=np.float64)
        norms = np.linalg.norm(e, axis=1)
        assert (norms <= 2.0 + 1e-5).all()  # Σ|w| bound, unit per iteration

    def test_same_neighborhood_same_embedding(self):
        """Default weights start at 0.0: the init vector never contributes, so
        two nodes with identical out-neighborhoods embed identically."""
        from graph_data_science_ray.pipelines.fastrp import fastrp
        # nodes 0 and 1 both point at {2, 3}; 2,3 point at 4
        g = Graph.from_edges([0, 0, 1, 1, 2, 3], [2, 3, 2, 3, 4, 4], n=5)
        t = fastrp(g, embedding_dimension=64, execution="local")
        e = np.asarray(t.column("embedding").to_pylist())
        np.testing.assert_allclose(e[0], e[1], atol=1e-6)
        assert np.abs(e[0]).sum() > 0

    def test_distributed_matches_local(self):
        from graph_data_science_ray.pipelines.fastrp import fastrp
        g = self._graph()
        tl = fastrp(g, embedding_dimension=16, seed=3, execution="local")
        tr = fastrp(g, embedding_dimension=16, seed=3, execution="ray")
        np.testing.assert_allclose(
            np.asarray(tl.column("embedding").to_pylist(), dtype=np.float64),
            np.asarray(tr.column("embedding").to_pylist(), dtype=np.float64),
            atol=1e-6)

    def test_self_influence_only(self):
        from graph_data_science_ray.pipelines.fastrp import fastrp
        g = self._graph()
        t = fastrp(g, embedding_dimension=32, iteration_weights=(),
                   node_self_influence=1.0, execution="local")
        e = np.asarray(t.column("embedding").to_pylist(), dtype=np.float64)
        norms = np.linalg.norm(e, axis=1)
        assert np.allclose(norms[norms > 0], 1.0, atol=1e-5)


class TestConductance:
    def test_fixture(self):
        """ConductanceStreamProcTest: communities {a,b,c}=0, {d,e,f,g}=1, h=-1;
        unweighted expected 5/7 and 4/5."""
        from graph_data_science_ray.pipelines.coloring import conductance
        nodes = list("abcdefgh")
        edges = [("a", "b", 81.0), ("a", "d", 7.0), ("b", "d", 1.0),
                 ("b", "g", 1.0), ("b", "h", 3.0), ("c", "b", 45.0),
                 ("c", "e", 3.0), ("d", "c", 3.0), ("e", "b", 1.0),
                 ("f", "a", 3.0), ("g", "c", 4.0), ("g", "g", 999.0),
                 ("h", "a", 2.0)]
        g = Graph.from_edge_list(edges, nodes=nodes)
        comm = np.array([0, 0, 0, 1, 1, 1, 1, -1], dtype=np.int64)
        res = conductance(g, comm)
        got = dict(zip(res["table"].column("community").to_pylist(),
                       res["table"].column("conductance").to_pylist()))
        assert got[0] == pytest.approx(5.0 / 7.0, abs=1e-4)
        assert got[1] == pytest.approx(4.0 / 5.0, abs=1e-4)

    def test_weighted(self):
        from graph_data_science_ray.pipelines.coloring import conductance
        g = Graph.from_edge_list([("a", "b", 10.0), ("a", "c", 30.0)],
                                 nodes=list("abc"))
        res = conductance(g, np.array([0, 0, 1]), weighted=True)
        got = dict(zip(res["table"].column("community").to_pylist(),
                       res["table"].column("conductance").to_pylist()))
        assert got[0] == pytest.approx(30.0 / 40.0)


class TestKnnMetrics:
    def test_euclidean_and_pearson_vs_bruteforce(self):
        import ray.data

        from graph_data_science_ray.functions.knn import knn_graph
        rng = np.random.default_rng(34)
        n, d, k = 40, 6, 4
        vecs = rng.standard_normal((n, d))
        ds = ray.data.from_items(
            [{"vec_id": i, "embedding": vecs[i].tolist()} for i in range(n)])
        # euclidean: nearest by L2
        t = knn_graph(ds, k=k, batch_size=16, metric="euclidean")
        for i in range(3):
            got = [b for a, b in zip(t.column("node1").to_pylist(),
                                     t.column("node2").to_pylist()) if a == i]
            dist = np.linalg.norm(vecs - vecs[i], axis=1)
            dist[i] = np.inf
            exp = np.lexsort((np.arange(n), dist))[:k]
            assert got == exp.tolist(), i
        # pearson: cosine of centered vectors
        t2 = knn_graph(ds, k=k, batch_size=16, metric="pearson")
        c = vecs - vecs.mean(axis=1, keepdims=True)
        cn = c / np.linalg.norm(c, axis=1)[:, None]
        sims = cn @ cn.T
        np.fill_diagonal(sims, -np.inf)
        for i in range(3):
            got = [b for a, b in zip(t2.column("node1").to_pylist(),
                                     t2.column("node2").to_pylist()) if a == i]
            exp = np.lexsort((np.arange(n), -sims[i]))[:k]
            assert got == exp.tolist(), i


class TestMsbfs:
    def test_matches_per_source_bfs(self):
        from graph_data_science_ray.pipelines.centrality import (
            _bfs_accumulate, _msbfs_accumulate)
        rng = np.random.default_rng(71)
        for trial, (n, m) in enumerate([(150, 600), (200, 300), (70, 2000)]):
            g = Graph.from_edges(rng.integers(0, n, m),
                                 rng.integers(0, n, m), n=n,
                                 aggregation="single")
            sh = g.shards(1, "natural")[0]
            src = np.arange(n, dtype=np.int64)
            for harmonic in (False, True):
                a1, r1 = _bfs_accumulate(n, sh.indptr, sh.indices, src,
                                         harmonic)
                a2, r2 = _msbfs_accumulate(n, sh.indptr, sh.indices, src,
                                           harmonic)
                np.testing.assert_allclose(a1, a2, atol=1e-9), (trial, harmonic)
                np.testing.assert_array_equal(r1, r2)

    def test_batch_boundary(self):
        """n just over a 64-batch boundary exercises the partial last batch."""
        from graph_data_science_ray.pipelines.centrality import (
            _bfs_accumulate, _msbfs_accumulate)
        rng = np.random.default_rng(72)
        n, m = 130, 500
        g = Graph.from_edges(rng.integers(0, n, m), rng.integers(0, n, m),
                             n=n, aggregation="single")
        sh = g.shards(1, "natural")[0]
        src = np.arange(n, dtype=np.int64)
        a1, r1 = _bfs_accumulate(n, sh.indptr, sh.indices, src, False)
        a2, r2 = _msbfs_accumulate(n, sh.indptr, sh.indices, src, False)
        np.testing.assert_allclose(a1, a2, atol=1e-9)
        np.testing.assert_array_equal(r1, r2)

    def test_popcount(self):
        from graph_data_science_ray.pipelines.centrality import _popcount64
        x = np.array([0, 1, 3, (1 << 64) - 1, 1 << 63], dtype=np.uint64)
        np.testing.assert_array_equal(_popcount64(x), [0, 1, 2, 64, 1])


class TestCosineTopKInt8:
    def test_recall_vs_exact_and_sim_accuracy(self):
        import pyarrow as pa
        import ray.data as rd

        from graph_data_science_ray.functions.similarity import (
            cosine_topk, cosine_topk_int8)
        rng = np.random.default_rng(12)
        vecs = rng.normal(0, 1, (500, 24))
        t = pa.table({"vec_id": pa.array(range(500), pa.int64()),
                      "embedding": pa.array([list(v) for v in vecs],
                                            pa.list_(pa.float64()))})
        ds = rd.from_arrow(t).repartition(6)
        q = list(rng.normal(0, 1, 24))
        exact = cosine_topk(ds, q, k=10).to_pandas()
        got = cosine_topk_int8(ds, q, k=10).to_pandas()
        overlap = len(set(exact.vec_id) & set(got.vec_id))
        assert overlap >= 8  # int8 quantization: high but not perfect recall
        # similarity values close to the float kernel for shared ids
        e = exact.set_index("vec_id").cos_sim
        g = got.set_index("vec_id").cos_sim
        for vid in set(exact.vec_id) & set(got.vec_id):
            assert abs(e.loc[vid] - g.loc[vid]) < 0.05
