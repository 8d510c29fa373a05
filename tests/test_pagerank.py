"""PageRank conformance vs the GDS golden fixtures (FIXTURES.md §2)."""

import numpy as np
import pytest

from graph_data_science_ray import Graph, article_rank, eigenvector, pagerank

EXPECTED_RANK = [0.3040965, 3.5604297, 3.1757906, 0.3625935, 0.7503465, 0.3625935,
                 0.15, 0.15, 0.15, 0.15, 0.15]


def scores(res):
    return res.table.column("score").to_numpy(zero_copy_only=False)


class TestUnweighted:
    def test_fixture_scores(self, pagerank_fixture_graph):
        res = pagerank(pagerank_fixture_graph, damping=0.85, tolerance=0,
                       max_iterations=41, execution="local")
        np.testing.assert_allclose(scores(res), EXPECTED_RANK, atol=1e-5)

    @pytest.mark.parametrize("tolerance,expected_iters", [(0.5, 2), (0.1, 13)])
    def test_tolerance_iterations(self, pagerank_fixture_graph, tolerance, expected_iters):
        # ref PageRankTest.java:126-139
        res = pagerank(pagerank_fixture_graph, tolerance=tolerance, max_iterations=40,
                       execution="local")
        assert res.ran_iterations == expected_iters
        assert res.did_converge

    def test_personalized(self, pagerank_fixture_graph):
        res = pagerank(pagerank_fixture_graph, damping=0.85, tolerance=0,
                       max_iterations=41, source_nodes=["a", "e"], execution="local")
        exp = [0.17053529152163158, 0.3216114449911402, 0.27329311398643763,
               0.048318333106500536, 0.17053529152163158, 0.048318333106500536,
               0, 0, 0, 0, 0]
        np.testing.assert_allclose(scores(res), exp, atol=1e-6)

    def test_personalized_kb(self, pagerank_fixture_graph):
        res = pagerank(pagerank_fixture_graph, damping=0.85, tolerance=0,
                       max_iterations=41, source_nodes=["k", "b"], execution="local")
        exp = [0.017454997930076894, 0.813246950528992, 0.690991752640184,
               0.041070583050331164, 0.1449550029964717, 0.041070583050331164,
               0, 0, 0, 0, 0.15000000000000002]
        np.testing.assert_allclose(scores(res), exp, atol=1e-6)


class TestWeighted:
    def test_weighted_fixture(self):
        # PageRankTest.java:242-272 — same topology, normalized weights
        edges = [("b", "c", 1.0), ("c", "b", 1.0), ("d", "a", 0.2), ("d", "b", 0.8),
                 ("e", "b", 0.10), ("e", "d", 0.70), ("e", "f", 0.20), ("f", "b", 0.7),
                 ("f", "e", 0.3), ("g", "b", 0.01), ("g", "e", 0.99), ("h", "b", 0.5),
                 ("h", "e", 0.5), ("i", "b", 0.5), ("i", "e", 0.5), ("j", "e", 1.0),
                 ("k", "e", 1.0)]
        g = Graph.from_edge_list(edges, nodes=list("abcdefghijk"))
        res = pagerank(g, damping=0.85, tolerance=0, max_iterations=41,
                       weighted=True, execution="local")
        exp = [0.24919, 3.69822, 3.29307, 0.58349, 0.72855, 0.27385,
               0.15, 0.15, 0.15, 0.15, 0.15]
        np.testing.assert_allclose(scores(res), exp, atol=1e-5)

    def test_zero_weights(self):
        # all-zero weights → degree 0 → everything stays at alpha
        # (PageRankTest.java:274-340)
        edges = [("a", "b", 0.0), ("b", "c", 0.0), ("c", "a", 0.0)]
        g = Graph.from_edge_list(edges)
        res = pagerank(g, weighted=True, tolerance=0, max_iterations=10,
                       execution="local")
        np.testing.assert_allclose(scores(res), [0.15] * 3, atol=1e-12)


class TestDocExample:
    """8-page web graph, doc-test oracle (page-rank.adoc)."""

    def test_unweighted(self, doc_web_graph):
        res = pagerank(doc_web_graph, max_iterations=20, damping=0.85,
                       execution="local")
        exp = {"Home": 3.215681999884452, "About": 1.0542700552146722,
               "Product": 1.0542700552146722, "Links": 1.0542700552146722,
               "Site A": 0.3278578964488539, "Site B": 0.3278578964488539,
               "Site C": 0.3278578964488539, "Site D": 0.3278578964488539}
        got = dict(zip(doc_web_graph.keys, scores(res)))
        for k, v in exp.items():
            assert got[k] == pytest.approx(v, abs=1e-6), k

    def test_weighted(self, doc_web_graph):
        res = pagerank(doc_web_graph, max_iterations=20, weighted=True,
                       execution="local")
        exp = {"Home": 3.53751028396339, "About": 0.7452612763883698,
               "Product": 1.9357838291651097, "Links": 0.7452612763883698,
               "Site A": 0.18152677135466103}
        got = dict(zip(doc_web_graph.keys, scores(res)))
        for k, v in exp.items():
            assert got[k] == pytest.approx(v, abs=1e-6), k

    def test_damping_005(self, doc_web_graph):
        res = pagerank(doc_web_graph, max_iterations=20, damping=0.05,
                       execution="local")
        got = dict(zip(doc_web_graph.keys, scores(res)))
        assert got["Home"] == pytest.approx(1.2487309425844906, abs=1e-6)
        assert got["Site A"] == pytest.approx(0.9597081216238426, abs=1e-6)

    def test_personalized_site_a(self, doc_web_graph):
        res = pagerank(doc_web_graph, max_iterations=20, source_nodes=["Site A"],
                       execution="local")
        got = dict(zip(doc_web_graph.keys, scores(res)))
        assert got["Home"] == pytest.approx(0.39902290442518784, abs=1e-6)
        assert got["Site A"] == pytest.approx(0.16890325301726694, abs=1e-6)
        assert got["Site B"] == pytest.approx(0.01890325301726691, abs=1e-6)

    def test_l1norm_scaler(self, doc_web_graph):
        res = pagerank(doc_web_graph, max_iterations=20, scaler="l1norm",
                       execution="local")
        got = dict(zip(doc_web_graph.keys, scores(res)))
        assert got["Home"] == pytest.approx(0.4181682554824872, abs=1e-6)
        assert got["Site A"] == pytest.approx(0.04263473956974027, abs=1e-6)


class TestArticleRank:
    def test_fixture(self):
        # PageRankTest.java ArticleRank nest — 10-node graph, 9 edges
        edges = [("b", "c"), ("c", "b"), ("d", "a"), ("d", "b"), ("e", "b"),
                 ("e", "d"), ("e", "f"), ("f", "b"), ("f", "e")]
        g = Graph.from_edge_list(edges, nodes=list("abcdefghij"))
        res = article_rank(g, damping=0.85, tolerance=0, max_iterations=40,
                           execution="local")
        exp = [0.20720, 0.47091, 0.36067, 0.19515, 0.20720, 0.19515,
               0.15, 0.15, 0.15, 0.15]
        np.testing.assert_allclose(scores(res), exp, atol=1e-5)

    def test_paper_graph(self):
        edges = [("b", "a"), ("c", "a"), ("c", "b"), ("d", "a"), ("d", "b"),
                 ("d", "c"), ("e", "a"), ("e", "b"), ("e", "c"), ("e", "d"),
                 ("f", "b"), ("f", "e"), ("g", "b"), ("g", "e")]
        g = Graph.from_edge_list(edges, nodes=list("abcdefg"))
        res = article_rank(g, damping=0.85, tolerance=0, max_iterations=40,
                           execution="local")
        exp = [0.34627, 0.31950, 0.21092, 0.18028, 0.21375, 0.15, 0.15]
        np.testing.assert_allclose(scores(res), exp, atol=1e-5)


class TestEigenvector:
    def test_power_iteration_reference(self, pagerank_fixture_graph):
        """Cross-check vs a dense NumPy power iteration of the same recurrence."""
        g = pagerank_fixture_graph
        n = g.n
        A = np.zeros((n, n))
        for s, d in zip(g.src, g.dst):
            A[d, s] += 1.0  # message from s arrives at d
        # GDS recursion (EigenvectorComputation.java:92-162): messages carry the
        # *un-normalized* next_rank; the added self-term is the L2-normalized one
        raw = np.full(n, 1.0 / n)
        norm = raw / np.linalg.norm(raw)
        for _ in range(79):
            new_raw = norm + A @ raw
            norm = new_raw / np.linalg.norm(new_raw)
            raw = new_raw
        res = eigenvector(g, tolerance=1e-12, max_iterations=80, execution="local")
        np.testing.assert_allclose(scores(res), norm, atol=1e-6)


class TestExecutionModes:
    def test_actor_matches_local(self, pagerank_fixture_graph):
        lo = pagerank(pagerank_fixture_graph, tolerance=0, max_iterations=41,
                      execution="local")
        ac = pagerank(pagerank_fixture_graph, tolerance=0, max_iterations=41,
                      execution="ray", num_partitions=3)
        np.testing.assert_allclose(scores(ac), scores(lo), atol=1e-6)
        assert ac.ran_iterations == lo.ran_iterations

    def test_ray_data_matches_local(self, pagerank_fixture_graph):
        lo = pagerank(pagerank_fixture_graph, tolerance=0, max_iterations=6,
                      execution="local")
        rd = pagerank(pagerank_fixture_graph, tolerance=0, max_iterations=6,
                      execution="ray-data", num_partitions=3)
        np.testing.assert_allclose(scores(rd), scores(lo), atol=1e-9)

    def test_partition_count_invariance(self, pagerank_fixture_graph):
        one = pagerank(pagerank_fixture_graph, tolerance=0, max_iterations=41,
                       execution="local", num_partitions=1)
        four = pagerank(pagerank_fixture_graph, tolerance=0, max_iterations=41,
                        execution="local", num_partitions=4)
        np.testing.assert_allclose(scores(one), scores(four), atol=1e-9)


class TestValidation:
    def test_bad_damping(self, pagerank_fixture_graph):
        with pytest.raises(ValueError):
            pagerank(pagerank_fixture_graph, damping=1.5)

    def test_weighted_on_unweighted(self, pagerank_fixture_graph):
        with pytest.raises(ValueError):
            pagerank(pagerank_fixture_graph, weighted=True)
