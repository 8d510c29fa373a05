"""HITS conformance: the two reference fixtures (HitsTest.java pseudo-code
oracle on the 8-node GDL graph; hits.adoc 9-website doc example with published
scores) plus local-vs-sharded equality."""

import numpy as np
import pyarrow as pa
import pytest

from graph_data_science_ray import Graph
from graph_data_science_ray.pipelines.hits import hits


def _pseudo_code_hits(n, edges, k):
    """Row-for-row port of the WIKIPEDIA pseudo-code the reference test uses
    as its oracle (HitsTest.java:120-163) — naive loops, no vectorization."""
    auth = np.ones(n)
    hub = np.ones(n)
    out = [[] for _ in range(n)]
    inc = [[] for _ in range(n)]
    for s, d in edges:
        out[s].append(d)
        inc[d].append(s)
    for _ in range(k):
        new_auth = np.zeros(n)
        for v in range(n):
            for u in inc[v]:
                new_auth[v] += hub[u]
        norm = np.sqrt((new_auth ** 2).sum())
        auth = new_auth / (norm if norm > 0 else 1.0)
        new_hub = np.zeros(n)
        for u in range(n):
            for v in out[u]:
                new_hub[u] += auth[v]
        norm = np.sqrt((new_hub ** 2).sum())
        hub = new_hub / (norm if norm > 0 else 1.0)
    return auth, hub


# HitsTest.java GDL fixture (8 nodes a..h)
_GDL_EDGES = [("a", "d"), ("b", "c"), ("b", "e"), ("c", "a"), ("d", "c"),
              ("e", "d"), ("e", "b"), ("e", "f"), ("e", "c"), ("f", "c"),
              ("f", "h"), ("g", "a"), ("g", "c"), ("h", "a")]

# hits.adoc:196-226 doc example (9 websites A..I)
_DOC_EDGES = [("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"), ("b", "d"),
              ("c", "d"), ("e", "b"), ("e", "d"), ("e", "f"), ("e", "h"),
              ("f", "g"), ("f", "i"), ("f", "h"), ("g", "h"), ("g", "i"),
              ("h", "i")]

# hits.adoc:264-274 published stream results (hitsIterations=20)
_DOC_EXPECTED = {
    "a": (0.0, 0.5147630377521207),
    "b": (0.42644630743935796, 0.3573686670593437),
    "c": (0.3218729455718005, 0.23857061715828276),
    "d": (0.6463862608483191, 0.0),
    "e": (0.0, 0.640681017095129),
    "f": (0.23646490227616518, 0.2763222153580397),
    "g": (0.10200264424057169, 0.23867470447760597),
    "h": (0.426571816146601, 0.0812340105698113),
    "i": (0.22009646020698218, 0.0),
}


class TestHitsFixtures:
    def test_gdl_graph_matches_pseudo_code(self):
        nodes = list("abcdefgh")
        g = Graph.from_edge_list(_GDL_EDGES, nodes=nodes)
        t = hits(g, 30, execution="local")
        idx = {nm: i for i, nm in enumerate(nodes)}
        edges = [(idx[s], idx[d]) for s, d in _GDL_EDGES]
        exp_auth, exp_hub = _pseudo_code_hits(len(nodes), edges, 30)
        np.testing.assert_allclose(t.column("auth").to_numpy(), exp_auth,
                                   atol=1e-12)
        np.testing.assert_allclose(t.column("hub").to_numpy(), exp_hub,
                                   atol=1e-12)

    def test_doc_example_published_scores(self):
        nodes = list("abcdefghi")
        g = Graph.from_edge_list(_DOC_EDGES, nodes=nodes)
        t = hits(g, 20, execution="local")
        auth = t.column("auth").to_numpy()
        hub = t.column("hub").to_numpy()
        for i, nm in enumerate(nodes):
            ea, eh = _DOC_EXPECTED[nm]
            assert abs(auth[i] - ea) < 1e-12, (nm, auth[i], ea)
            assert abs(hub[i] - eh) < 1e-12, (nm, hub[i], eh)

    def test_doc_example_sharded_equals_published(self):
        nodes = list("abcdefghi")
        g = Graph.from_edge_list(_DOC_EDGES, nodes=nodes)
        t = hits(g, 20, execution="ray", num_partitions=3)
        for i, nm in enumerate(nodes):
            ea, eh = _DOC_EXPECTED[nm]
            assert abs(t.column("auth")[i].as_py() - ea) < 1e-12
            assert abs(t.column("hub")[i].as_py() - eh) < 1e-12


class TestHitsSharded:
    def _random_graph(self, n, m, seed):
        rng = np.random.default_rng(seed)
        src = rng.integers(0, n, m).astype(np.int64)
        dst = rng.integers(0, n, m).astype(np.int64)
        keep = src != dst
        return Graph.from_edges(src[keep], dst[keep], n=n)

    @pytest.mark.parametrize("P", [2, 3, 5])
    def test_local_vs_sharded(self, P):
        g = self._random_graph(200, 900, seed=P)
        a = hits(g, 15, execution="local")
        b = hits(g, 15, execution="ray", num_partitions=P)
        np.testing.assert_allclose(b.column("auth").to_numpy(),
                                   a.column("auth").to_numpy(), atol=1e-12)
        np.testing.assert_allclose(b.column("hub").to_numpy(),
                                   a.column("hub").to_numpy(), atol=1e-12)

    def test_sinks_and_isolates(self):
        # vertex 3 is a sink, vertex 4 isolated
        g = Graph.from_edges(np.array([0, 1, 2]), np.array([3, 3, 3]), n=5)
        t = hits(g, 10, execution="local")
        auth = t.column("auth").to_numpy()
        hub = t.column("hub").to_numpy()
        np.testing.assert_allclose(auth, [0, 0, 0, 1.0, 0], atol=1e-12)
        np.testing.assert_allclose(hub[:3], np.full(3, 1 / np.sqrt(3)),
                                   atol=1e-12)
        assert hub[3] == 0 and hub[4] == 0

    def test_no_edges_all_zero(self):
        g = Graph.from_edges(np.array([], dtype=np.int64),
                             np.array([], dtype=np.int64), n=4)
        t = hits(g, 5, execution="local")
        assert np.all(t.column("auth").to_numpy() == 0)
        assert np.all(t.column("hub").to_numpy() == 0)


class TestHitsParquetGraph:
    def test_ray_path_on_parquet_handle(self, tmp_path, ray_session):
        """The sharded path must accept a parquet-backed handle: reverse
        shards come from the layout's edges_rev over the natural bounds
        (review regression: _oriented_sorted only exists on in-memory Graph)."""
        import numpy as np

        from graph_data_science_ray import hits
        from graph_data_science_ray.state.graph import Graph, ParquetGraph
        rng = np.random.default_rng(9)
        src = rng.integers(0, 400, 2000)
        dst = rng.integers(0, 400, 2000)
        keep = src != dst
        g = Graph.from_edges(src[keep], dst[keep], n=400)
        d = str(tmp_path / "layout")
        g.save(d, num_partitions=3)
        t_mem = hits(g, hits_iterations=5, execution="ray", num_partitions=3)
        t_pq = hits(ParquetGraph(d), hits_iterations=5, execution="ray",
                    num_partitions=3)
        np.testing.assert_allclose(
            t_pq.column("auth").to_numpy(zero_copy_only=False),
            t_mem.column("auth").to_numpy(zero_copy_only=False), atol=1e-12)
        np.testing.assert_allclose(
            t_pq.column("hub").to_numpy(zero_copy_only=False),
            t_mem.column("hub").to_numpy(zero_copy_only=False), atol=1e-12)
