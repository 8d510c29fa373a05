"""Link-prediction pairwise functions (LinkPredictionFunc.java semantics) and
delta-stepping SSSP (ShortestPathDeltaStepping.java scaled-int semantics)."""

import heapq

import numpy as np
import pyarrow as pa
import pytest

from graph_data_science_ray import Graph, delta_stepping, link_prediction


def _brute_sets(edges, n, direction):
    out = [set() for _ in range(n)]
    inc = [set() for _ in range(n)]
    for s, d in edges:
        out[s].add(d)
        inc[d].add(s)
    if direction == "outgoing":
        return out
    if direction == "incoming":
        return inc
    return [out[v] | inc[v] for v in range(n)]


class TestLinkPrediction:
    EDGES = [(0, 1), (0, 2), (1, 2), (2, 3), (3, 1), (4, 2), (0, 3)]
    N = 6  # vertex 5 isolated

    def _graph(self, direction):
        # "both" uses an undirected single-aggregated graph so degree ==
        # |distinct neighbors| (canonical-edge contract in the module doc)
        if direction == "both":
            return Graph.from_edges(
                np.array([e[0] for e in self.EDGES]),
                np.array([e[1] for e in self.EDGES]), n=self.N,
                orientation="undirected", aggregation="single")
        return Graph.from_edges(np.array([e[0] for e in self.EDGES]),
                                np.array([e[1] for e in self.EDGES]),
                                n=self.N)

    def _pairs(self):
        a, b = np.meshgrid(np.arange(self.N), np.arange(self.N))
        a, b = a.ravel(), b.ravel()
        keep = a != b
        return pa.table({"a": a[keep].astype(np.int64),
                         "b": b[keep].astype(np.int64)})

    @pytest.mark.parametrize("direction", ["outgoing", "incoming", "both"])
    def test_structural_methods_vs_sets(self, direction):
        g = self._graph(direction)
        nbr = _brute_sets(self.EDGES, self.N, direction)
        deg = [len(nbr[v]) for v in range(self.N)]
        pairs = self._pairs()
        a = pairs.column("a").to_numpy()
        b = pairs.column("b").to_numpy()

        def expect(method):
            out = []
            for x, y in zip(a, b):
                common = nbr[x] & nbr[y]
                if method == "common_neighbors":
                    out.append(len(common))
                elif method == "total_neighbors":
                    out.append(len(nbr[x] | nbr[y]))
                elif method == "preferential_attachment":
                    out.append(deg[x] * deg[y])
                elif method == "adamic_adar":
                    with np.errstate(divide="ignore"):
                        out.append(sum(1.0 / np.log(deg[z]) for z in common))
                elif method == "resource_allocation":
                    with np.errstate(divide="ignore"):
                        out.append(float(sum(
                            1.0 / np.float64(deg[z]) for z in common)))
            return np.asarray(out, dtype=np.float64)

        for method in ("common_neighbors", "adamic_adar",
                       "resource_allocation", "preferential_attachment",
                       "total_neighbors"):
            got = link_prediction(g, pairs, method, direction=direction)
            np.testing.assert_allclose(got.column("score").to_numpy(),
                                       expect(method), atol=1e-12,
                                       err_msg=f"{method}/{direction}")

    def test_degree_one_common_neighbor_is_inf(self):
        # z's only both-neighbor is... build z with degree 1? impossible as a
        # COMMON neighbor in "both" (needs edges to both a and b) — use
        # "outgoing": z = 2 with out-degree 0 gives 1/log(0) = -0.0;
        # a common OUT-neighbor with out-degree 1 gives 1/log(1) = +inf.
        g = Graph.from_edges(np.array([0, 1, 2]), np.array([2, 2, 3]), n=4)
        t = link_prediction(g, pa.table({"a": [0], "b": [1]}), "adamic_adar",
                            direction="outgoing")
        assert np.isposinf(t.column("score")[0].as_py())  # deg_out(2) == 1

    def test_same_community(self):
        g = self._graph("both")
        comm = np.array([7, 7, 8, 8, 9, 9])
        t = link_prediction(g, pa.table({"a": [0, 0, 2], "b": [1, 2, 3]}),
                            "same_community", community=comm)
        assert t.column("score").to_pylist() == [1.0, 0.0, 1.0]

    def test_dataset_path_equals_table_path(self):
        import ray.data as rd
        g = self._graph("both")
        pairs = self._pairs()
        t1 = link_prediction(g, pairs, "adamic_adar")
        ds = link_prediction(g, rd.from_arrow(pairs), "adamic_adar")
        import ray
        tabs = [t for t in ray.get(ds.to_arrow_refs()) if t.num_rows]
        t2 = pa.concat_tables(tabs)
        d1 = t1.to_pandas().sort_values(["a", "b"]).reset_index(drop=True)
        d2 = t2.to_pandas().sort_values(["a", "b"]).reset_index(drop=True)
        np.testing.assert_allclose(d1["score"], d2["score"], atol=1e-12)


def _dijkstra_scaled(n, indptr, indices, icost, source):
    INF = np.int64(2**62)
    dist = np.full(n, INF, dtype=np.int64)
    dist[source] = 0
    h = [(0, source)]
    while h:
        d, u = heapq.heappop(h)
        if d > dist[u]:
            continue
        for e in range(indptr[u], indptr[u + 1]):
            v = indices[e]
            nd = d + icost[e]
            if nd < dist[v]:
                dist[v] = nd
                heapq.heappush(h, (nd, v))
    return dist


class TestDeltaStepping:
    def _random_weighted(self, n, m, seed):
        rng = np.random.default_rng(seed)
        src = rng.integers(0, n, m).astype(np.int64)
        dst = rng.integers(0, n, m).astype(np.int64)
        keep = src != dst
        w = np.round(rng.random(keep.sum()) * 10, 4) + 0.001
        return Graph.from_edges(src[keep], dst[keep], w, n=n)

    @pytest.mark.parametrize("delta", [0.5, 2.0, 20.0])
    def test_matches_scaled_dijkstra(self, delta):
        g = self._random_weighted(120, 700, seed=int(delta * 10))
        t = delta_stepping(g, 0, delta)
        sh = g.shards(1, "natural")[0]
        w = sh.weights if sh.weights is not None else np.ones(len(sh.indices))
        icost = np.round(w * 100_000.0).astype(np.int64)
        exp = _dijkstra_scaled(g.n, sh.indptr, sh.indices, icost, 0)
        got = t.column("distance").to_numpy()
        exp_f = np.where(exp >= 2**62, np.inf, exp / 100_000.0)
        np.testing.assert_allclose(got, exp_f, atol=0)

    def test_unreachable_is_inf(self):
        g = Graph.from_edges(np.array([0]), np.array([1]),
                             np.array([2.5]), n=3)
        t = delta_stepping(g, 0, 1.0)
        d = t.column("distance").to_numpy()
        assert d[0] == 0.0 and d[1] == 2.5 and np.isinf(d[2])

    def test_ray_equals_local(self):
        g = self._random_weighted(80, 400, seed=3)
        a = delta_stepping(g, 0, 1.5)
        b = delta_stepping(g, 0, 1.5, execution="ray")
        np.testing.assert_array_equal(a.column("distance").to_numpy(),
                                      b.column("distance").to_numpy())

    def test_rejects_tiny_delta(self):
        g = self._random_weighted(10, 20, seed=1)
        with pytest.raises(ValueError):
            delta_stepping(g, 0, 1e-9)


class TestOneHotEncoding:
    def test_reference_semantics(self):
        from graph_data_science_ray import one_hot_encoding
        # OneHotEncodingFuncTest semantics
        assert one_hot_encoding(["Chinese", "Indian", "Italian"],
                                ["Italian"]) == [0, 0, 1]
        assert one_hot_encoding(None, ["x"]) == []
        assert one_hot_encoding(["a", "b"], None) == [0, 0]
        assert one_hot_encoding(["a", "b"], ["c"]) == [0, 0]
        assert one_hot_encoding(["a", "b", "a"], ["a"]) == [1, 0, 1]

    def test_batch_form(self):
        import pyarrow as pa
        from graph_data_science_ray.functions.scalers import one_hot_batch
        t = pa.table({"vid": [0, 1, 2],
                      "tags": [["a", "c"], None, ["b"]]})
        out = one_hot_batch(t, list_col="tags", available_values=["a", "b", "c"])
        assert out.column("one_hot").to_pylist() == [[1, 0, 1], [0, 0, 0],
                                                     [0, 1, 0]]


class TestLinkpredReviewRegressions:
    def test_singleton_same_community_list(self):
        from graph_data_science_ray import link_prediction
        g = Graph.from_edges([0, 1], [1, 2], n=4)
        comm = np.array([7, 7, 8, 8])
        pairs = pa.table({"a": pa.array([0, 2], pa.int64()),
                          "b": pa.array([1, 3], pa.int64())})
        x = link_prediction(g, pairs, "same_community", community=comm)
        y = link_prediction(g, pairs, ["same_community"], community=comm)
        assert x.equals(y)

    def test_parquet_handle_clear_error(self):
        from graph_data_science_ray import link_prediction

        class _FakeParquetGraph:
            n = 4
        pairs = pa.table({"a": pa.array([0], pa.int64()),
                          "b": pa.array([1], pa.int64())})
        with pytest.raises(ValueError, match="in-memory"):
            link_prediction(_FakeParquetGraph(), pairs, "common_neighbors")
