"""SQL-engine numeric compatibility (functions/compat.py) + the distributed
kNN-graph rewrite (functions/knn.py): DuckDB-equal rounding and float32
cosine, and the no-driver-materialization contract."""

import numpy as np
import pyarrow as pa
import pytest

from graph_data_science_ray.functions.compat import (cosine_f32_sequential,
                                                     round_half_away)


class TestRoundHalfAway:
    def test_halfway_cases(self):
        # np.round is half-to-even: 0.0078125 -> 0.007812; SQL -> 0.007813
        got = round_half_away([0.0078125, -0.0078125, 1.0 / 128, 3.0 / 256])
        np.testing.assert_array_equal(
            got, [0.007813, -0.007813, 0.007813, 0.011719])

    def test_matches_duckdb_on_random_doubles(self):
        import duckdb
        rng = np.random.default_rng(7)
        vals = np.concatenate([rng.random(5000) * 0.01, rng.random(2000),
                               -rng.random(2000), rng.random(100) * 1e4])
        con = duckdb.connect()
        con.register("t", pa.table({"v": vals}))
        d = con.execute("select round(v, 6) r from t").fetchnumpy()["r"]
        np.testing.assert_array_equal(round_half_away(vals), d)

    def test_plain_values_match_np_round(self):
        # away from halfway points the two roundings agree
        vals = np.array([0.1234561, -5.9999994, 123.000001, 0.0])
        np.testing.assert_array_equal(round_half_away(vals),
                                      np.round(vals, 6))


class TestCosineF32Sequential:
    def test_matches_duckdb_list_cosine_similarity(self):
        import duckdb
        rng = np.random.default_rng(11)
        n, d = 80, 64
        vecs = rng.standard_normal((n, d)).astype(np.float32)
        con = duckdb.connect()
        con.register("e", pa.table({
            "vec_id": np.arange(n),
            "embedding": pa.array(list(vecs), pa.list_(pa.float32()))}))
        duck = con.execute(
            "select a.vec_id i, b.vec_id j, "
            "list_cosine_similarity(a.embedding, b.embedding) s "
            "from e a join e b on a.vec_id <> b.vec_id order by i, j"
        ).fetchnumpy()
        sims = cosine_f32_sequential(vecs, vecs)
        mine = sims[duck["i"], duck["j"]]
        # bit-equal, not allclose — this is the whole point of the kernel
        np.testing.assert_array_equal(mine, duck["s"])


class TestKnnGraphDistributed:
    def _ds(self, vecs, nblocks=4):
        import ray.data
        ds = ray.data.from_items(
            [{"vec_id": i, "embedding": vecs[i].tolist()}
             for i in range(len(vecs))])
        return ds.repartition(nblocks)

    def test_multiblock_matches_bruteforce(self):
        from graph_data_science_ray.functions.knn import knn_graph
        rng = np.random.default_rng(5)
        n, d, k = 50, 8, 4
        vecs = rng.standard_normal((n, d))
        t = knn_graph(self._ds(vecs), k=k, batch_size=7)
        norms = np.linalg.norm(vecs, axis=1)
        sims = (vecs / norms[:, None]) @ (vecs / norms[:, None]).T
        np.fill_diagonal(sims, -np.inf)
        got = {}
        for a, b in zip(t.column("node1").to_pylist(),
                        t.column("node2").to_pylist()):
            got.setdefault(a, []).append(b)
        for i in range(n):
            exp = np.lexsort((np.arange(n), -sims[i]))[:k]
            assert sorted(got[i]) == sorted(exp.tolist()), i

    def test_no_driver_materialization(self, monkeypatch):
        """The operator must consume the Dataset via object-store refs only:
        iter_batches / take_all / to_pandas on the driver are forbidden."""
        import ray.data

        from graph_data_science_ray.functions.knn import knn_graph

        def _boom(*a, **k):
            raise AssertionError("driver-side materialization in knn_graph")

        monkeypatch.setattr(ray.data.Dataset, "iter_batches", _boom)
        monkeypatch.setattr(ray.data.Dataset, "take_all", _boom)
        monkeypatch.setattr(ray.data.Dataset, "to_pandas", _boom)
        rng = np.random.default_rng(6)
        vecs = rng.standard_normal((30, 4))
        t = knn_graph(self._ds(vecs, nblocks=3), k=3)
        assert t.num_rows == 30 * 3

    def test_f32seq_mode_ties_to_smaller_id(self):
        from graph_data_science_ray.functions.knn import knn_graph
        # duplicated vectors create exact similarity ties
        base = np.eye(4, dtype=np.float32)
        vecs = np.concatenate([base, base])  # ids 0-3 == ids 4-7
        t = knn_graph(self._ds(vecs.astype(np.float64), nblocks=2), k=2,
                      arithmetic="f32seq")
        rows = {}
        for a, b in zip(t.column("node1").to_pylist(),
                        t.column("node2").to_pylist()):
            rows.setdefault(a, []).append(b)
        # node 0's best is its duplicate (sim 1.0, node 4); the next are
        # orthogonal ties broken toward the smallest id (1)
        assert rows[0][0] == 4 and rows[0][1] == 1

    def test_f32seq_requires_cosine(self):
        from graph_data_science_ray.functions.knn import knn_graph
        with pytest.raises(ValueError):
            knn_graph(self._ds(np.eye(3)), metric="euclidean",
                      arithmetic="f32seq")
