"""Deterministic hash sampling / splitting (functions/sampling.py)."""
import hashlib

import numpy as np
import pyarrow as pa
import pytest

from graph_data_science_ray.functions.sampling import (
    hash_sample, hash_split, sample_sql_predicate, _key_hashes)


def _ids_table(n=400):
    return pa.table({"key": pa.array(np.arange(n, dtype=np.int64)),
                     "val": pa.array(np.arange(n, dtype=np.float64) * 0.5)})


def _ids(ds):
    import ray
    out = []
    for ref in ds.to_arrow_refs():
        t = ray.get(ref)
        if t.num_rows and t.num_columns:
            out.extend(t.column("key").to_pylist())
    return sorted(out)


class TestHashSample:
    def test_matches_duckdb_predicate(self):
        """The exact rows DuckDB keeps under sample_sql_predicate."""
        import duckdb
        import ray.data
        tab = _ids_table()
        ds = ray.data.from_arrow(tab).repartition(7)
        got = _ids(hash_sample(ds, "key", 0.3, salt="s1"))
        pred = sample_sql_predicate("key", 0.3, salt="s1")
        want = sorted(r[0] for r in duckdb.connect().execute(
            f"SELECT key FROM tab WHERE {pred}").fetchall())
        assert got == want
        assert 0 < len(got) < 400

    def test_partition_independent(self):
        import ray.data
        tab = _ids_table()
        a = _ids(hash_sample(ray.data.from_arrow(tab), "key", 0.25))
        b = _ids(hash_sample(ray.data.from_arrow(tab).repartition(13),
                             "key", 0.25))
        assert a == b

    def test_string_keys_match_int_keys(self):
        """str(key) is the hash input, so int64 and varchar columns agree."""
        import ray.data
        tab = _ids_table(100)
        stab = pa.table({"key": pa.array([str(i) for i in range(100)]),
                         "val": tab.column("val")})
        a = [str(k) for k in _ids(hash_sample(ray.data.from_arrow(tab), "key", 0.4))]
        b = _ids(hash_sample(ray.data.from_arrow(stab), "key", 0.4))
        assert sorted(a) == sorted(b)

    def test_fraction_bounds(self):
        import ray.data
        ds = ray.data.from_arrow(_ids_table(10))
        with pytest.raises(ValueError):
            hash_sample(ds, "key", 1.5)
        with pytest.raises(ValueError):
            hash_sample(ds, "key", -0.1)
        assert _ids(hash_sample(ds, "key", 0.0)) == []
        assert len(_ids(hash_sample(ds, "key", 1.0))) == 10

    def test_null_keys_land_in_first_range(self):
        import ray.data
        tab = pa.table({"key": pa.array([None, None, 5], type=pa.int64())})
        kept = hash_sample(ray.data.from_arrow(tab), "key", 0.5)
        import ray
        rows = sum(ray.get(r).num_rows for r in kept.to_arrow_refs())
        # hash("") % 1e6 is fixed; nulls are all-in or all-out together
        null_in = (_key_hashes(pa.array([None], type=pa.int64()), "")[0]
                   % np.uint64(1_000_000)) < np.uint64(500_000)
        assert rows in (1, 3) and (rows == 3) == bool(null_in)


class TestHashSplit:
    def test_disjoint_exhaustive(self):
        import ray.data
        tab = _ids_table(500)
        parts = hash_split(ray.data.from_arrow(tab).repartition(5), "key",
                           {"train": 0.8, "val": 0.1, "test": 0.1}, salt="z")
        ids = {k: _ids(v) for k, v in parts.items()}
        allids = sorted(ids["train"] + ids["val"] + ids["test"])
        assert allids == list(range(500))          # exhaustive
        assert not (set(ids["train"]) & set(ids["val"]))
        assert not (set(ids["train"]) & set(ids["test"]))
        assert not (set(ids["val"]) & set(ids["test"]))
        # roughly proportional
        assert 300 < len(ids["train"]) < 490

    def test_prefix_stability(self):
        """Adding a later split never changes an earlier one."""
        import ray.data
        tab = _ids_table(300)
        two = hash_split(ray.data.from_arrow(tab), "key",
                         {"a": 0.5, "b": 0.25})
        three = hash_split(ray.data.from_arrow(tab), "key",
                           {"a": 0.5, "b": 0.25, "c": 0.25})
        assert _ids(two["a"]) == _ids(three["a"])
        assert _ids(two["b"]) == _ids(three["b"])

    def test_fractions_over_one_raise(self):
        import ray.data
        ds = ray.data.from_arrow(_ids_table(10))
        with pytest.raises(ValueError):
            hash_split(ds, "key", {"a": 0.7, "b": 0.7})

    def test_matches_duckdb_case_buckets(self):
        import duckdb
        import ray.data
        tab = _ids_table(250)
        parts = hash_split(ray.data.from_arrow(tab).repartition(3), "key",
                           {"train": 0.6, "test": 0.4}, salt="q")
        con = duckdb.connect()
        h = "md5_number_lower(CAST(key AS VARCHAR) || ':q') % 1000000"
        want_train = sorted(r[0] for r in con.execute(
            f"SELECT key FROM tab WHERE {h} < 600000").fetchall())
        want_test = sorted(r[0] for r in con.execute(
            f"SELECT key FROM tab WHERE {h} >= 600000 AND {h} < 1000000"
        ).fetchall())
        assert _ids(parts["train"]) == want_train
        assert _ids(parts["test"]) == want_test


def test_key_hashes_reference():
    """Pin the hash family: little-endian u64 of md5 bytes 8..16."""
    got = _key_hashes(pa.array(["a", "42"]), "x")
    for s, g in zip(["a", "42"], got):
        want = int.from_bytes(hashlib.md5((s + ":x").encode()).digest()[8:],
                              "little")
        assert int(g) == want


class TestUpsampleByWeight:
    def test_replication_and_epochs(self):
        import pandas as pd
        import ray.data
        from graph_data_science_ray.functions.sampling import upsample_by_weight
        df = pd.DataFrame({"id": [0, 1, 2, 3],
                           "g": ["a", "b", "a", "c"]})
        out = (upsample_by_weight(ray.data.from_pandas(df).repartition(2),
                                  "g", {"a": 3, "b": 0})
               .to_pandas().sort_values(["id", "epoch"])
               .reset_index(drop=True))
        # a x3 (ids 0,2), b dropped, c default x1
        assert out["id"].tolist() == [0, 0, 0, 2, 2, 2, 3]
        assert out["epoch"].tolist() == [0, 1, 2, 0, 1, 2, 0]

    def test_partition_layout_invariant(self):
        import pandas as pd
        import ray.data
        from graph_data_science_ray.functions.sampling import upsample_by_weight
        df = pd.DataFrame({"id": range(50), "g": ["x", "y"] * 25})
        outs = []
        for parts in (1, 7):
            o = (upsample_by_weight(ray.data.from_pandas(df)
                                    .repartition(parts), "g", {"x": 2})
                 .to_pandas().sort_values(["id", "epoch"])
                 .reset_index(drop=True))
            outs.append(o)
        pd.testing.assert_frame_equal(outs[0], outs[1])

    def test_negative_weight_raises(self):
        import pandas as pd
        import pytest
        import ray.data
        from graph_data_science_ray.functions.sampling import upsample_by_weight
        ds = ray.data.from_pandas(pd.DataFrame({"g": ["a"]}))
        with pytest.raises(ValueError):
            upsample_by_weight(ds, "g", {"a": -1})


class TestStratifiedSample:
    def _ds(self):
        import ray.data as rd
        n = 300
        return rd.from_arrow(pa.table({
            "key": pa.array(np.arange(n, dtype=np.int64)),
            "grp": pa.array((["a", "b", "c", None] * n)[:n])})) \
            .repartition(7)

    def test_matches_duckdb_case(self):
        import duckdb
        from graph_data_science_ray.functions.sampling import stratified_sample
        out = stratified_sample(self._ds(), "key", "grp",
                                {"a": 1.0, "b": 0.3, "c": 0.0}, default=0.6)
        got = sorted(_ids(out))
        tb = self._ds().to_pandas()
        want = duckdb.sql("""
            SELECT key FROM tb
            WHERE md5_number_lower(CAST(key AS VARCHAR) || ':') % 1000000 <
              CASE WHEN grp IS NULL THEN 600000
                   WHEN grp = 'a' THEN 1000000
                   WHEN grp = 'b' THEN 300000 ELSE 0 END
            ORDER BY key""").df().key.tolist()
        assert got == want
        # group 'c' fully dropped, group 'a' fully kept
        kept = set(got)
        grp = {int(k): g for k, g in zip(tb.key, tb.grp) if g is not None}
        assert all(k in kept for k, g in grp.items() if g == "a")
        assert all(k not in kept for k, g in grp.items() if g == "c")

    def test_partition_layout_invariant(self):
        from graph_data_science_ray.functions.sampling import stratified_sample
        fr = {"a": 0.5, "b": 0.25}
        a = sorted(_ids(stratified_sample(self._ds().repartition(1),
                                          "key", "grp", fr)))
        b = sorted(_ids(stratified_sample(self._ds().repartition(13),
                                          "key", "grp", fr)))
        assert a == b

    def test_bad_fraction_raises(self):
        from graph_data_science_ray.functions.sampling import stratified_sample
        with pytest.raises(ValueError):
            stratified_sample(self._ds(), "key", "grp", {"a": 1.5})
        with pytest.raises(ValueError):
            stratified_sample(self._ds(), "key", "grp", {}, default=-0.1)


class TestShardShuffle:
    def _ds(self, parts=5):
        import ray.data as rd
        n = 200
        return rd.from_arrow(pa.table({
            "key": pa.array(np.arange(n, dtype=np.int64)),
            "v": pa.array(np.arange(n, dtype=np.float64))})) \
            .repartition(parts)

    def test_matches_duckdb_row_number(self):
        import duckdb
        from graph_data_science_ray.functions.sampling import shard_shuffle
        out = shard_shuffle(self._ds(), "key", 4, salt="t") \
            .to_pandas().sort_values(["shard", "pos"]).reset_index(drop=True)
        tb = self._ds().to_pandas()
        want = duckdb.sql("""
            WITH h AS (
              SELECT key, v,
                     (md5_number_lower(CAST(key AS VARCHAR) || ':t') % 4)::BIGINT AS shard,
                     md5_number_lower(CAST(key AS VARCHAR) || ':t#pos') AS h2
              FROM tb)
            SELECT key, v, shard,
                   (row_number() OVER (PARTITION BY shard ORDER BY h2, key) - 1)::BIGINT AS pos
            FROM h ORDER BY shard, pos""").df().reset_index(drop=True)
        assert out[["key", "v", "shard", "pos"]].equals(want)

    def test_layout_invariant_and_dense_pos(self):
        from graph_data_science_ray.functions.sampling import shard_shuffle
        a = shard_shuffle(self._ds(1), "key", 3).to_pandas() \
            .sort_values(["shard", "pos"]).reset_index(drop=True)
        b = shard_shuffle(self._ds(11), "key", 3).to_pandas() \
            .sort_values(["shard", "pos"]).reset_index(drop=True)
        assert a.equals(b)
        for _, g in a.groupby("shard"):
            assert g.pos.tolist() == list(range(len(g)))

    def test_single_shard_is_permutation(self):
        from graph_data_science_ray.functions.sampling import shard_shuffle
        out = shard_shuffle(self._ds(), "key", 1).to_pandas()
        assert sorted(out.key) == list(range(200))
        assert (out.shard == 0).all()
        # the shuffle actually shuffles: not identity order
        assert out.sort_values("pos").key.tolist() != list(range(200))

    def test_bad_shards_raise(self):
        from graph_data_science_ray.functions.sampling import shard_shuffle
        with pytest.raises(ValueError):
            shard_shuffle(self._ds(), "key", 0)


def _collect(ds):
    import ray
    if isinstance(ds, pa.Table):
        return ds
    tabs = [t for t in (ray.get(r) for r in ds.materialize().to_arrow_refs())
            if t.num_rows and t.num_columns]
    return pa.concat_tables(tabs) if tabs else pa.table({})


class TestSampleNPerGroup:
    def _docs(self, n=400, groups=("en", "de", "fr"), seed=11):
        rng = np.random.default_rng(seed)
        return pa.table({
            "doc_id": np.arange(n, dtype=np.int64),
            "lang": pa.array([groups[i] for i in
                              rng.integers(0, len(groups), n)], pa.string())})

    def test_exact_quota_and_duckdb_equality(self):
        import duckdb
        import ray.data
        from graph_data_science_ray.functions.sampling import (
            sample_n_per_group)
        t = self._docs()
        out = _collect(sample_n_per_group(
            ray.data.from_arrow(t).repartition(5), "doc_id", "lang", 25,
            salt="q")).sort_by("doc_id")
        con = duckdb.connect()
        con.register("docs", t)
        ora = con.sql("""
            SELECT doc_id, lang FROM (
              SELECT doc_id, lang, row_number() OVER (
                PARTITION BY lang
                ORDER BY md5_number_lower(CAST(doc_id AS VARCHAR) || ':q')
                         >> 16, doc_id) AS rn
              FROM docs) WHERE rn <= 25 ORDER BY doc_id""").arrow()
        assert out.column("doc_id").to_pylist() == \
            ora.column("doc_id").to_pylist()
        assert out.column("lang").to_pylist() == ora.column("lang").to_pylist()
        import collections
        cnt = collections.Counter(out.column("lang").to_pylist())
        assert all(v == 25 for v in cnt.values())

    def test_small_group_keeps_all_rows(self):
        import ray.data
        from graph_data_science_ray.functions.sampling import (
            sample_n_per_group)
        t = self._docs(n=30)
        out = _collect(sample_n_per_group(ray.data.from_arrow(t),
                                          "doc_id", "lang", 1000))
        assert out.num_rows == 30  # quota exceeds every group

    def test_layout_invariance_and_validation(self):
        import ray.data
        from graph_data_science_ray.functions.sampling import (
            sample_n_per_group)
        t = self._docs(n=200)
        a = _collect(sample_n_per_group(
            ray.data.from_arrow(t).repartition(2), "doc_id", "lang", 10,
            salt="z")).sort_by("doc_id")
        b = _collect(sample_n_per_group(
            ray.data.from_arrow(t).repartition(11), "doc_id", "lang", 10,
            salt="z")).sort_by("doc_id")
        assert a.equals(b)
        with pytest.raises(ValueError, match="n must be"):
            sample_n_per_group(ray.data.from_arrow(t), "doc_id", "lang", 0)
