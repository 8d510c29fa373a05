"""stages/exchange.py — the explicit known-partitioner shuffle."""

import numpy as np
import pyarrow as pa
import pytest
import ray
import ray.data

from graph_data_science_ray.stages.exchange import (_split_table, exchange,
                                                    exchange_refs, hash_parts,
                                                    range_parts)


def _table(n, seed=0):
    rng = np.random.default_rng(seed)
    return pa.table({"k": rng.integers(0, 100, n).astype(np.int64),
                     "v": rng.integers(0, 10, n).astype(np.int64)})


class TestSplitTable:
    def test_partition_of_every_row(self):
        t = _table(1000)
        part_of = hash_parts("k", P=7)
        parts = _split_table(t, part_of, 7)
        assert sum(p.num_rows for p in parts) == 1000
        for p_idx, p in enumerate(parts):
            if p.num_rows:
                assert (np.asarray(part_of(p)) == p_idx).all()

    def test_empty_and_zero_column(self):
        empty = _table(0)
        parts = _split_table(empty, hash_parts("k", P=3), 3)
        assert all(p.num_rows == 0 for p in parts)
        assert all(p.schema == empty.schema for p in parts)  # schema kept

    def test_preserves_rows_exactly(self):
        t = _table(500, seed=3)
        parts = _split_table(t, range_parts("k", np.array([0, 30, 100])), 2)
        merged = pa.concat_tables(parts)
        a = merged.sort_by([("k", "ascending"), ("v", "ascending")])
        b = t.sort_by([("k", "ascending"), ("v", "ascending")])
        assert a.equals(b)


class TestRangeParts:
    def test_bounds_routing(self):
        t = pa.table({"k": np.array([0, 5, 10, 15, 99], dtype=np.int64)})
        part = range_parts("k", np.array([0, 10, 100]))(t)
        assert part.tolist() == [0, 0, 1, 1, 1]

    def test_out_of_range_raises(self):
        """Out-of-bounds keys raise instead of silently clipping into the edge
        partitions (a clipped row would land in a range file whose recorded
        [lo, hi) does not contain it, breaking bounds-pruned reads)."""
        t = pa.table({"k": np.array([-5, 1000], dtype=np.int64)})
        with pytest.raises(ValueError, match="outside"):
            range_parts("k", np.array([0, 10, 100]))(t)
        ok = pa.table({"k": np.array([0, 99], dtype=np.int64)})
        assert range_parts("k", np.array([0, 10, 100]))(ok).tolist() == [0, 1]


class TestExchangeRefs:
    def test_roundtrip_equals_input(self):
        tabs = [_table(200, seed=i) for i in range(5)]
        refs = [ray.put(t) for t in tabs]
        out = exchange_refs(refs, hash_parts("k", P=4), 4)
        merged = pa.concat_tables(ray.get(out))
        want = pa.concat_tables(tabs)
        assert merged.sort_by([("k", "ascending"), ("v", "ascending")]).equals(
            want.sort_by([("k", "ascending"), ("v", "ascending")]))

    def test_combine_sees_colocated_keys(self):
        tabs = [_table(300, seed=i) for i in range(4)]
        refs = [ray.put(t) for t in tabs]

        def _sum(p, t):
            k = t.column("k").to_numpy(zero_copy_only=False)
            v = t.column("v").to_numpy(zero_copy_only=False)
            uq, inv = np.unique(k, return_inverse=True)
            return pa.table({"k": uq, "s": np.bincount(inv, weights=v)
                             .astype(np.int64)})

        out = ray.get(exchange_refs(refs, hash_parts("k", P=8), 8,
                                    combine=_sum))
        got = pa.concat_tables(out).sort_by([("k", "ascending")])
        want = pa.concat_tables(tabs).group_by("k").aggregate([("v", "sum")]) \
            .rename_columns(["k", "s"]).sort_by([("k", "ascending")])
        assert got.column("k").equals(want.column("k"))
        assert got.column("s").to_pylist() == want.column("s").to_pylist()

    def test_map_fn_fused_into_split(self):
        refs = [ray.put(pa.table({"x": np.arange(10, dtype=np.int64)}))]

        def _double(t):
            return pa.table({"k": t.column("x").to_numpy() * 2})

        out = ray.get(exchange_refs(refs, hash_parts("k", P=2), 2,
                                    map_fn=_double))
        vals = sorted(np.concatenate(
            [t.column("k").to_numpy(zero_copy_only=False) for t in out]))
        assert vals == [0, 2, 4, 6, 8, 10, 12, 14, 16, 18]

    def test_p_equals_one(self):
        refs = [ray.put(_table(50, seed=i)) for i in range(3)]
        out = ray.get(exchange_refs(refs, hash_parts("k", P=1), 1))
        assert len(out) == 1 and out[0].num_rows == 150

    def test_combine_num_returns(self):
        refs = [ray.put(_table(100))]

        def _two(p, t):
            return t, np.int64(t.num_rows)

        out = exchange_refs(refs, hash_parts("k", P=3), 3, combine=_two,
                            combine_num_returns=2)
        rows = sum(int(ray.get(r[1])) for r in out)
        assert rows == 100

    def test_empty_partitions_keep_schema(self):
        # one distinct key, many partitions: most combines see 0 rows but
        # MUST still see the schema (the Ray Data empty-groupby-block hazard
        # this exchange is immune to)
        t = pa.table({"k": np.zeros(10, dtype=np.int64),
                      "v": np.arange(10, dtype=np.int64)})
        out = ray.get(exchange_refs([ray.put(t)], hash_parts("k", P=8), 8))
        assert sum(o.num_rows for o in out) == 10
        for o in out:
            assert o.schema.names == ["k", "v"]


class TestExchangeDataset:
    def test_dataset_in_dataset_out(self):
        ds = ray.data.from_arrow(_table(1000)).repartition(6)
        out = exchange(ds, hash_parts("k", P=4), 4)
        assert out.count() == 1000
        assert set(out.schema().names) == {"k", "v"}

    def test_empty_dataset_passthrough(self):
        ds = ray.data.from_arrow(_table(0))
        out = exchange(ds, hash_parts("k", P=4), 4)
        assert out.count() == 0


class TestRejects:
    def test_p_zero(self):
        with pytest.raises(ValueError):
            exchange_refs([], hash_parts("k", P=1), 0)


class TestGroupedExchange:
    """grouped_exchange == groupby(bucket).map_groups when bucket ∈ [0, P)."""

    def test_matches_map_groups(self):
        from graph_data_science_ray.stages.exchange import grouped_exchange
        rng = np.random.default_rng(11)
        t = pa.table({"bucket": rng.integers(0, 8, 2000).astype(np.int64),
                      "x": rng.integers(0, 50, 2000).astype(np.int64)})
        ds = ray.data.from_arrow(t).repartition(6)

        def _sum(g: pa.Table) -> pa.Table:
            if g.num_rows == 0:
                return pa.table({"bucket": pa.array([], pa.int64()),
                                 "total": pa.array([], pa.int64())})
            b = int(g.column("bucket")[0].as_py())
            return pa.table({"bucket": np.array([b], dtype=np.int64),
                             "total": np.array([g.column("x").to_numpy(
                                 zero_copy_only=False).sum()], dtype=np.int64)})

        got = grouped_exchange(ds, "bucket", 8, _sum).to_pandas() \
            .sort_values("bucket").reset_index(drop=True)
        want = ray.data.from_arrow(t).groupby("bucket") \
            .map_groups(_sum, batch_format="pyarrow").to_pandas() \
            .sort_values("bucket").reset_index(drop=True)
        assert got.equals(want)

    def test_empty_buckets_get_empty_result(self):
        from graph_data_science_ray.stages.exchange import grouped_exchange
        t = pa.table({"bucket": np.array([2, 2, 5], dtype=np.int64),
                      "x": np.array([1, 2, 3], dtype=np.int64)})
        empty = pa.table({"n": pa.array([], pa.int64())})

        def _count(g: pa.Table) -> pa.Table:
            return pa.table({"n": np.array([g.num_rows], dtype=np.int64)})

        out = grouped_exchange(ray.data.from_arrow(t), "bucket", 8, _count,
                               empty_result=empty).to_pandas()
        # 8 partitions: 6 empty → empty_result (0 rows each), 2 with counts
        assert sorted(out["n"].tolist()) == [1, 2]

    def test_permissive_promotion_across_union(self):
        a = pa.table({"bucket": np.array([0, 1], dtype=np.int64),
                      "v": np.array([1, 2], dtype=np.int32)})
        b = pa.table({"bucket": np.array([0, 1], dtype=np.int64),
                      "v": np.array([3, 4], dtype=np.int64)})
        from graph_data_science_ray.stages.exchange import grouped_exchange
        ds = ray.data.from_arrow(a).union(ray.data.from_arrow(b))
        out = grouped_exchange(ds, "bucket", 2,
                               lambda g: g).to_pandas()
        assert sorted(out["v"].tolist()) == [1, 2, 3, 4]


class TestDedupPairsExchange:
    def test_distinct_pairs(self):
        from graph_data_science_ray.functions.dedup import \
            _dedup_pairs_exchange
        rng = np.random.default_rng(5)
        a = rng.integers(0, 30, 500).astype(np.int64)
        b = rng.integers(0, 30, 500).astype(np.int64)
        ds = ray.data.from_arrow(pa.table({"doc_a": a, "doc_b": b})) \
            .repartition(4)
        out = _dedup_pairs_exchange(ds, "doc_a", "doc_b").to_pandas()
        want = {(int(x), int(y)) for x, y in zip(a, b)}
        got = {(int(x), int(y)) for x, y in
               zip(out["doc_a"], out["doc_b"])}
        assert got == want
        assert len(out) == len(want)  # no duplicates survive


class TestObjectCountCap:
    def test_grouped_split_matches_naive(self):
        """With max_objects forcing grouped splits, results are identical."""
        rng = np.random.default_rng(23)
        tabs = [pa.table({"k": rng.integers(0, 40, 100).astype(np.int64),
                          "v": np.arange(100, dtype=np.int64) + i * 100})
                for i in range(12)]
        refs = [ray.put(t) for t in tabs]
        part = hash_parts("k", P=5)
        naive = exchange_refs(refs, part, 5)          # group == 1
        capped = exchange_refs(refs, part, 5, max_objects=10)  # forces groups
        a = pa.concat_tables([ray.get(r) for r in naive]) \
            .sort_by([("k", "ascending"), ("v", "ascending")])
        b = pa.concat_tables([ray.get(r) for r in capped]) \
            .sort_by([("k", "ascending"), ("v", "ascending")])
        assert a.equals(b)
        assert sum(t.num_rows for t in tabs) == a.num_rows

    def test_out_of_range_partition_raises(self):
        t = pa.table({"bucket": np.array([0, 7], dtype=np.int64),
                      "x": np.array([1, 2], dtype=np.int64)})
        with pytest.raises(Exception, match="outside"):
            from graph_data_science_ray.stages.exchange import _split_table
            _split_table(t, lambda g: g.column("bucket").to_numpy(
                zero_copy_only=False), 4)


class TestSmallInputFastPath:
    """total_rows <= small_rows routes the whole exchange through ONE task
    (split + every per-partition combine, num_returns=P) — results must be
    identical to the distributed split/combine shape."""

    def _run(self, total_rows, small_rows):
        t = _table(600, seed=11)
        refs = [ray.put(t.slice(i * 100, 100)) for i in range(6)]
        part_of = hash_parts("k", P=5)

        def comb(p, g):
            return g.append_column("part", pa.array(
                np.full(g.num_rows, p, dtype=np.int64)))

        out = exchange_refs(refs, part_of, 5, combine=comb,
                            total_rows=total_rows, small_rows=small_rows)
        assert len(out) == 5
        merged = pa.concat_tables(ray.get(out))
        return merged.sort_by([("k", "ascending"), ("v", "ascending"),
                               ("part", "ascending")])

    def test_fast_path_equals_distributed(self):
        fast = self._run(total_rows=600, small_rows=100_000)   # fast path
        dist = self._run(total_rows=600, small_rows=1)          # forced distributed
        none = self._run(total_rows=None, small_rows=100_000)   # unknown rows
        assert fast.equals(dist)
        assert fast.equals(none)

    def test_fast_path_p1(self):
        t = _table(50, seed=2)
        out = exchange_refs([ray.put(t)], hash_parts("k", P=1), 1,
                            total_rows=50)
        assert len(out) == 1
        got = ray.get(out[0])
        assert got.sort_by([("k", "ascending"), ("v", "ascending")]).equals(
            t.sort_by([("k", "ascending"), ("v", "ascending")]))

    def test_dataset_exchange_uses_metadata_counts(self):
        # end-to-end: a materialized dataset's block metadata supplies the
        # row counts (no remote probes) and the tiny input takes the fast path
        ds = ray.data.from_arrow(_table(300, seed=7)).repartition(4)
        out = exchange(ds, hash_parts("k", P=3), 3)
        assert out.count() == 300
        assert sorted(out.schema().names) == ["k", "v"]


def test_bytes_gate_keeps_large_payload_rows_distributed():
    """A small-ROW table of large payloads (long strings) must not ride the
    one-task fast path: exchange() reports rows as unknown above 64 MB
    (metadata size_bytes), forcing the distributed split/combine shape.
    Output equality is what we assert — the gate must not change results."""
    import pyarrow as pa

    from graph_data_science_ray.stages.blocks import metadata_total_bytes

    big = pa.table({"k": pa.array(np.arange(2_000, dtype=np.int64) % 7),
                    "payload": pa.array(["x" * 40_000] * 2_000)})  # ~80 MB
    ds = ray.data.from_arrow(big).repartition(4).materialize()
    tb = metadata_total_bytes(ds)
    assert tb is not None and tb > 64 * 1024 * 1024
    out = exchange(ds, hash_parts("k", P=3), 3)
    assert out.count() == 2_000
    small = pa.table({"k": pa.array(np.arange(100, dtype=np.int64) % 7)})
    ds2 = ray.data.from_arrow(small).materialize()
    tb2 = metadata_total_bytes(ds2)
    assert tb2 is not None and tb2 < 64 * 1024 * 1024
    out2 = exchange(ds2, hash_parts("k", P=3), 3)
    assert out2.count() == 100


class TestReviewRegressions:
    """Regressions from the round-5 exchange review."""

    def test_all_empty_dataset_gets_output_schema(self):
        """An all-empty input must still flow through map_fn + combine so the
        result carries the exchange's OUTPUT schema, not the input's (a
        zero-pair NodeSimilarity run would otherwise leak pre-combine columns
        downstream)."""
        empty = pa.table({"bucket": pa.array([], pa.int64()),
                          "x": pa.array([], pa.int64())})
        ds = ray.data.from_arrow(empty)

        def _comb(p, t):
            return pa.table({"y": pa.array([], pa.float64())})

        out = exchange(ds, hash_parts("bucket", P=2), 2, combine=_comb)
        assert out.schema().names == ["y"]
        assert out.count() == 0

    def test_all_empty_grouped_exchange_uses_empty_result(self):
        from graph_data_science_ray.stages.exchange import grouped_exchange
        empty = pa.table({"bucket": pa.array([], pa.int64()),
                          "x": pa.array([], pa.int64())})
        typed = pa.table({"node1": pa.array([], pa.int64()),
                          "score": pa.array([], pa.float64())})
        out = grouped_exchange(ray.data.from_arrow(empty), "bucket", 2,
                               lambda g: (_ for _ in ()).throw(AssertionError),
                               empty_result=typed)
        assert out.schema().names == ["node1", "score"]

    def test_hash_parts_null_key_raises(self):
        t = pa.table({"k": pa.array([1, None, 3], type=pa.int64())})
        with pytest.raises(ValueError, match="null"):
            hash_parts("k", P=4)(t)

    def test_exchange_refs_empty_input_raises(self):
        with pytest.raises(ValueError, match="at least one block"):
            exchange_refs([], hash_parts("k", P=2), 2)

    def test_small_rows_zero_disables_fast_path_same_result(self):
        tabs = [_table(100, seed=i) for i in range(3)]
        refs = [ray.put(t) for t in tabs]
        fast = exchange_refs(refs, hash_parts("k", P=4), 4, total_rows=300)
        slow = exchange_refs(refs, hash_parts("k", P=4), 4, total_rows=300,
                             small_rows=0)
        a = pa.concat_tables(ray.get(fast)).sort_by([("k", "ascending"),
                                                     ("v", "ascending")])
        b = pa.concat_tables(ray.get(slow)).sort_by([("k", "ascending"),
                                                     ("v", "ascending")])
        assert a.equals(b)

    def test_small_path_drops_empty_partitions_from_dataset(self):
        # 3 rows into P=16 buckets: >=13 partitions are empty; the Dataset
        # returned by exchange() must carry only nonempty typed blocks so a
        # downstream map_batches never emits Ray's schema-less empty block
        # (the round-4 crash class)
        t = pa.table({"k": pa.array([0, 1, 2], pa.int64()),
                      "v": pa.array([1.0, 2.0, 3.0])})
        out = exchange(ray.data.from_arrow(t), hash_parts("k", P=16), 16)
        tabs = ray.get(out.to_arrow_refs())
        assert all(b.num_rows > 0 and b.num_columns == 2 for b in tabs)
        assert sum(b.num_rows for b in tabs) == 3
        # downstream map_batches keeps the schema on every block
        mapped = out.map_batches(lambda b: b, batch_format="pyarrow")
        assert all(b.num_columns == 2
                   for b in ray.get(mapped.to_arrow_refs()))

    def test_return_counts_refs_api(self):
        t = _table(60, seed=5)
        refs, cref = exchange_refs([ray.put(t)], hash_parts("k", P=4), 4,
                                   total_rows=60, return_counts=True)
        assert len(refs) == 4 and cref is not None
        counts = ray.get(cref)
        assert counts.sum() == 60
        assert [x.num_rows for x in ray.get(refs)] == list(counts)
        # distributed path reports no counts
        refs2, cref2 = exchange_refs([ray.put(t)], hash_parts("k", P=4), 4,
                                     total_rows=60, small_rows=0,
                                     return_counts=True)
        assert cref2 is None and len(refs2) == 4


class TestDistributedEmptyPartitions:
    """The DISTRIBUTED exchange path keeps zero-row (typed) partitions; this
    pins that the standard downstream chain — map_batches over the exchange
    output, then a row-count-filtering consumer — survives them (the
    round-4 schema-less-empty-block crash class)."""

    def test_downstream_map_batches_then_concat(self):
        import ray
        import ray.data as rd

        from graph_data_science_ray.stages.blocks import nonempty_arrow_refs
        from graph_data_science_ray.stages.exchange import exchange, hash_parts
        t = pa.table({"k": pa.array([1, 1, 1, 5, 5], pa.int64()),
                      "v": pa.array([1.0, 2.0, 3.0, 4.0, 5.0])})
        ds = rd.from_arrow(t).repartition(3)
        # small_rows=0 forces the distributed path; 16 partitions vs 2 keys
        # guarantees many empty partitions
        out = exchange(ds, hash_parts("k", P=16), 16, small_rows=0)

        def _scale(b: pa.Table) -> pa.Table:
            import pyarrow.compute as pc
            return b.set_column(b.column_names.index("v"), "v",
                                pc.multiply(b.column("v"), 2.0))

        mapped = out.map_batches(_scale, batch_format="pyarrow")
        refs, counts = nonempty_arrow_refs(mapped)
        tabs = [x for x in ray.get(list(refs)) if x.num_rows and x.num_columns]
        allt = pa.concat_tables(tabs)
        assert allt.num_rows == 5
        assert sorted(allt.column("v").to_pylist()) == [2.0, 4.0, 6.0, 8.0, 10.0]

    def test_partitioner_length_mismatch_raises(self):
        import ray.data as rd

        from graph_data_science_ray.stages.exchange import exchange
        t = pa.table({"k": pa.array([1, 2, 3], pa.int64())})
        ds = rd.from_arrow(t)

        def bad_part(tab):
            return np.zeros(tab.num_rows - 1, dtype=np.int64)  # short!

        with pytest.raises(Exception, match="rows would be silently dropped"):
            exchange(ds, bad_part, 2, small_rows=0).materialize()

    def test_combine_num_returns_without_combine_rejected(self):
        import ray

        from graph_data_science_ray.stages.exchange import exchange_refs
        t = pa.table({"k": pa.array([1], pa.int64())})
        with pytest.raises(ValueError, match="requires a combine"):
            exchange_refs([ray.put(t)], lambda x: np.zeros(1, dtype=np.int64),
                          2, combine_num_returns=2)

    def test_invalid_p_rejected_even_on_empty_input(self):
        import ray.data as rd

        from graph_data_science_ray.stages.exchange import exchange
        empty = rd.from_arrow(pa.table({"k": pa.array([], pa.int64())}))
        with pytest.raises(ValueError, match="P must be >= 1"):
            exchange(empty, lambda t: np.zeros(0, dtype=np.int64), 0)
