"""HyperLogLog sketch (functions/sketch.py)."""
import numpy as np
import pyarrow as pa
import pytest

from graph_data_science_ray.functions.sketch import (
    _bit_length_u64, _partial_registers, approx_distinct, hll_estimate,
    hll_registers)


def test_bit_length_matches_python():
    rng = np.random.default_rng(0)
    vals = np.concatenate([
        np.array([0, 1, 2, 3, 2**63, 2**64 - 1], dtype=np.uint64),
        rng.integers(0, 2**63, 200).astype(np.uint64)])
    got = _bit_length_u64(vals)
    want = [int(v).bit_length() for v in vals]
    assert got.tolist() == want


def _ds(keys, parts=4):
    import ray.data as rd
    return rd.from_arrow(pa.table({"k": pa.array(keys)})).repartition(parts)


class TestHll:
    def test_layout_invariant_registers(self):
        keys = [f"key{i}" for i in range(5000)]
        a = hll_registers(_ds(keys, 1), "k").to_pandas() \
            .sort_values("bucket").reset_index(drop=True)
        b = hll_registers(_ds(keys, 17), "k").to_pandas() \
            .sort_values("bucket").reset_index(drop=True)
        assert a.equals(b)

    def test_duplicates_dont_change_sketch(self):
        keys = [f"key{i}" for i in range(1000)]
        a = approx_distinct(_ds(keys), "k").to_pandas()
        b = approx_distinct(_ds(keys * 7, parts=9), "k").to_pandas()
        assert a.equals(b)

    def test_accuracy_bound(self):
        n = 50_000
        est = approx_distinct(_ds([f"u{i}" for i in range(n)]), "k",
                              precision=10).to_pandas().estimate[0]
        assert abs(est - n) / n < 0.10  # ~3σ at 1.04/sqrt(1024)

    def test_merge_is_max(self):
        # union sketch == elementwise max of the half sketches
        a = _partial_registers(pa.array([f"a{i}" for i in range(500)]), 10, "hll")
        b = _partial_registers(pa.array([f"b{i}" for i in range(500)]), 10, "hll")
        u = _partial_registers(pa.array([f"a{i}" for i in range(500)] +
                                        [f"b{i}" for i in range(500)]), 10, "hll")
        assert np.array_equal(np.maximum(a, b), u)

    def test_linear_counting_small_range(self):
        est = approx_distinct(_ds([f"x{i}" for i in range(30)]), "k") \
            .to_pandas().estimate[0]
        assert abs(est - 30) < 3  # linear counting is near-exact here

    def test_precision_bounds(self):
        with pytest.raises(ValueError):
            hll_registers(_ds(["a"]), "k", precision=2)

    def test_empty_dataset(self):
        t = approx_distinct(_ds([], parts=1), "k").to_pandas()
        assert t.nonzero_buckets[0] == 0

    def test_estimate_pure_function_of_registers(self):
        regs = np.zeros(1024, dtype=np.uint8)
        assert hll_estimate(regs.copy()) == hll_estimate(regs.copy())
        regs[:10] = 3
        e1 = hll_estimate(regs)
        assert e1 > 0


class TestBloom:
    def _ds(self, keys, parts=4):
        import ray.data as rd
        return rd.from_arrow(pa.table({"k": pa.array(keys)})).repartition(parts)

    def test_no_false_negatives(self):
        from graph_data_science_ray.functions.sketch import (bloom_build,
                                                             bloom_semi_join)
        build = [f"m{i}" for i in range(2000)]
        bits = bloom_build(self._ds(build), "k", num_bits=1 << 16)
        kept = bloom_semi_join(self._ds(build, parts=7), "k", bits) \
            .to_pandas().k.tolist()
        assert sorted(kept) == sorted(build)  # every member passes

    def test_deterministic_false_positives(self):
        from graph_data_science_ray.functions.sketch import (bloom_build,
                                                             bloom_semi_join)
        build = [f"m{i}" for i in range(500)]
        probe = [f"p{i}" for i in range(5000)]
        bits = bloom_build(self._ds(build), "k", num_bits=2048, num_hashes=3)
        k1 = bloom_semi_join(self._ds(probe, 3), "k", bits, num_hashes=3) \
            .to_pandas().k.tolist()
        k2 = bloom_semi_join(self._ds(probe, 11), "k", bits, num_hashes=3) \
            .to_pandas().k.tolist()
        assert sorted(k1) == sorted(k2)      # FPs are layout-independent
        assert 0 < len(k1) < len(probe)      # tight filter: some FPs, not all

    def test_build_layout_invariant(self):
        from graph_data_science_ray.functions.sketch import bloom_build
        keys = [f"m{i}" for i in range(3000)]
        a = bloom_build(self._ds(keys, 1), "k", num_bits=1 << 14)
        b = bloom_build(self._ds(keys, 13), "k", num_bits=1 << 14)
        assert np.array_equal(a, b)

    def test_fp_rate_reasonable(self):
        from graph_data_science_ray.functions.sketch import (bloom_build,
                                                             bloom_semi_join)
        build = [f"m{i}" for i in range(1000)]
        probe = [f"p{i}" for i in range(20000)]
        bits = bloom_build(self._ds(build), "k", num_bits=1 << 16)
        kept = bloom_semi_join(self._ds(probe), "k", bits).count()
        # theoretical FP ~ (1-exp(-4*1000/65536))^4 ~ 1.2e-5 -> expect ~0
        assert kept < 40

    def test_num_bits_validation(self):
        from graph_data_science_ray.functions.sketch import bloom_build
        with pytest.raises(ValueError):
            bloom_build(self._ds(["a"]), "k", num_bits=1001)


class TestCountMin:
    def _ds(self, keys, parts=4):
        import ray.data as rd
        return rd.from_arrow(pa.table({"k": pa.array(keys)})).repartition(parts)

    def test_upper_bound_and_exactness_when_wide(self):
        from graph_data_science_ray.functions.sketch import cms_build, cms_lookup
        keys = [f"k{i % 50}" for i in range(5000)]  # each key 100 times
        m = cms_build(self._ds(keys), "k", width=1 << 14, depth=4)
        probe = self._ds([f"k{i}" for i in range(50)], parts=2)
        est = cms_lookup(probe, "k", m, est_col="est").to_pandas()
        # wide sketch, 50 keys: collisions effectively impossible
        assert (est.est == 100).all()

    def test_never_underestimates(self):
        from graph_data_science_ray.functions.sketch import cms_build, cms_lookup
        import collections
        keys = [f"k{i % 37}" for i in range(3700)]
        truth = collections.Counter(keys)
        m = cms_build(self._ds(keys, 9), "k", width=64, depth=3)  # collisions
        est = cms_lookup(self._ds(sorted(truth), 2), "k", m,
                         est_col="est").to_pandas().set_index("k")
        for k, n in truth.items():
            assert est.loc[k].est >= n

    def test_layout_invariant(self):
        from graph_data_science_ray.functions.sketch import cms_build
        keys = [f"k{i % 20}" for i in range(2000)]
        a = cms_build(self._ds(keys, 1), "k", width=128, depth=2)
        b = cms_build(self._ds(keys, 13), "k", width=128, depth=2)
        assert np.array_equal(a, b)

    def test_validation(self):
        from graph_data_science_ray.functions.sketch import cms_build
        with pytest.raises(ValueError):
            cms_build(self._ds(["a"]), "k", width=0)


class TestGroupedHll:
    def test_per_group_equals_filtered_global(self):
        import ray.data as rd
        from graph_data_science_ray.functions.sketch import (approx_distinct,
                                                             approx_distinct_by)
        keys = [f"u{i % 97}" for i in range(2000)]
        grps = [("a" if i % 3 else "b") for i in range(2000)]
        ds = rd.from_arrow(pa.table({"k": keys, "g": grps})).repartition(7)
        by = approx_distinct_by(ds, "k", "g").to_pandas().set_index("g")
        for g in ("a", "b"):
            import pyarrow.compute as pc
            sub = rd.from_arrow(pa.table({
                "k": [k for k, gg in zip(keys, grps) if gg == g]}))
            solo = approx_distinct(sub, "k").to_pandas()
            assert by.loc[g].estimate == solo.estimate[0]
            assert by.loc[g].nonzero_buckets == solo.nonzero_buckets[0]

    def test_layout_invariant(self):
        import ray.data as rd
        from graph_data_science_ray.functions.sketch import approx_distinct_by
        keys = [f"u{i % 50}" for i in range(1000)]
        grps = [f"g{i % 4}" for i in range(1000)]
        t = pa.table({"k": keys, "g": grps})
        a = approx_distinct_by(rd.from_arrow(t).repartition(1), "k", "g")
        b = approx_distinct_by(rd.from_arrow(t).repartition(13), "k", "g")
        assert a.equals(b)


class TestWindowedHll:
    def test_per_window_equals_filtered_global(self):
        import ray.data as rd
        from graph_data_science_ray.functions.sketch import (
            approx_distinct, approx_distinct_windowed)
        HOUR = 3_600_000_000
        rows_k, rows_t = [], []
        for i in range(900):
            rows_k.append(f"u{i % 61}")
            rows_t.append((i % 3) * HOUR + (i * 7919) % HOUR)
        t = pa.table({"k": rows_k,
                      "ts": pa.array(rows_t, pa.timestamp("us"))})
        out = approx_distinct_windowed(
            rd.from_arrow(t).repartition(7), "k", "ts").to_pandas()
        assert len(out) == 3
        for w in range(3):
            sub = pa.table({"k": [k for k, ts in zip(rows_k, rows_t)
                                  if ts // HOUR == w]})
            solo = approx_distinct(rd.from_arrow(sub), "k").to_pandas()
            import pandas as pd
            row = out[out.window_start == pd.Timestamp(w * HOUR, unit="us")]
            assert len(row) == 1
            assert row.estimate.iloc[0] == solo.estimate[0]

    def test_layout_invariant(self):
        import ray.data as rd
        from graph_data_science_ray.functions.sketch import (
            approx_distinct_windowed)
        t = pa.table({"k": [f"u{i % 9}" for i in range(200)],
                      "ts": pa.array([i * 60_000_000 for i in range(200)],
                                     pa.timestamp("us"))})
        a = approx_distinct_windowed(rd.from_arrow(t).repartition(1), "k", "ts")
        b = approx_distinct_windowed(rd.from_arrow(t).repartition(11), "k", "ts")
        assert a.equals(b)


def test_windowed_hll_ns_timestamps_match_us():
    import pandas as pd
    import ray.data as rd
    from graph_data_science_ray.functions.sketch import approx_distinct_windowed
    t_us = pa.table({"k": [f"u{i % 11}" for i in range(300)],
                     "ts": pa.array([i * 60_000_000 for i in range(300)],
                                    pa.timestamp("us"))})
    t_ns = t_us.set_column(1, "ts", t_us.column("ts").cast(pa.timestamp("ns")))
    a = approx_distinct_windowed(rd.from_arrow(t_us).repartition(3), "k", "ts")
    b = approx_distinct_windowed(rd.from_arrow(t_ns).repartition(3), "k", "ts")
    assert a.equals(b)
    assert a.num_rows == 5  # 300 minutes = 5 hourly windows
