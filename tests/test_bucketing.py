"""Adaptive bucket-count scaling (stages/bucketing.py) — round-2 VERDICT #5:
the bucketed-combine pattern must derive its bucket count from the input size,
and every site must stay correct when forced onto many buckets."""

import numpy as np
import pyarrow as pa
import pytest

from graph_data_science_ray.stages import bucketing
from graph_data_science_ray.stages.bucketing import (adaptive_bucket_count,
                                                     rows_if_cheap)


class TestHelper:
    def test_scaling_math(self):
        assert adaptive_bucket_count(None) == 64
        assert adaptive_bucket_count(0) == 64
        assert adaptive_bucket_count(1_000_000) == 64
        assert adaptive_bucket_count(200_000_000) == 100
        assert adaptive_bucket_count(10**12) == 1 << 16  # clamped
        assert adaptive_bucket_count(1000, target_rows_per_bucket=10,
                                     min_buckets=4) == 100

    def test_rows_if_cheap_on_read_and_derived(self):
        import ray.data
        ds = ray.data.from_arrow(pa.table({"x": np.arange(100)}))
        assert rows_if_cheap(ds) == 100
        derived = ds.map_batches(lambda t: t, batch_format="pyarrow")
        # a derived pipeline must NOT be executed just to size buckets
        assert rows_if_cheap(derived) is None


class TestForcedManyBuckets:
    """Force every adaptive site onto many buckets (tiny target) and assert
    results identical to the single-small-bucket-count default."""

    @pytest.fixture
    def tiny_target(self, monkeypatch):
        orig = bucketing.adaptive_bucket_count

        def forced(est_rows, **kw):
            kw.pop("target_rows_per_bucket", None)
            kw.setdefault("min_buckets", 7)  # odd, >1: exercises hashing
            return orig(est_rows, target_rows_per_bucket=5, **kw)

        monkeypatch.setattr(bucketing, "adaptive_bucket_count", forced)

    def test_exact_dedup_many_buckets(self, tiny_target):
        import ray.data

        from graph_data_science_ray.functions.dedup import exact_dedup
        texts = [f"doc {i % 13}" for i in range(200)]
        ds = ray.data.from_arrow(pa.table(
            {"doc_id": np.arange(200, dtype=np.int64), "text": texts}))
        out = exact_dedup(ds).to_pandas().sort_values("doc_id")
        assert len(out) == 13
        assert out["dup_count"].sum() == 200
        assert (out["doc_id"].to_numpy() == np.arange(13)).all()  # min ids

    def test_node_similarity_many_buckets(self, tiny_target):
        from graph_data_science_ray import Graph
        from graph_data_science_ray.functions.nodesim import node_similarity
        rng = np.random.default_rng(21)
        src = rng.integers(0, 40, 600)
        dst = 40 + rng.integers(0, 25, 600)
        g = Graph.from_edges(src, dst, n=65, aggregation="single")
        t = node_similarity(g, top_k=0).to_pandas()
        # brute-force jaccard oracle
        sets = {}
        for s, d in zip(g.src, g.dst):
            sets.setdefault(s, set()).add(d)
        exp = {}
        ks = sorted(sets)
        for i, a in enumerate(ks):
            for b in ks[i + 1:]:
                inter = len(sets[a] & sets[b])
                if inter:
                    exp[(a, b)] = inter / len(sets[a] | sets[b])
        got = {(r.node1, r.node2): r.similarity for r in t.itertuples()}
        assert set(got) == set(exp)
        for k in exp:
            assert got[k] == pytest.approx(exp[k], abs=1e-12)

    def test_tumbling_window_many_buckets(self, tiny_target):
        import pandas as pd
        import ray.data

        from graph_data_science_ray.pipelines.windows import tumbling_window
        rng = np.random.default_rng(22)
        n = 500
        ts = pd.Timestamp("2024-01-01") + pd.to_timedelta(
            rng.integers(0, 86400, n), unit="s")
        df = pd.DataFrame({"user_id": rng.integers(0, 20, n),
                           "ts": ts, "value": rng.random(n)})
        out = tumbling_window(
            ray.data.from_pandas(df).repartition(4)).to_pandas()
        exp = df.assign(window_start=df["ts"].dt.floor("h")) \
            .groupby(["user_id", "window_start"]) \
            .agg(n_events=("value", "size"), sum_value=("value", "sum")) \
            .reset_index()
        m = out.sort_values(["user_id", "window_start"]).reset_index(drop=True)
        e = exp.sort_values(["user_id", "window_start"]).reset_index(drop=True)
        assert (m["n_events"].to_numpy() == e["n_events"].to_numpy()).all()
        np.testing.assert_allclose(m["sum_value"], e["sum_value"], atol=1e-9)

    def test_streaming_triangles_many_buckets(self, tiny_target):
        import ray.data

        from graph_data_science_ray import Graph, triangle_count
        from graph_data_science_ray.pipelines.triangles import (
            triangle_count_streaming)
        rng = np.random.default_rng(23)
        n, m = 120, 900
        src, dst = rng.integers(0, n, m), rng.integers(0, n, m)
        g = Graph.from_edges(src, dst, n=n, orientation="undirected",
                             aggregation="single")
        ref = triangle_count(g, execution="local")
        ds = ray.data.from_arrow(pa.table({"src": src, "dst": dst}))
        got = triangle_count_streaming(ds, n=n, num_partitions=3)
        assert got.global_count == ref.global_count
        assert np.array_equal(
            got.table.column("triangles").to_numpy(zero_copy_only=False),
            ref.table.column("triangles").to_numpy(zero_copy_only=False))


def test_windows_stage_schema_metadata_stripped():
    """Regression (round-3 VERDICT Wrong #5): pandas round-trip stages must
    not leak per-group pandas schema metadata — distinct metadata per block
    defeats Ray's schema-dedup cache ("Failed to hash the schemas" spam)."""
    import pandas as pd
    import ray
    import ray.data

    from graph_data_science_ray.pipelines.windows import (sessionize,
                                                          tumbling_window)
    rng = np.random.default_rng(5)
    n = 300
    ts = pd.Timestamp("2024-01-01") + pd.to_timedelta(
        rng.integers(0, 86400, n), unit="s")
    df = pd.DataFrame({"user_id": rng.integers(0, 10, n),
                       "ts": ts, "value": rng.random(n)})
    for ds in (tumbling_window(ray.data.from_pandas(df).repartition(3)),
               sessionize(ray.data.from_pandas(df).repartition(3))):
        for ref in ds.to_arrow_refs():
            t = ray.get(ref)
            if hasattr(t, "schema"):
                assert t.schema.metadata is None or t.schema.metadata == {}


def test_read_parquet_clean_strips_unhashable_metadata(tmp_path):
    """Regression (round-3 VERDICT Wrong #5, root cause): pandas-written
    parquet embeds a b'pandas' schema-metadata blob, and pyarrow>=16 schemas
    WITH metadata are unhashable — every bare read_parquet then defeats Ray's
    block-schema dedup cache.  read_parquet_clean must yield blocks whose
    schema is metadata-free and hashable."""
    import pandas as pd
    import ray

    from graph_data_science_ray.sources.io import (clean_schema,
                                                   read_parquet_clean)
    p = str(tmp_path / "t.parquet")
    pd.DataFrame({"a": [1, 2, 3], "b": ["x", "y", "z"]}).to_parquet(p)
    import pyarrow.parquet as pq
    assert pq.read_schema(p).metadata  # the hazard is present in the file
    s = clean_schema(p, columns=["a"])
    assert s.names == ["a"] and s.metadata is None
    hash(s)  # must not raise
    ds = read_parquet_clean(p, columns=["a", "b"])
    for ref in ds.to_arrow_refs():
        t = ray.get(ref)
        assert t.schema.metadata in (None, {})
        hash(t.schema)
