"""End-to-end corpus → graph projection pipeline (M0 slice): deterministic corpus,
sha256 row invariant, edge extraction vs a driver-side oracle."""

import hashlib
import re

import numpy as np
import pyarrow.dataset as pads
import pytest

from graph_data_science_ray import pagerank, wcc
from graph_data_science_ray.pipelines.graph_build import (build_graph_from_corpus,
                                                          compute_sha_table)
from graph_data_science_ray.sources.corpus import generate_corpus


@pytest.fixture(scope="module")
def corpus_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("corpus") / "c"
    generate_corpus(str(d), num_repos=50, files_per_repo=5, seed=42)
    return str(d)


def test_corpus_deterministic(tmp_path, corpus_dir):
    d2 = tmp_path / "c2"
    generate_corpus(str(d2), num_repos=50, files_per_repo=5, seed=42, use_ray=False)
    t1 = pads.dataset(corpus_dir).to_table().sort_by([("repo", "ascending"),
                                                      ("path", "ascending")])
    t2 = pads.dataset(str(d2)).to_table().sort_by([("repo", "ascending"),
                                                   ("path", "ascending")])
    assert t1.equals(t2)  # ray and serial generation agree byte-for-byte


def test_sha256_row_invariant(corpus_dir):
    """Engine-computed shas equal an independent driver-side recompute."""
    engine = compute_sha_table(corpus_dir).to_pandas()
    raw = pads.dataset(corpus_dir).to_table().to_pandas()
    raw["sha_oracle"] = raw["content"].map(
        lambda c: hashlib.sha256(c.encode()).hexdigest())
    merged = engine.merge(raw[["repo", "path", "sha_oracle"]], on=["repo", "path"])
    assert len(merged) == len(raw)
    assert (merged["sha256"] == merged["sha_oracle"]).all()


def test_edge_extraction_vs_oracle(corpus_dir):
    g = build_graph_from_corpus(corpus_dir)
    # oracle: plain python over the whole corpus
    raw = pads.dataset(corpus_dir).to_table().to_pandas()
    pat = re.compile(r"^import\s+(\S+)", re.M)
    from collections import Counter
    cnt = Counter()
    for r, c in zip(raw["repo"], raw["content"]):
        for d in pat.findall(c):
            if d != r:
                cnt[(r, d)] += 1
    keys = sorted(set(raw["repo"]) | {d for (_, d) in cnt})
    vid = {k: i for i, k in enumerate(keys)}
    expected = sorted(((vid[s], vid[d]), w) for (s, d), w in cnt.items())
    got = sorted(zip(zip(g.src.tolist(), g.dst.tolist()), g.weight.tolist()))
    assert g.n == len(keys)
    assert [e for e, _ in got] == [e for e, _ in expected]
    assert [w for _, w in got] == [float(w) for _, w in expected]
    assert list(g.keys) == keys  # IdMap invariant: vids ascend in key order


def test_algorithms_on_built_graph(corpus_dir, tmp_path):
    g = build_graph_from_corpus(corpus_dir, save_dir=str(tmp_path / "g"))
    pr = pagerank(g, tolerance=1e-7, max_iterations=20, execution="local")
    assert pr.table.num_rows == g.n
    assert np.all(pr.table.column("score").to_numpy(zero_copy_only=False) >= 0.15 - 1e-9)
    cc = wcc(g, execution="local")
    assert cc.table.num_rows == g.n
    # persisted canonical layout round-trips
    from graph_data_science_ray import Graph
    g2 = Graph.load(str(tmp_path / "g"))
    assert np.array_equal(g2.src, g.src) and np.array_equal(g2.dst, g.dst)


class TestStreamingLayoutBuild:
    """Round-2: fully streaming corpus → canonical layout (driver holds only
    the manifest), parquet-backed execution for all orientations."""

    def _corpus(self, tmp_path):
        import os

        from graph_data_science_ray.sources.corpus import generate_corpus
        d = str(tmp_path / "corpus")
        generate_corpus(d, num_repos=120, files_per_repo=6, seed=7)
        return d

    def test_layout_matches_driver_build_all_orientations(self, tmp_path):
        import numpy as np

        from graph_data_science_ray import (label_propagation, pagerank, wcc)
        from graph_data_science_ray.pipelines.graph_build import (
            build_graph_from_corpus, build_graph_layout_from_corpus)
        d = self._corpus(tmp_path)
        g = build_graph_from_corpus(d)
        pg = build_graph_layout_from_corpus(d, str(tmp_path / "layout"),
                                            num_partitions=3)
        assert (pg.n, pg.num_edges) == (g.n, g.num_edges)
        # natural orientation: PageRank
        s_old = pagerank(g, tolerance=1e-7, weighted=True, execution="local") \
            .table.column("score").to_numpy(zero_copy_only=False)
        s_new = pagerank(pg, tolerance=1e-7, weighted=True, execution="ray") \
            .table.column("score").to_numpy(zero_copy_only=False)
        np.testing.assert_allclose(s_new, s_old, atol=1e-9)
        # undirected orientation (merged fwd+rev slices): WCC exact
        c_old = wcc(g, execution="local").table.column("component") \
            .to_numpy(zero_copy_only=False)
        c_new = wcc(pg, execution="ray").table.column("component") \
            .to_numpy(zero_copy_only=False)
        assert np.array_equal(c_new, c_old)
        # reverse orientation: LPA converged labels
        l_old = label_propagation(g, execution="local", num_partitions=1) \
            .table.column("label").to_numpy(zero_copy_only=False)
        l_new = label_propagation(pg, execution="ray", num_partitions=1) \
            .table.column("label").to_numpy(zero_copy_only=False)
        assert np.array_equal(l_new, l_old)

    def test_hash_id_join_equals_broadcast(self, tmp_path):
        import numpy as np
        import pyarrow.parquet as pq

        from graph_data_science_ray.pipelines.graph_build import (
            build_graph_layout_from_corpus)
        d = self._corpus(tmp_path)
        pb = build_graph_layout_from_corpus(d, str(tmp_path / "lb"),
                                            num_partitions=2, id_join="broadcast")
        ph = build_graph_layout_from_corpus(d, str(tmp_path / "lh"),
                                            num_partitions=2, id_join="hash")
        assert (pb.n, pb.num_edges) == (ph.n, ph.num_edges)
        # identical canonical edge tables
        def edges(pg):
            sh = pg.shards(1, "natural")[0]
            return sh.indptr, sh.indices, sh.weights
        for x, y in zip(edges(pb), edges(ph)):
            np.testing.assert_array_equal(x, y)

    def test_result_dir_write_mode(self, tmp_path):
        import os

        import numpy as np
        import pyarrow.parquet as pq

        from graph_data_science_ray import pagerank
        from graph_data_science_ray.pipelines.graph_build import (
            build_graph_layout_from_corpus)
        d = self._corpus(tmp_path)
        pg = build_graph_layout_from_corpus(d, str(tmp_path / "layout2"),
                                            num_partitions=3)
        rd = str(tmp_path / "result")
        res = pagerank(pg, tolerance=1e-7, weighted=True, execution="ray",
                       result_dir=rd)
        assert res.table is None  # nothing materialized on the driver
        files = sorted(f for f in os.listdir(rd) if f.endswith(".parquet"))
        assert files
        import pyarrow as pa
        t = pa.concat_tables([pq.read_table(os.path.join(rd, f)) for f in files])
        assert t.num_rows == pg.n
        ref = pagerank(pg, tolerance=1e-7, weighted=True, execution="ray")
        got = t.to_pandas().sort_values("vid")["score"].to_numpy()
        np.testing.assert_allclose(
            got, ref.table.column("score").to_numpy(zero_copy_only=False),
            atol=1e-12)
