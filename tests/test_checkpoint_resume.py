"""Checkpoint / resume: kill at iteration k, resume from ckpt/iter=k, final results
identical (north-rule requirement; per-partition lineage in the manifest)."""

import json
import os

import numpy as np
import pytest

from graph_data_science_ray import Graph, pagerank, wcc


@pytest.fixture
def medium_graph():
    rng = np.random.default_rng(3)
    n, m = 300, 1500
    return Graph.from_edges(rng.integers(0, n, m), rng.integers(0, n, m), n=n,
                            aggregation="single")


def test_checkpoint_layout_and_lineage(tmp_path, medium_graph):
    ck = tmp_path / "ck"
    res = pagerank(medium_graph, tolerance=0, max_iterations=5, execution="local",
                   num_partitions=3, checkpoint_dir=str(ck))
    iters = sorted(os.listdir(ck))
    assert "iter=0" in iters and "iter=4" in iters
    with open(ck / "iter=4" / "manifest.json") as f:
        m = json.load(f)
    assert m["complete"] and m["iteration"] == 4
    assert len(m["partitions"]) == 3
    for p in m["partitions"]:
        assert p["rows"] > 0 and len(p["sha256"]) == 64
    # per-superstep lineage log: one JSON line per checkpointed iteration,
    # each carrying the superstep metrics and total rows
    with open(ck / "metrics.jsonl") as f:
        lines = [json.loads(ln) for ln in f if ln.strip()]
    assert [ln["iteration"] for ln in lines] == [0, 1, 2, 3, 4]
    for ln in lines[1:]:  # iter=0 is the pre-run snapshot (no step metrics)
        assert ln["rows"] > 0 and "superstep" in ln and "written_at" in ln
    assert res.ran_iterations == 5


def test_resume_matches_uninterrupted(tmp_path, medium_graph):
    full = pagerank(medium_graph, tolerance=0, max_iterations=10, execution="local",
                    num_partitions=3)
    # "killed" run: only 4 supersteps got checkpointed
    ck = tmp_path / "ck"
    pagerank(medium_graph, tolerance=0, max_iterations=4, execution="local",
             num_partitions=3, checkpoint_dir=str(ck))
    resumed = pagerank(medium_graph, tolerance=0, max_iterations=10,
                       execution="local", num_partitions=3, checkpoint_dir=str(ck),
                       resume=True)
    np.testing.assert_allclose(
        resumed.table.column("score").to_numpy(zero_copy_only=False),
        full.table.column("score").to_numpy(zero_copy_only=False), atol=1e-12)


def test_resume_actor_mode(tmp_path, medium_graph):
    full = pagerank(medium_graph, tolerance=0, max_iterations=8, execution="ray",
                    num_partitions=3)
    ck = tmp_path / "ck"
    pagerank(medium_graph, tolerance=0, max_iterations=4, execution="ray",
             num_partitions=3, checkpoint_dir=str(ck))
    resumed = pagerank(medium_graph, tolerance=0, max_iterations=8, execution="ray",
                       num_partitions=3, checkpoint_dir=str(ck), resume=True)
    np.testing.assert_allclose(
        resumed.table.column("score").to_numpy(zero_copy_only=False),
        full.table.column("score").to_numpy(zero_copy_only=False), atol=1e-9)


def test_resume_ignores_mismatched_config(tmp_path, medium_graph):
    ck = tmp_path / "ck"
    pagerank(medium_graph, tolerance=0, max_iterations=4, execution="local",
             num_partitions=3, checkpoint_dir=str(ck))
    # different damping → different fingerprint → resume restarts from scratch
    res = pagerank(medium_graph, damping=0.5, tolerance=0, max_iterations=3,
                   execution="local", num_partitions=3, checkpoint_dir=str(ck),
                   resume=True)
    ref = pagerank(medium_graph, damping=0.5, tolerance=0, max_iterations=3,
                   execution="local", num_partitions=3)
    np.testing.assert_allclose(
        res.table.column("score").to_numpy(zero_copy_only=False),
        ref.table.column("score").to_numpy(zero_copy_only=False), atol=1e-12)


def test_wcc_resume(tmp_path):
    src, dst = [], []
    for i in range(8):
        for j in range(19):
            src.append(20 * i + j)
            dst.append(20 * i + j + 1)
    g = Graph.from_edges(src, dst, n=160)
    ck = tmp_path / "ck"
    wcc(g, max_iterations=3, execution="local", num_partitions=4,
        checkpoint_dir=str(ck))
    resumed = wcc(g, max_iterations=100, execution="local", num_partitions=4,
                  checkpoint_dir=str(ck), resume=True)
    assert np.array_equal(
        resumed.table.column("component").to_numpy(zero_copy_only=False),
        np.repeat(np.arange(8) * 20, 20))


def test_resume_ray_data_mode(tmp_path, medium_graph):
    """ray-data resume must skip manifest.json in the checkpoint dir (ADVICE r1)."""
    full = pagerank(medium_graph, tolerance=0, max_iterations=6,
                    execution="ray-data", num_partitions=3)
    ck = tmp_path / "ck"
    pagerank(medium_graph, tolerance=0, max_iterations=3, execution="ray-data",
             num_partitions=3, checkpoint_dir=str(ck))
    resumed = pagerank(medium_graph, tolerance=0, max_iterations=6,
                       execution="ray-data", num_partitions=3,
                       checkpoint_dir=str(ck), resume=True)
    f = full.table.to_pandas().sort_values("vid").reset_index(drop=True)
    r = resumed.table.to_pandas().sort_values("vid").reset_index(drop=True)
    np.testing.assert_allclose(r["score"], f["score"], atol=1e-9)


def test_fingerprint_distinguishes_array_config(tmp_path, medium_graph):
    """Personalized PR with different source sets must NOT share checkpoints."""
    ck = tmp_path / "ck"
    pagerank(medium_graph, tolerance=0, max_iterations=4, source_nodes=[0, 1],
             execution="local", num_partitions=3, checkpoint_dir=str(ck))
    res = pagerank(medium_graph, tolerance=0, max_iterations=4, source_nodes=[5, 6],
                   execution="local", num_partitions=3, checkpoint_dir=str(ck),
                   resume=True)
    ref = pagerank(medium_graph, tolerance=0, max_iterations=4, source_nodes=[5, 6],
                   execution="local", num_partitions=3)
    np.testing.assert_allclose(
        res.table.column("score").to_numpy(zero_copy_only=False),
        ref.table.column("score").to_numpy(zero_copy_only=False), atol=1e-12)


def test_resume_across_partition_counts():
    """A checkpoint written at P=4 must resume correctly at P=2 and P=6:
    rows route by CURRENT vid bounds, not the saved part column (the actor
    default P is machine-derived, so cross-machine resumes change P)."""
    import tempfile

    import numpy as np

    from graph_data_science_ray import Graph, pagerank

    rng = np.random.default_rng(8)
    src = rng.integers(0, 200, 1500)
    dst = rng.integers(0, 200, 1500)
    g = Graph.from_edges(src, dst, n=200)

    full = pagerank(g, tolerance=0.0, max_iterations=8,
                    execution="local").table.column("score").to_numpy()
    for p_resume in (2, 6):
        with tempfile.TemporaryDirectory() as d:
            pagerank(g, tolerance=0.0, max_iterations=4, execution="local",
                     num_partitions=4, checkpoint_dir=d)
            res = pagerank(g, tolerance=0.0, max_iterations=8,
                           execution="local", num_partitions=p_resume,
                           checkpoint_dir=d, resume=True)
            got = res.table.column("score").to_numpy()
            assert got.shape[0] == 200
            np.testing.assert_allclose(got, full, atol=1e-12)
