"""Sliced vs shared message payloads must be bit-identical (pregel.py
scatter_global / slice_payload): "shared" publishes one whole-range payload per
producer (single-node zero-copy shape); "sliced" ships each receiver only its
own vid range (multi-node O(n)-bytes-per-superstep shape).  Covers every
payload tag: dense sum "F", dense min "Fm", keyed "k", sparse "s", queue "q"."""

import numpy as np

from graph_data_science_ray import Computation, Graph, run_pregel
from graph_data_science_ray.pipelines.labelprop import LabelPropagationComputation
from graph_data_science_ray.pipelines.pagerank import PageRankComputation
from graph_data_science_ray.pipelines.pregel import slice_payload
from graph_data_science_ray.pipelines.wcc import WccComputation
from graph_data_science_ray.sources.generator import random_graph


def _run_both(g, make_comp, max_iterations, P=4):
    a = run_pregel(g, make_comp(), max_iterations=max_iterations,
                   execution="ray", num_partitions=P, payload_mode="shared")
    b = run_pregel(g, make_comp(), max_iterations=max_iterations,
                   execution="ray", num_partitions=P, payload_mode="sliced")
    assert a.table.column_names == b.table.column_names
    for c in a.table.column_names:
        va = a.table.column(c).to_numpy(zero_copy_only=False)
        vb = b.table.column(c).to_numpy(zero_copy_only=False)
        assert np.array_equal(va, vb), c
    assert a.ran_iterations == b.ran_iterations
    return a, b


def test_pagerank_sliced_equals_shared():
    # power-law: dense "F" payloads in the hot supersteps, sparse "s" at the tail
    g = random_graph(5_000, 8, seed=11)
    _run_both(g, lambda: PageRankComputation(0.85, 1e-9, [], False), 20)


def test_wcc_min_reducer_sliced_equals_shared():
    g = random_graph(4_000, 3, seed=7)
    _run_both(g, WccComputation, 50)


def test_lpa_keyed_sliced_equals_shared():
    g = random_graph(3_000, 6, seed=5)
    _run_both(g, LabelPropagationComputation, 10)


def test_queue_mode_sliced_equals_shared():
    class NeighborSum(Computation):
        reducer = None  # queue messenger: raw per-vertex message lists ("q")
        state_spec = [("s", np.float64)]
        output_cols = {"nsum": "s"}

        def init_part(self, vids, shard, st):
            st["sending"][:] = (np.diff(shard.indptr) > 0).astype(np.uint8)
            st["send"][:] = vids.astype(np.float64)

        def apply_part(self, vids, st, msg, superstep, shard):
            if superstep == 1:
                for v in range(vids.shape[0]):
                    st["s"][v] = float(msg.messages_of(v).sum())
            st["sending"][:] = 0

    rng = np.random.default_rng(3)
    src = rng.integers(0, 500, 2_000)
    dst = rng.integers(0, 500, 2_000)
    g = Graph.from_edges(src, dst, n=500)
    _run_both(g, NeighborSum, 2, P=3)


def test_slice_payload_covers_every_tag():
    """Unit-level: slicing then concatenating recovers the global payload."""
    bounds = np.array([0, 3, 7, 10])

    class C:
        keyed = False
        reducer = "sum"

    # dense sum
    sumv = np.arange(10, dtype=np.float64)
    has = sumv % 2 == 0
    parts = slice_payload(C, ("F", sumv, has), bounds)
    assert [p[0] for p in parts] == ["Fs", "Fs", "Fs"]
    assert np.array_equal(np.concatenate([p[1] for p in parts]), sumv)
    assert np.array_equal(np.concatenate([p[2] for p in parts]), has)
    # dense min/max
    acc = np.arange(10, dtype=np.float64)
    assert [p[0] for p in slice_payload(C, ("Fm", acc), bounds)] == ["Fms"] * 3
    assert [p[0] for p in slice_payload(C, ("FM", acc), bounds)] == ["FMs"] * 3
    # sparse, unsorted on purpose
    dst = np.array([9, 1, 4, 1, 8], dtype=np.int64)
    vals = np.array([9.0, 1.0, 4.0, 1.5, 8.0])
    parts = slice_payload(C, ("s", dst, vals), bounds)
    assert np.array_equal(parts[0][1], [1, 1]) and parts[0][2].sum() == 2.5
    assert np.array_equal(parts[1][1], [4])
    assert np.array_equal(parts[2][1], [8, 9])
    # keyed (dst-sorted), middle partition empty -> None
    kd = np.array([0, 2, 9], dtype=np.int64)
    parts = slice_payload(C, ("k", kd, np.array([5, 6, 7]), np.ones(3)), bounds)
    assert np.array_equal(parts[0][1], [0, 2]) and parts[1] is None
    assert np.array_equal(parts[2][1], [9])
    # None fans out to None
    assert slice_payload(C, None, bounds) == [None, None, None]


def _run_grouped(g, make_comp, max_iterations, P=4, groups=2):
    import os
    a = run_pregel(g, make_comp(), max_iterations=max_iterations,
                   execution="ray", num_partitions=P, payload_mode="shared")
    os.environ["GDS_PAYLOAD_GROUPS"] = str(groups)
    try:
        b = run_pregel(g, make_comp(), max_iterations=max_iterations,
                       execution="ray", num_partitions=P,
                       payload_mode="grouped")
    finally:
        os.environ.pop("GDS_PAYLOAD_GROUPS", None)
    assert a.table.column_names == b.table.column_names
    for c in a.table.column_names:
        va = a.table.column(c).to_numpy(zero_copy_only=False)
        vb = b.table.column(c).to_numpy(zero_copy_only=False)
        assert np.array_equal(va, vb), c
    assert a.ran_iterations == b.ran_iterations


def test_pagerank_grouped_equals_shared():
    # grouped = per-NODE slices: K=2 "nodes" for P=4 partitions (the test
    # session's Ray has 4 CPUs — P must not exceed it, one actor per CPU)
    g = random_graph(5_000, 8, seed=11)
    _run_grouped(g, lambda: PageRankComputation(0.85, 1e-9, [], False), 20)


def test_wcc_min_grouped_equals_shared():
    g = random_graph(4_000, 3, seed=7)
    _run_grouped(g, WccComputation, 50)


def test_lpa_keyed_grouped_equals_shared():
    g = random_graph(3_000, 6, seed=5)
    _run_grouped(g, LabelPropagationComputation, 10, P=4, groups=3)


def test_grouped_uneven_groups_and_k_clamp():
    # K > P clamps to P (per-receiver slices); K from env ignored when unset
    g = random_graph(2_000, 4, seed=9)
    _run_grouped(g, WccComputation, 50, P=3, groups=7)


def test_slice_payload_grouped_covers_dense_tags():
    from graph_data_science_ray.pipelines.pregel import slice_payload_grouped

    class C:
        keyed = False
        reducer = "sum"

    gb = np.array([0, 4, 10])  # two node groups
    sumv = np.arange(10, dtype=np.float64)
    has = sumv % 2 == 0
    parts = slice_payload_grouped(C, ("F", sumv, has), gb)
    assert [p[0] for p in parts] == ["Fg", "Fg"]
    assert parts[0][1] == 0 and parts[1][1] == 4  # group range starts
    assert np.array_equal(np.concatenate([p[2] for p in parts]), sumv)
    acc = np.arange(10, dtype=np.float64)
    assert [p[0] for p in slice_payload_grouped(C, ("Fm", acc), gb)] == ["Fmg"] * 2
    assert [p[0] for p in slice_payload_grouped(C, ("FM", acc), gb)] == ["FMg"] * 2
    # sparse payloads delegate to slice_payload (global ids retained)
    dstv = np.array([9, 1, 4], dtype=np.int64)
    parts = slice_payload_grouped(C, ("s", dstv, dstv.astype(float)), gb)
    assert np.array_equal(parts[0][1], [1]) and np.array_equal(
        np.sort(parts[1][1]), [4, 9])
