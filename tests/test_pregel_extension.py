"""The user-extension surface (SURVEY.md §2.7): a custom vertex computation
written against the public Computation protocol — the Ray analogue of writing a
PregelComputation against pregel/.../PregelComputation.java.

Example: BFS hop distance from a source (min-combine Pregel), mirroring
examples/pregel-example/.../bfs in the reference."""

import numpy as np

from graph_data_science_ray import Computation, Graph, run_pregel


class BfsComputation(Computation):
    """Hop distance from a source vertex; messages carry the sender's distance,
    combined with MIN; a vertex re-broadcasts only when its distance improved."""

    reducer = "min"
    state_spec = [("dist", np.float64)]
    output_cols = {"distance": "dist"}

    def __init__(self, source_vid: int):
        self.source = source_vid

    def init_part(self, vids, shard, st):
        is_src = vids == self.source
        st["dist"][:] = np.where(is_src, 0.0, np.inf)
        st["sending"][:] = is_src.astype(np.uint8)
        st["send"][:] = 0.0

    def apply_part(self, vids, st, msg, superstep, shard):
        cand = np.where(msg.has, msg.vals + 1.0, np.inf)
        better = cand < st["dist"]
        st["dist"][:] = np.where(better, cand, st["dist"])
        st["sending"][:] = better.astype(np.uint8)
        st["send"][:] = np.where(better, st["dist"], 0.0)
        st["changed"][:] = better.astype(np.uint8)


def test_custom_computation_bfs_distances():
    # path graph a-b-c-d-e plus a shortcut a-e
    g = Graph.from_edge_list(
        [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"), ("a", "e")],
        orientation="undirected")
    res = run_pregel(g, BfsComputation(0), max_iterations=20, execution="local")
    dist = res.table.column("distance").to_numpy(zero_copy_only=False)
    assert dist.tolist() == [0.0, 1.0, 2.0, 2.0, 1.0]
    assert res.did_converge


def test_custom_computation_all_modes_agree():
    rng = np.random.default_rng(21)
    g = Graph.from_edges(rng.integers(0, 60, 200), rng.integers(0, 60, 200),
                         n=60, aggregation="single")
    lo = run_pregel(g, BfsComputation(3), max_iterations=30, execution="local",
                    num_partitions=3)
    ac = run_pregel(g, BfsComputation(3), max_iterations=30, execution="ray",
                    num_partitions=3)
    np.testing.assert_array_equal(
        lo.table.column("distance").to_numpy(zero_copy_only=False),
        ac.table.column("distance").to_numpy(zero_copy_only=False))


class MaxPropagation:
    """Component id = MAX vid in component — exercises Reducer.Max."""


def test_max_reducer_all_modes():
    import numpy as np

    from graph_data_science_ray import Computation, Graph, run_pregel

    class MaxComp(Computation):
        orientation = "undirected"
        reducer = "max"
        idempotent_on_empty = True
        state_spec = [("comp", np.int64)]
        output_cols = {"component": "comp"}

        def init_part(self, vids, shard, st):
            st["comp"][:] = vids
            st["sending"][:] = (np.diff(shard.indptr) > 0).astype(np.uint8)
            st["send"][:] = vids.astype(np.float64)

        def apply_part(self, vids, st, msg, superstep, shard):
            cand = np.where(msg.has, msg.vals, -np.inf)
            better = cand > st["comp"]
            st["comp"][:] = np.where(better, cand, st["comp"]).astype(np.int64)
            st["sending"][:] = better.astype(np.uint8)
            st["send"][:] = st["comp"].astype(np.float64)
            st["changed"][:] = better.astype(np.uint8)

    rng = np.random.default_rng(21)
    # 5 chains of 12 (ray-data mode pays per-superstep pipeline overhead)
    src = np.concatenate([np.arange(12 * i, 12 * i + 11) for i in range(5)])
    dst = src + 1
    g = Graph.from_edges(src, dst, n=60)
    expect = np.repeat(np.arange(5) * 12 + 11, 12)
    for mode in ("local", "ray", "ray-data"):
        res = run_pregel(g, MaxComp(), max_iterations=100, execution=mode,
                         num_partitions=3)
        got = res.table.column("component").to_numpy(zero_copy_only=False)
        assert np.array_equal(got, expect), mode


def test_count_reducer_in_degree():
    import numpy as np

    from graph_data_science_ray import Computation, Graph, run_pregel

    class InDegree(Computation):
        reducer = "count"
        state_spec = [("indeg", np.float64)]
        output_cols = {"in_degree": "indeg"}

        def init_part(self, vids, shard, st):
            st["sending"][:] = (np.diff(shard.indptr) > 0).astype(np.uint8)
            st["send"][:] = 1.0

        def apply_part(self, vids, st, msg, superstep, shard):
            if superstep == 1:
                st["indeg"][:] = np.where(msg.has, msg.vals, 0.0)
            st["sending"][:] = 0

    rng = np.random.default_rng(22)
    n, m = 80, 400
    src = rng.integers(0, n, m)
    dst = rng.integers(0, n, m)
    g = Graph.from_edges(src, dst, n=n)
    expect = np.bincount(g.dst, minlength=n).astype(np.float64)
    for mode in ("local", "ray", "ray-data"):
        res = run_pregel(g, InDegree(), max_iterations=2, execution=mode,
                         num_partitions=3)
        got = res.table.column("in_degree").to_numpy(zero_copy_only=False)
        assert np.allclose(got, expect), mode


def test_queue_messenger_median_of_neighbors():
    """No-combiner mode: vertices receive the full message list
    (SyncQueueMessenger analogue) — median is not reducible."""
    import numpy as np

    from graph_data_science_ray import Computation, Graph, run_pregel

    class NeighborMedian(Computation):
        reducer = None
        state_spec = [("med", np.float64)]
        output_cols = {"median": "med"}

        def init_part(self, vids, shard, st):
            st["sending"][:] = (np.diff(shard.indptr) > 0).astype(np.uint8)
            st["send"][:] = vids.astype(np.float64)

        def apply_part(self, vids, st, msg, superstep, shard):
            if superstep == 1:
                for v in range(vids.shape[0]):
                    ms = msg.messages_of(v)
                    st["med"][v] = float(np.median(ms)) if ms.shape[0] else -1.0
            st["sending"][:] = 0

    rng = np.random.default_rng(23)
    n, m = 60, 300
    src = rng.integers(0, n, m)
    dst = rng.integers(0, n, m)
    g = Graph.from_edges(src, dst, n=n)
    expect = np.full(n, -1.0)
    for v in range(n):
        ins = g.src[g.dst == v]
        if ins.shape[0]:
            expect[v] = float(np.median(ins))
    for mode in ("local", "ray", "ray-data"):
        res = run_pregel(g, NeighborMedian(), max_iterations=2, execution=mode,
                         num_partitions=3)
        got = res.table.column("median").to_numpy(zero_copy_only=False)
        assert np.allclose(got, expect), mode


def test_memory_estimation_guard():
    """Pre-run estimate aborts oversized jobs (MemoryUsageValidator analogue);
    memory_limit_bytes=0 is the 'sudo' override."""
    import numpy as np
    import pytest

    from graph_data_science_ray import Graph, pagerank
    from graph_data_science_ray.pipelines.pregel import (
        MemoryEstimationExceeded, estimate_pregel_memory)
    from graph_data_science_ray.pipelines.pagerank import PageRankComputation
    rng = np.random.default_rng(50)
    g = Graph.from_edges(rng.integers(0, 100, 500), rng.integers(0, 100, 500),
                         n=100)
    est = estimate_pregel_memory(g, PageRankComputation(0.85, 1e-7), 4)
    assert est["total_bytes"] > 0
    # a 1-byte budget must refuse the run
    with pytest.raises(MemoryEstimationExceeded):
        pagerank(g, execution="local", memory_limit_bytes=1)
    # sudo override runs anyway
    res = pagerank(g, execution="local", memory_limit_bytes=0)
    assert res.table.num_rows == 100
    # default budget (available RAM) admits the small job
    res2 = pagerank(g, execution="local")
    assert res2.table.num_rows == 100


class QueueBfs(Computation):
    """BFS over raw message queues (reducer=None) — min is taken in user code,
    so it runs under BOTH queue messengers: double-buffered (sync) and the
    shared-pool async one (AsyncQueueMessenger.java analogue)."""

    reducer = None
    state_spec = [("dist", np.float64)]
    output_cols = {"distance": "dist"}

    def __init__(self, source_vid: int, asynchronous: bool = False):
        self.source = source_vid
        self.asynchronous = asynchronous

    def init_part(self, vids, shard, st):
        is_src = vids == self.source
        st["dist"][:] = np.where(is_src, 0.0, np.inf)
        st["sending"][:] = is_src.astype(np.uint8)
        st["send"][:] = 0.0

    def apply_part(self, vids, st, msg, superstep, shard):
        best = np.full(vids.shape[0], np.inf)
        if msg.local.shape[0]:
            np.minimum.at(best, msg.local, msg.vals)
        cand = best + 1.0
        better = cand < st["dist"]
        st["dist"][:] = np.where(better, cand, st["dist"])
        st["sending"][:] = better.astype(np.uint8)
        st["send"][:] = np.where(better, st["dist"], 0.0)
        st["changed"][:] = better.astype(np.uint8)


class TestAsyncQueueMessenger:
    def _path(self, n=10):
        return Graph.from_edges(np.arange(n - 1), np.arange(1, n), n=n)

    def test_same_result_fewer_supersteps(self):
        """On a vid-ascending path with one vertex per partition, the fixed
        partition sweep propagates the whole chain in ONE superstep (each
        partition consumes the previous one's message the moment it lands) —
        the same-superstep visibility that defines the async messenger."""
        g = self._path(10)
        sync = run_pregel(g, QueueBfs(0), max_iterations=30,
                          execution="local", num_partitions=10)
        asy = run_pregel(g, QueueBfs(0, asynchronous=True), max_iterations=30,
                         execution="local", num_partitions=10)
        expect = np.arange(10, dtype=np.float64)
        np.testing.assert_array_equal(
            sync.table.column("distance").to_numpy(zero_copy_only=False),
            expect)
        np.testing.assert_array_equal(
            asy.table.column("distance").to_numpy(zero_copy_only=False),
            expect)
        assert sync.ran_iterations >= 9  # one hop per superstep
        assert asy.ran_iterations <= 3   # whole chain per sweep
        assert asy.did_converge and sync.did_converge

    def test_matches_sync_on_random_graph(self):
        rng = np.random.default_rng(33)
        g = Graph.from_edges(rng.integers(0, 80, 400),
                             rng.integers(0, 80, 400), n=80,
                             orientation="undirected", aggregation="single")
        sync = run_pregel(g, QueueBfs(5), max_iterations=50,
                          execution="local", num_partitions=4)
        asy = run_pregel(g, QueueBfs(5, asynchronous=True), max_iterations=50,
                         execution="local", num_partitions=4)
        np.testing.assert_array_equal(
            asy.table.column("distance").to_numpy(zero_copy_only=False),
            sync.table.column("distance").to_numpy(zero_copy_only=False))
        assert asy.ran_iterations <= sync.ran_iterations

    def test_checkpoint_resume(self, tmp_path):
        rng = np.random.default_rng(34)
        g = Graph.from_edges(rng.integers(0, 60, 250),
                             rng.integers(0, 60, 250), n=60,
                             orientation="undirected", aggregation="single")
        full = run_pregel(g, QueueBfs(2, asynchronous=True),
                          max_iterations=30, execution="local",
                          num_partitions=3)
        ck = str(tmp_path / "ck")
        run_pregel(g, QueueBfs(2, asynchronous=True), max_iterations=2,
                   execution="local", num_partitions=3, checkpoint_dir=ck)
        resumed = run_pregel(g, QueueBfs(2, asynchronous=True),
                             max_iterations=30, execution="local",
                             num_partitions=3, checkpoint_dir=ck,
                             resume=True)
        np.testing.assert_array_equal(
            resumed.table.column("distance").to_numpy(zero_copy_only=False),
            full.table.column("distance").to_numpy(zero_copy_only=False))

    def test_validation(self):
        import pytest
        g = self._path(4)

        class BadReduce(QueueBfs):
            reducer = "min"

        with pytest.raises(ValueError, match="reducer=None"):
            run_pregel(g, BadReduce(0, asynchronous=True), max_iterations=5)
        with pytest.raises(ValueError, match="shared-memory"):
            run_pregel(g, QueueBfs(0, asynchronous=True), max_iterations=5,
                       execution="ray")
