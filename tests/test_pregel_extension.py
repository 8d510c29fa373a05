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
