"""Shortest paths: single-source (Bellman-Ford-style Pregel) and BFS hop depth.

The reference ships Dijkstra (algo/src/main/java/org/neo4j/gds/paths/dijkstra/,
priority-queue sequential) and a Pregel SSSP example
(examples/pregel-example/.../sssp/SingleSourceShortestPathPregel.java); a
priority queue does not distribute, so the BSP formulation is the label-correcting
relaxation: messages carry ``dist(u) + w(u,v)`` (edge_combine="add"), combined
with MIN; a vertex re-broadcasts only when its distance improved.  Converges to
exact shortest paths for non-negative weights; unreachable = +inf."""

from __future__ import annotations

from typing import Optional

import numpy as np

from ..state.graph import Graph
from .pregel import Computation, PregelResult, run_pregel


class SsspComputation(Computation):
    reducer = "min"
    edge_combine = "add"
    idempotent_on_empty = True  # min-relaxation: no messages ⇒ distances final
    state_spec = [("dist", np.float64)]
    output_cols = {"distance": "dist"}

    def __init__(self, source_vid: int, weighted: bool):
        self.source = int(source_vid)
        self.weighted = weighted

    def init_part(self, vids, shard, st):
        is_src = vids == self.source
        st["dist"][:] = np.where(is_src, 0.0, np.inf)
        st["sending"][:] = is_src.astype(np.uint8)
        st["send"][:] = 0.0

    def apply_part(self, vids, st, msg, superstep, shard):
        cand = np.where(msg.has, msg.vals if self.weighted else msg.vals + 1.0,
                        np.inf)
        better = cand < st["dist"]
        st["dist"][:] = np.where(better, cand, st["dist"])
        st["sending"][:] = better.astype(np.uint8)
        st["send"][:] = np.where(better, st["dist"], 0.0)
        st["changed"][:] = better.astype(np.uint8)


def shortest_paths(graph: Graph, source, *, weighted: Optional[bool] = None,
                   max_iterations: int = 1000, execution: str = "auto",
                   num_partitions: Optional[int] = None) -> PregelResult:
    """Single-source shortest paths (hop count when unweighted).

    ``source`` may be a vid or a node key.  Negative edge weights are rejected
    (the relaxation fixpoint requires non-negative weights, like Dijkstra)."""
    if weighted is None:
        weighted = graph.is_weighted
    if weighted:
        if graph.weight is None:
            raise ValueError("weighted SSSP requires edge weights")
        if np.any(graph.weight < 0):
            raise ValueError("negative edge weights are not supported")
    if not isinstance(source, (int, np.integer)):
        idx = np.nonzero(np.asarray(graph.keys, dtype=object) == source)[0]
        if idx.shape[0] == 0:
            raise KeyError(f"unknown source node {source!r}")
        source = int(idx[0])
    comp = SsspComputation(source, weighted)
    return run_pregel(graph, comp, max_iterations=max_iterations,
                      execution=execution, num_partitions=num_partitions)
