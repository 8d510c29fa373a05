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


def _in_edges_fn(graph):
    """Returns in_edges(v) -> (sources, weights) for path reconstruction.

    Driver Graph: binary search over the REVERSE-sorted edge arrays.
    ParquetGraph: point lookup into the edges_rev layout — reads only the one
    part file covering v (cached per walk), never the whole edge set."""
    from ..state.graph import ParquetGraph
    if isinstance(graph, ParquetGraph):
        import os

        import pyarrow.parquet as pq
        bounds = graph.manifest["bounds"]["edges_rev"]
        cache = {}

        def in_edges(v):
            q = int(np.searchsorted(np.asarray(bounds), v, side="right") - 1)
            if q not in cache:
                fp = os.path.join(graph.path, "edges_rev", f"part-{q:05d}.parquet")
                if not os.path.exists(fp):
                    cache[q] = None
                else:
                    t = pq.read_table(fp)
                    cache[q] = (t.column("src").to_numpy(zero_copy_only=False),
                                t.column("dst").to_numpy(zero_copy_only=False),
                                t.column("weight").to_numpy(zero_copy_only=False)
                                if "weight" in t.column_names else None)
            part = cache[q]
            if part is None:
                return (np.empty(0, dtype=np.int64), None)
            s, d, w = part
            a, b = np.searchsorted(s, [v, v + 1])
            return d[a:b], (w[a:b] if w is not None else None)
    else:
        rs, rd, rw = graph._oriented_sorted("reverse")

        def in_edges(v):
            a, b = np.searchsorted(rs, [v, v + 1])
            return rd[a:b], (rw[a:b] if rw is not None else None)
    return in_edges


def _reconstruct_path(graph, dist: np.ndarray, source: int, target: int,
                      weighted: bool, atol: float = 1e-9):
    """Backward walk: predecessor u of t satisfies dist[u] + w(u,t) == dist[t]
    (ties → smallest u, deterministic).  Path length bounded by hop count."""
    in_edges = _in_edges_fn(graph)
    path = [target]
    costs = [float(dist[target])]
    t = target
    while t != source:
        srcs, ws = in_edges(t)
        if srcs.shape[0] == 0:
            return None, None
        step = (ws if (weighted and ws is not None)
                else np.ones(srcs.shape[0]))
        ok = np.abs(dist[srcs] + step - dist[t]) <= atol * max(1.0, abs(dist[t]))
        cand = srcs[ok]
        if cand.shape[0] == 0:
            return None, None
        t = int(cand.min())
        path.append(t)
        costs.append(float(dist[t]))
    return path[::-1], costs[::-1]


def dijkstra(graph: Graph, source, targets=None, *,
             weighted: Optional[bool] = None, execution: str = "auto",
             num_partitions: Optional[int] = None) -> pa.Table:
    """Weighted source-target shortest paths WITH path reconstruction — the
    gds.shortestPath.dijkstra / allShortestPaths result shape
    (ref algo/.../paths/dijkstra/Dijkstra.java:48, PathResult): one row per
    reachable target: (index, source_node, target_node, total_cost,
    node_ids: list<int64>, costs: list<float64>).

    Distances come from the BSP min-relaxation (exact for non-negative
    weights); the path is rebuilt by a backward predecessor walk using only
    point lookups into the reverse adjacency — O(path length) reads, no
    driver-side graph materialization for parquet-backed graphs."""
    if weighted is None:
        weighted = graph.is_weighted
    res = shortest_paths(graph, source, weighted=weighted, execution=execution,
                         num_partitions=num_partitions)
    if not isinstance(source, (int, np.integer)):
        idx = np.nonzero(np.asarray(graph.keys, dtype=object) == source)[0]
        source = int(idx[0])
    dist = res.table.column("distance").to_numpy(zero_copy_only=False)
    if targets is None:
        tg = np.nonzero(np.isfinite(dist))[0]
    else:
        tg = np.asarray([t if isinstance(t, (int, np.integer))
                         else int(np.nonzero(np.asarray(graph.keys, dtype=object)
                                             == t)[0][0])
                         for t in targets], dtype=np.int64)
    rows = {"index": [], "source_node": [], "target_node": [],
            "total_cost": [], "node_ids": [], "costs": []}
    i = 0
    for t in tg:
        t = int(t)
        if not np.isfinite(dist[t]):
            continue
        path, costs = _reconstruct_path(graph, dist, int(source), t, weighted)
        if path is None:
            continue
        rows["index"].append(i)
        rows["source_node"].append(int(source))
        rows["target_node"].append(t)
        rows["total_cost"].append(float(dist[t]))
        rows["node_ids"].append(path)
        rows["costs"].append(costs)
        i += 1
    import pyarrow as pa_
    return pa_.table({
        "index": pa_.array(rows["index"], pa_.int64()),
        "source_node": pa_.array(rows["source_node"], pa_.int64()),
        "target_node": pa_.array(rows["target_node"], pa_.int64()),
        "total_cost": pa_.array(rows["total_cost"], pa_.float64()),
        "node_ids": pa_.array(rows["node_ids"], pa_.list_(pa_.int64())),
        "costs": pa_.array(rows["costs"], pa_.list_(pa_.float64())),
    })


def shortest_paths(graph: Graph, source, *, weighted: Optional[bool] = None,
                   max_iterations: int = 1000, execution: str = "auto",
                   num_partitions: Optional[int] = None) -> PregelResult:
    """Single-source shortest paths (hop count when unweighted).

    ``source`` may be a vid or a node key.  Negative edge weights are rejected
    (the relaxation fixpoint requires non-negative weights, like Dijkstra)."""
    if weighted is None:
        weighted = graph.is_weighted
    if weighted:
        if not graph.is_weighted:
            raise ValueError("weighted SSSP requires edge weights")
        w = getattr(graph, "weight", None)  # parquet-backed graphs validate at build
        if w is not None and np.any(w < 0):
            raise ValueError("negative edge weights are not supported")
    if not isinstance(source, (int, np.integer)):
        idx = np.nonzero(np.asarray(graph.keys, dtype=object) == source)[0]
        if idx.shape[0] == 0:
            raise KeyError(f"unknown source node {source!r}")
        source = int(idx[0])
    comp = SsspComputation(source, weighted)
    return run_pregel(graph, comp, max_iterations=max_iterations,
                      execution=execution, num_partitions=num_partitions)


class LongestPathComputation(Computation):
    """DAG longest path as a BSP max-relaxation.

    The reference groups this under the alpha 'walking' family (SURVEY §2.6
    "DAG longest path / walking"; ref alpha/alpha-algo/.../impl/walking/).
    A topological-order DP does not distribute directly, but on a DAG the
    label-correcting MAX relaxation reaches the same fixpoint: every vertex
    starts as a potential path source with dist 0 and re-broadcasts only on
    improvement, so the run converges in (longest path hop count) supersteps
    — each superstep is one vectorized scatter over the CSR shards, not a
    sequential topological sweep.  Cyclic inputs would relax forever; the
    max_iterations guard turns that into a hard error instead of a silently
    wrong answer."""

    reducer = "max"
    edge_combine = "add"
    idempotent_on_empty = True  # max-relaxation: no messages => distances final
    state_spec = [("dist", np.float64)]
    output_cols = {"distance": "dist"}

    def __init__(self, weighted: bool):
        self.weighted = weighted

    def init_part(self, vids, shard, st):
        st["dist"][:] = 0.0
        st["sending"][:] = 1   # every vertex is a potential path start
        st["send"][:] = 0.0

    def apply_part(self, vids, st, msg, superstep, shard):
        cand = np.where(msg.has, msg.vals if self.weighted else msg.vals + 1.0,
                        -np.inf)
        better = cand > st["dist"]
        st["dist"][:] = np.where(better, cand, st["dist"])
        st["sending"][:] = better.astype(np.uint8)
        st["send"][:] = np.where(better, st["dist"], 0.0)
        st["changed"][:] = better.astype(np.uint8)


def dag_longest_path(graph: Graph, *, weighted: Optional[bool] = None,
                     max_iterations: int = 1000, execution: str = "auto",
                     num_partitions: Optional[int] = None) -> PregelResult:
    """Longest path ending at each vertex of a DAG (hop count when unweighted;
    sum of weights when weighted — weights must be non-negative).

    Raises if the relaxation has not converged after ``max_iterations``
    supersteps, which on a finite-weight graph means the input has a cycle."""
    if weighted is None:
        weighted = graph.is_weighted
    if weighted:
        if not graph.is_weighted:
            raise ValueError("weighted longest path requires edge weights")
        w = getattr(graph, "weight", None)
        if w is not None and np.any(w < 0):
            raise ValueError("negative edge weights are not supported")
    res = run_pregel(graph, LongestPathComputation(weighted),
                     max_iterations=max_iterations, execution=execution,
                     num_partitions=num_partitions)
    if not res.did_converge:
        raise ValueError(
            f"longest-path relaxation did not converge in {max_iterations} "
            "supersteps — the input graph is not a DAG")
    return res
