"""A* source-target and Yen's K shortest loopless paths.

Reference:
  * A* — algo/src/main/java/org/neo4j/gds/paths/astar/AStar.java: Dijkstra with
    the haversine nautical-mile heuristic over latitude/longitude node
    properties (EARTH_RADIUS_IN_NM = 6371·0.539957, AStar.java:107-163);
  * Yen's — algo/src/main/java/org/neo4j/gds/paths/yens/Yens.java: spur-node
    scheme with root-path edge/node exclusions over repeated Dijkstra runs.

Both are sequential best-first searches in the reference too (a priority queue
does not distribute); they run driver-local over the CSR with heapq, like the
reference's single-threaded compute.  Candidate ordering for equal-cost Yen
paths: (cost, node-sequence lexicographic) — reproduces the reference's
emission order on its own fixtures (YensTest.pathInput).
Parallel-edge relationship tracking (trackRelationships) is not modeled: the
effective multigraph edge of minimum cost is traversed (documented deviation).
"""

from __future__ import annotations

import heapq
from typing import Optional

import numpy as np
import pyarrow as pa

from ..state.graph import Graph

KM_TO_NM = 0.539957
EARTH_RADIUS_NM = 6371 * KM_TO_NM


def _csr(graph: Graph):
    sh = graph.shards(1, "natural")[0]
    w = sh.weights if sh.weights is not None else np.ones(sh.indices.shape[0])
    return sh.indptr, sh.indices.astype(np.int64), w


def _dijkstra_heap(indptr, indices, w, source, target, heuristic=None,
                   banned_nodes=None, banned_edges=None):
    """Best-first search; returns (cost, path) or (inf, None).
    ``banned_edges``: set of (u, v) pairs; ``banned_nodes``: boolean mask."""
    n = indptr.shape[0] - 1
    dist = np.full(n, np.inf)
    parent = np.full(n, -1, dtype=np.int64)
    dist[source] = 0.0
    h0 = heuristic(source) if heuristic else 0.0
    pq = [(h0, 0.0, source)]
    done = np.zeros(n, dtype=bool)
    while pq:
        _, d, u = heapq.heappop(pq)
        if done[u]:
            continue
        done[u] = True
        if u == target:
            break
        for k in range(indptr[u], indptr[u + 1]):
            v = int(indices[k])
            if banned_nodes is not None and banned_nodes[v]:
                continue
            if banned_edges is not None and (u, v) in banned_edges:
                continue
            nd = d + float(w[k])
            if nd < dist[v]:
                dist[v] = nd
                parent[v] = u
                hv = heuristic(v) if heuristic else 0.0
                heapq.heappush(pq, (nd + hv, nd, v))
    if not np.isfinite(dist[target]):
        return np.inf, None
    path = [target]
    while path[-1] != source:
        path.append(int(parent[path[-1]]))
    return float(dist[target]), path[::-1]


def _path_table(rows):
    return pa.table({
        "index": pa.array([r[0] for r in rows], pa.int64()),
        "source_node": pa.array([r[1] for r in rows], pa.int64()),
        "target_node": pa.array([r[2] for r in rows], pa.int64()),
        "total_cost": pa.array([r[3] for r in rows], pa.float64()),
        "node_ids": pa.array([r[4] for r in rows], pa.list_(pa.int64())),
        "costs": pa.array([r[5] for r in rows], pa.list_(pa.float64())),
    })


def _costs_along(indptr, indices, w, path):
    out = [0.0]
    for a, b in zip(path[:-1], path[1:]):
        seg = slice(indptr[a], indptr[a + 1])
        hits = np.nonzero(indices[seg] == b)[0]
        out.append(out[-1] + float(w[seg][hits].min()))
    return out


def astar(graph: Graph, source: int, target: int, *,
          latitude_property: str = "latitude",
          longitude_property: str = "longitude") -> pa.Table:
    """gds.shortestPath.astar: Dijkstra + haversine-NM heuristic."""
    indptr, indices, w = _csr(graph)
    lat = np.asarray(graph.node_props[latitude_property], dtype=np.float64)
    lon = np.asarray(graph.node_props[longitude_property], dtype=np.float64)
    tlat, tlon = np.radians(lat[target]), np.radians(lon[target])

    def h(v):
        dlat = tlat - np.radians(lat[v])
        dlon = tlon - np.radians(lon[v])
        a = (np.sin(dlat / 2) ** 2
             + np.sin(dlon / 2) ** 2 * np.cos(np.radians(lat[v])) * np.cos(tlat))
        return EARTH_RADIUS_NM * 2 * np.arcsin(np.sqrt(a))

    cost, path = _dijkstra_heap(indptr, indices, w, int(source), int(target),
                                heuristic=h)
    if path is None:
        return _path_table([])
    return _path_table([(0, int(source), int(target), cost, path,
                         _costs_along(indptr, indices, w, path))])


def yens(graph: Graph, source: int, target: int, k: int = 3) -> pa.Table:
    """gds.shortestPath.yens: K shortest loopless paths (spur scheme)."""
    indptr, indices, w = _csr(graph)
    source, target = int(source), int(target)
    cost, path = _dijkstra_heap(indptr, indices, w, source, target)
    if path is None:
        return _path_table([])
    accepted = [(cost, path)]
    candidates: list = []  # (cost, path_tuple)
    seen = {tuple(path)}
    while len(accepted) < k:
        prev_path = accepted[-1][1]
        for i in range(len(prev_path) - 1):
            spur = prev_path[i]
            root = prev_path[:i + 1]
            root_cost = _costs_along(indptr, indices, w, root)[-1]
            banned_edges = set()
            for _, p in accepted:
                if p[:i + 1] == root and len(p) > i + 1:
                    banned_edges.add((p[i], p[i + 1]))
            for c, p in candidates:
                if list(p[:i + 1]) == root and len(p) > i + 1:
                    banned_edges.add((p[i], p[i + 1]))
            banned_nodes = np.zeros(indptr.shape[0] - 1, dtype=bool)
            banned_nodes[root[:-1]] = True
            sc, sp = _dijkstra_heap(indptr, indices, w, spur, target,
                                    banned_nodes=banned_nodes,
                                    banned_edges=banned_edges)
            if sp is None:
                continue
            total = root + sp[1:]
            tt = tuple(total)
            if tt in seen:
                continue
            seen.add(tt)
            heapq.heappush(candidates, (root_cost + sc, tt))
        if not candidates:
            break
        c, p = heapq.heappop(candidates)  # (cost, lexicographic) ordering
        accepted.append((c, list(p)))
    rows = [(i, source, target, c, p, _costs_along(indptr, indices, w, p))
            for i, (c, p) in enumerate(accepted)]
    return _path_table(rows)


_DS_MULT = 100_000.0  # reference's double→int scaling (ShortestPathDeltaStepping.java:74)


def _delta_stepping_local(n, indptr, indices, icost, idelta, source):
    """Bucketed SSSP over scaled-int costs.  Fixpoint-identical to the
    reference's relax schedule (any improvement re-buckets its target, and a
    closed bucket is final: an edge from bucket j > k lands at
    dist >= j*idelta + cost > bucket k's range)."""
    INF = np.int64(2**62)
    dist = np.full(n, INF, dtype=np.int64)
    dist[source] = 0
    light = icost <= idelta
    processed = np.zeros(n, dtype=bool)

    def _relax(frontier, edge_mask):
        starts = indptr[frontier]
        lens = indptr[frontier + 1] - starts
        total = int(lens.sum())
        if total == 0:
            return
        offs = np.concatenate(([0], np.cumsum(lens)[:-1]))
        g = np.arange(total, dtype=np.int64) + np.repeat(starts - offs, lens)
        keep = edge_mask[g]
        tgt = indices[g[keep]].astype(np.int64)
        cand = np.repeat(dist[frontier], lens)[keep] + icost[g[keep]]
        np.minimum.at(dist, tgt, cand)

    while True:
        unproc = (dist < INF) & ~processed
        if not unproc.any():
            break
        k = int(dist[unproc].min()) // int(idelta)
        members = []
        frontier = np.nonzero(unproc & (dist // idelta == k))[0]
        while frontier.shape[0]:
            members.append(frontier)
            prev = dist.copy()
            _relax(frontier, light)
            changed = dist != prev
            frontier = np.nonzero(changed & (dist // idelta == k))[0]
        R = np.unique(np.concatenate(members))
        _relax(R, ~light)
        processed[R] = True
    return dist


def delta_stepping(graph: Graph, source: int, delta: float, *,
                   execution: str = "local",
                   num_partitions=None) -> pa.Table:
    """Delta-stepping SSSP (ref alpha/alpha-algo/.../impl/
    ShortestPathDeltaStepping.java): distances are sums of per-edge
    ``round(cost * 1e5)`` scaled-int costs divided back by 1e5 (the
    reference's multiplier), +inf for unreached; ``delta`` buckets edges into
    light (cost <= delta) and heavy.

    The bucket schedule is a shared-memory scheduling optimization (the
    reference runs it on a thread pool); ``execution="ray"`` computes the
    identical scaled-int fixpoint through the distributed min-relaxation BSP
    (pipelines/paths.shortest_paths) — scaled integer weights are exact in
    float64, so the two paths are bit-equal."""
    idelta = int(round(_DS_MULT * delta))
    if idelta <= 0:
        raise ValueError("Choose a higher delta value")  # reference message
    n = graph.n
    if execution == "ray":
        from .paths import shortest_paths
        icost_f = np.round((graph.weight if graph.weight is not None
                            else np.ones(graph.src.shape[0])) * _DS_MULT)
        g2 = Graph.from_edges(graph.src, graph.dst, icost_f, n=n)
        res = shortest_paths(g2, int(source), weighted=True, execution="ray")
        d = res.table.column("distance").to_numpy(zero_copy_only=False) \
            / _DS_MULT
        return pa.table({"vid": np.arange(n, dtype=np.int64), "distance": d})
    indptr, indices, w = _csr(graph)
    icost = np.round(w * _DS_MULT).astype(np.int64)
    dist = _delta_stepping_local(n, indptr, indices, icost,
                                 np.int64(idelta), int(source))
    out = np.where(dist >= np.int64(2**62), np.inf, dist / _DS_MULT)
    return pa.table({"vid": np.arange(n, dtype=np.int64), "distance": out})
