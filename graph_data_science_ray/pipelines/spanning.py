"""Minimum/maximum spanning tree (Prim) and BFS/DFS traversal (alpha tier).

Reference:
  * Prim — alpha/alpha-algo/src/main/java/org/neo4j/gds/impl/spanningTrees/Prim.java:48-120
    (undirected weighted; MIN_OPERATOR/MAX_OPERATOR pick the tree; unreached
    nodes keep parent -1; effectiveNodeCount counts the reached component);
  * BFS/DFS — alpha/.../impl/traverse/Traverse.java (visit order from a source,
    optional max depth).

Sequential heap/stack kernels, like the reference's single-threaded compute."""

from __future__ import annotations

import heapq

import numpy as np
import pyarrow as pa

from ..state.graph import Graph


def spanning_tree(graph: Graph, start_node: int, *, maximum: bool = False) -> dict:
    """Prim from ``start_node`` over the UNDIRECTED view of the stored edges.
    Returns {table(vid, parent, cost), total_weight, effective_node_count}."""
    sh = graph.shards(1, "undirected")[0]
    indptr, indices = sh.indptr, sh.indices.astype(np.int64)
    w = sh.weights if sh.weights is not None else np.ones(indices.shape[0])
    n = graph.n
    sign = -1.0 if maximum else 1.0
    parent = np.full(n, -1, dtype=np.int64)
    cost = np.zeros(n)
    in_tree = np.zeros(n, dtype=bool)
    best = np.full(n, np.inf)
    best[start_node] = 0.0
    pq = [(0.0, int(start_node), -1, 0.0)]
    count = 0
    total = 0.0
    while pq:
        key, v, par, cw = heapq.heappop(pq)
        if in_tree[v]:
            continue
        in_tree[v] = True
        parent[v] = par
        cost[v] = cw
        total += cw
        count += 1
        for k in range(indptr[v], indptr[v + 1]):
            t = int(indices[k])
            if in_tree[t]:
                continue
            kw = sign * float(w[k])
            if kw < best[t]:
                best[t] = kw
                heapq.heappush(pq, (kw, t, v, float(w[k])))
    return {"table": pa.table({"vid": np.arange(n, dtype=np.int64),
                               "parent": parent, "cost": cost}),
            "total_weight": float(total),
            "effective_node_count": int(count)}


def bfs(graph: Graph, source: int, *, max_depth: int = -1) -> pa.Table:
    """Visit order from ``source`` over OUT edges (gds.alpha.bfs); ties visit
    smaller vids first (deterministic)."""
    sh = graph.shards(1, "natural")[0]
    indptr, indices = sh.indptr, sh.indices.astype(np.int64)
    n = graph.n
    seen = np.zeros(n, dtype=bool)
    seen[source] = True
    order = [int(source)]
    frontier = np.asarray([source], dtype=np.int64)
    depth = 0
    while frontier.shape[0] and (max_depth < 0 or depth < max_depth):
        nxt = []
        for v in frontier:
            for t in indices[indptr[v]:indptr[v + 1]]:
                if not seen[t]:
                    seen[t] = True
                    nxt.append(int(t))
        nxt = sorted(set(nxt))
        order.extend(nxt)
        frontier = np.asarray(nxt, dtype=np.int64)
        depth += 1
    return pa.table({"visit_order": np.arange(len(order), dtype=np.int64),
                     "vid": np.asarray(order, dtype=np.int64)})


def dfs(graph: Graph, source: int, *, max_depth: int = -1) -> pa.Table:
    """Preorder DFS from ``source`` over OUT edges; smaller vids explored first."""
    sh = graph.shards(1, "natural")[0]
    indptr, indices = sh.indptr, sh.indices.astype(np.int64)
    n = graph.n
    seen = np.zeros(n, dtype=bool)
    order = []
    stack = [(int(source), 0)]
    while stack:
        v, d = stack.pop()
        if seen[v]:
            continue
        seen[v] = True
        order.append(v)
        if max_depth >= 0 and d >= max_depth:
            continue
        nbrs = sorted(set(int(t) for t in indices[indptr[v]:indptr[v + 1]]
                          if not seen[t]), reverse=True)
        for t in nbrs:
            stack.append((t, d + 1))
    return pa.table({"visit_order": np.arange(len(order), dtype=np.int64),
                     "vid": np.asarray(order, dtype=np.int64)})
