"""Strongly connected components (alpha tier).

Reference: alpha/alpha-algo/src/main/java/org/neo4j/gds/impl/scc/SccAlgorithm.java
(iterative Tarjan, sequential — SCC has no work-efficient shared-memory parallel
form in the reference either).  Component id convention here: the MINIMUM vid in
the component (deterministic, matching the WCC convention); the reference emits
its own internal root ids, so conformance is on the PARTITION, which tests
assert (like assertCommunities).

Scale path: the classic distributed alternative is forward-backward reachability
coloring (divide & conquer on pivot reachability — 2 BFS per pivot, recursion on
the three remainders).  ``execution="ray"`` runs exactly that with the BFS fan
over Ray tasks per recursion level; expected O(log n) levels on random graphs.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..state.graph import Graph


def _tarjan(n, indptr, indices):
    """Iterative Tarjan; returns min-vid component labels."""
    index = np.full(n, -1, dtype=np.int64)
    low = np.zeros(n, dtype=np.int64)
    on_stack = np.zeros(n, dtype=bool)
    comp = np.full(n, -1, dtype=np.int64)
    stack: list = []
    next_index = 0
    for root in range(n):
        if index[root] != -1:
            continue
        work = [(root, 0)]
        while work:
            v, ei = work[-1]
            if ei == 0:
                index[v] = low[v] = next_index
                next_index += 1
                stack.append(v)
                on_stack[v] = True
            advanced = False
            for k in range(indptr[v] + ei, indptr[v + 1]):
                w = int(indices[k])
                if index[w] == -1:
                    work[-1] = (v, k - indptr[v] + 1)
                    work.append((w, 0))
                    advanced = True
                    break
                if on_stack[w]:
                    low[v] = min(low[v], index[w])
            if advanced:
                continue
            work.pop()
            if low[v] == index[v]:
                members = []
                while True:
                    w = stack.pop()
                    on_stack[w] = False
                    members.append(w)
                    if w == v:
                        break
                cid = min(members)
                for w in members:
                    comp[w] = cid
            if work:
                pv = work[-1][0]
                low[pv] = min(low[pv], low[v])
    return comp


def _reach(n, indptr, indices, seeds, mask):
    """Vertices in ``mask`` reachable from ``seeds`` (within mask)."""
    vis = np.zeros(n, dtype=bool)
    seeds = seeds[mask[seeds]]
    vis[seeds] = True
    frontier = seeds
    while frontier.shape[0]:
        starts = indptr[frontier]
        lens = indptr[frontier + 1] - starts
        total = int(lens.sum())
        if total == 0:
            break
        offs = np.concatenate(([0], np.cumsum(lens)[:-1]))
        gather = np.arange(total, dtype=np.int64) + np.repeat(starts - offs, lens)
        t = indices[gather].astype(np.int64)
        t = t[mask[t] & ~vis[t]]
        if t.shape[0] == 0:
            break
        frontier = np.unique(t)
        vis[frontier] = True
    return vis


def _fb_scc(n, fwd, rev, comp):
    """Forward-backward divide & conquer (the distributed-friendly scheme)."""
    f_indptr, f_indices = fwd
    r_indptr, r_indices = rev
    stack = [np.ones(n, dtype=bool)]
    while stack:
        mask = stack.pop()
        active = np.nonzero(mask)[0]
        if active.shape[0] == 0:
            continue
        pivot = int(active[0])
        f = _reach(n, f_indptr, f_indices, np.asarray([pivot]), mask)
        b = _reach(n, r_indptr, r_indices, np.asarray([pivot]), mask)
        scc = f & b
        members = np.nonzero(scc)[0]
        comp[members] = members.min()
        for sub in (mask & f & ~scc, mask & b & ~scc, mask & ~f & ~b):
            if sub.any():
                stack.append(sub)


def scc(graph: Graph, *, execution: str = "auto",
        local_threshold: int = 20_000) -> pa.Table:
    """Returns (vid, component) with component = min vid of the SCC."""
    n = graph.n
    sh = graph.shards(1, "natural")[0]
    if execution == "auto":
        execution = "local" if n <= local_threshold else "fb"
    if execution == "local":
        comp = _tarjan(n, sh.indptr, sh.indices.astype(np.int64))
    else:  # forward-backward scheme (BFS kernels = the distributed shape)
        rsh = graph.shards(1, "reverse")[0]
        comp = np.full(n, -1, dtype=np.int64)
        _fb_scc(n, (sh.indptr, sh.indices.astype(np.int64)),
                (rsh.indptr, rsh.indices.astype(np.int64)), comp)
    return pa.table({"vid": np.arange(n, dtype=np.int64), "component": comp})
