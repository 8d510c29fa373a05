"""Closeness and harmonic centrality (alpha tier).

Reference:
  * closeness — alpha/alpha-algo/.../impl/closeness/MSClosenessCentrality.java:
    farness[v] = Σ_s d(s→v) accumulated by multi-source BFS, component[v] =
    #sources reaching v; centrality = component/farness, or Wasserman-Faust
    (component/farness)·(component/(n-1)) (:153-161);
  * harmonic — alpha/.../impl/harmonic/HarmonicCentrality.java:
    inverseFarness[v] = Σ_s 1/d(s→v); centrality = inverseFarness/(n-1) (:90).

Execution shape identical to betweenness: per-source level-synchronous BFS
(vectorized over the CSR), sources fanned out over Ray tasks with the CSR
broadcast once; the only exchange is summing the per-node accumulators.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..state.graph import Graph


def _bfs_accumulate(n, indptr, indices, sources, harmonic: bool):
    """farness/inverse-farness + reach counts accumulated over per-source BFS."""
    acc = np.zeros(n)
    reach = np.zeros(n, dtype=np.int64)
    for s in sources:
        dist = np.full(n, -1, dtype=np.int64)
        dist[s] = 0
        frontier = np.asarray([s], dtype=np.int64)
        d = 0
        while frontier.shape[0]:
            starts = indptr[frontier]
            lens = indptr[frontier + 1] - starts
            total = int(lens.sum())
            if total == 0:
                break
            offs = np.concatenate(([0], np.cumsum(lens)[:-1]))
            gather = (np.arange(total, dtype=np.int64)
                      + np.repeat(starts - offs, lens))
            targets = indices[gather].astype(np.int64)
            new = targets[dist[targets] == -1]
            if new.shape[0] == 0:
                break
            nxt = np.unique(new)
            d += 1
            dist[nxt] = d
            acc[nxt] += (1.0 / d) if harmonic else d
            reach[nxt] += 1
            frontier = nxt
    return acc, reach


def _run(graph: Graph, harmonic: bool, execution: str, local_threshold: int):
    n = graph.n
    sh = graph.shards(1, "natural")[0]
    indptr, indices = sh.indptr, sh.indices
    sources = np.arange(n, dtype=np.int64)
    if execution == "auto":
        execution = "local" if n <= local_threshold else "ray"
    if execution == "local":
        return _bfs_accumulate(n, indptr, indices, sources, harmonic)
    import ray
    csr_ref = ray.put((indptr, indices))

    @ray.remote
    def _chunk(srcs):
        ip, ix = ray.get(csr_ref)
        return _bfs_accumulate(n, ip, ix, srcs, harmonic)

    ncpu = int(ray.cluster_resources().get("CPU", 8))
    chunks = np.array_split(sources, max(1, min(ncpu * 2, n)))
    acc = np.zeros(n)
    reach = np.zeros(n, dtype=np.int64)
    for a, r in ray.get([_chunk.remote(c) for c in chunks if c.shape[0]]):
        acc += a
        reach += r
    return acc, reach


def closeness_centrality(graph: Graph, *, wasserman_faust: bool = False,
                         execution: str = "auto",
                         local_threshold: int = 20_000) -> pa.Table:
    """centrality(v) = reach(v)/farness(v) (0 when unreached); Wasserman-Faust
    multiplies by reach/(n-1) — MSClosenessCentrality.centrality:153-161."""
    farness, reach = _run(graph, False, execution, local_threshold)
    n = graph.n
    with np.errstate(divide="ignore", invalid="ignore"):
        c = np.where(farness > 0, reach / np.where(farness > 0, farness, 1.0),
                     0.0)
        if wasserman_faust and n > 1:
            c = c * (reach / (n - 1.0))
    return pa.table({"vid": np.arange(n, dtype=np.int64), "centrality": c})


def harmonic_centrality(graph: Graph, *, execution: str = "auto",
                        local_threshold: int = 20_000) -> pa.Table:
    """centrality(v) = Σ_s 1/d(s→v) / (n-1) — HarmonicCentrality.java:90."""
    inv, _ = _run(graph, True, execution, local_threshold)
    n = graph.n
    c = inv / (n - 1.0) if n > 1 else inv
    return pa.table({"vid": np.arange(n, dtype=np.int64), "centrality": c})
