"""All-pairs shortest paths stream — gds.alpha.allShortestPaths.stream.

Reference: alpha/alpha-algo/.../impl/msbfs/MSBFSAllShortestPaths.java
(unweighted: 64-source bit-parallel MSBFS emitting one (source, target,
distance) row per newly-visited pair, depth >= 1 — self-pairs are never
emitted because a source starts visited) and WeightedAllShortestPaths.java
(positive weights: one Dijkstra per source on a thread pool).

Execution shapes:

* unweighted local — 64-source mask sweeps over one CSR, rows decoded from
  the new-visit bitmasks per level (``np.unpackbits``);
* unweighted ``execution="ray"`` — the sharded frontier-exchange MSBFS
  (msbfs_dist._MsbfsShardActor with opt-in pair emission): each vid-range
  actor buffers the (source, local-target, depth) rows its own shard
  discovers and publishes them as one Arrow table; the result is a
  ``ray.data.Dataset`` assembled from those per-shard refs — pair rows never
  transit the driver.  (At 100 TB scale flush each group's rows to
  partitioned parquet instead of actor memory; the buffering is the
  sandbox-size simplification of the same shape.)
* weighted — per-source Dijkstra over the local CSR (the reference's own
  shape, thread pool == driver loop here); emits reached pairs incl.
  distance-0 self-pairs?  No: the reference's WeightedASP emits targets with
  ``distance[target] < inf`` visited AFTER the source pop — self-pairs are
  skipped there too, matched here.
"""

from __future__ import annotations

import heapq
from typing import Optional

import numpy as np
import pyarrow as pa

from ..state.graph import Graph


def _asp_local_unweighted(n, indptr, indices, sources):
    srcs_out, tgts_out, dists_out = [], [], []
    sources = np.asarray(sources, dtype=np.int64)
    for base in range(0, sources.shape[0], 64):
        batch = sources[base:base + 64]
        seen = np.zeros(n, dtype=np.uint64)
        # or.at, not fancy-index |= — a DUPLICATED source would otherwise
        # keep only its last bit lane (the sharded path uses or.at already)
        np.bitwise_or.at(seen, batch,
                         np.uint64(1) << np.arange(batch.shape[0],
                                                   dtype=np.uint64))
        frontier_ids = np.unique(batch)
        frontier = np.zeros(n, dtype=np.uint64)
        frontier[frontier_ids] = seen[frontier_ids]
        d = 0
        while frontier_ids.shape[0]:
            starts = indptr[frontier_ids]
            lens = indptr[frontier_ids + 1] - starts
            total = int(lens.sum())
            if total == 0:
                break
            offs = np.concatenate(([0], np.cumsum(lens)[:-1]))
            g = (np.arange(total, dtype=np.int64)
                 + np.repeat(starts - offs, lens))
            tgt = indices[g]
            msk = np.repeat(frontier[frontier_ids], lens)
            nxt = np.zeros(n, dtype=np.uint64)
            np.bitwise_or.at(nxt, tgt, msk)
            new = nxt & ~seen
            d += 1
            frontier_ids = np.nonzero(new)[0]
            if frontier_ids.shape[0] == 0:
                break
            seen |= new
            frontier = new
            bits = np.unpackbits(new[frontier_ids, None].view(np.uint8),
                                 axis=1, bitorder="little")
            r, s = np.nonzero(bits)
            srcs_out.append(batch[s])
            tgts_out.append(frontier_ids[r])
            dists_out.append(np.full(r.shape[0], d, dtype=np.int64))
    if not srcs_out:
        e = np.array([], dtype=np.int64)
        return e, e, e
    return (np.concatenate(srcs_out), np.concatenate(tgts_out),
            np.concatenate(dists_out))


def _asp_local_weighted(n, indptr, indices, w, sources):
    srcs_out, tgts_out, dists_out = [], [], []
    for s in np.asarray(sources, dtype=np.int64):
        dist = np.full(n, np.inf)
        dist[s] = 0.0
        h = [(0.0, int(s))]
        done = np.zeros(n, dtype=bool)
        while h:
            d, u = heapq.heappop(h)
            if done[u]:
                continue
            done[u] = True
            for e in range(indptr[u], indptr[u + 1]):
                v = int(indices[e])
                nd = d + w[e]
                if nd < dist[v]:
                    dist[v] = nd
                    heapq.heappush(h, (nd, v))
        reached = np.nonzero(np.isfinite(dist))[0]
        reached = reached[reached != s]
        srcs_out.append(np.full(reached.shape[0], s, dtype=np.int64))
        tgts_out.append(reached)
        dists_out.append(dist[reached])
    e = np.array([], dtype=np.int64)
    return (np.concatenate(srcs_out) if srcs_out else e,
            np.concatenate(tgts_out) if tgts_out else e,
            np.concatenate(dists_out) if dists_out else
            np.array([], dtype=np.float64))


def all_shortest_paths(graph: Graph, *, weighted: Optional[bool] = None,
                       sources: Optional[np.ndarray] = None,
                       execution: str = "auto", as_dataset: bool = False,
                       local_threshold: int = 20_000,
                       num_partitions: Optional[int] = None):
    """Stream of (source, target, distance) for every reachable ordered pair
    (source != target).  ``sources`` restricts the source set (default all
    vertices).  Unweighted distances are hop counts (int64 → float64 column
    for parity with the weighted variant)."""
    if weighted is None:
        weighted = graph.is_weighted
    n = graph.n
    if sources is None:
        sources = np.arange(n, dtype=np.int64)
    if execution == "auto":
        execution = "local" if (weighted or n <= local_threshold) else "ray"
    if not weighted and execution == "ray":
        from .msbfs_dist import asp_pairs_sharded
        out = asp_pairs_sharded(graph, sources,
                                num_partitions=num_partitions)
        if out is not None:
            if as_dataset:
                return out
            import ray
            tabs = [t for t in ray.get(out.materialize().to_arrow_refs())
                    if t.num_rows]
            return (pa.concat_tables(tabs) if tabs else
                    pa.table({"source": pa.array([], pa.int64()),
                              "target": pa.array([], pa.int64()),
                              "distance": pa.array([], pa.float64())}))
        # collapsed bounds: fall through to the bit-equal local kernel
    sh = graph.shards(1, "natural")[0]
    if weighted:
        w = sh.weights if sh.weights is not None \
            else np.ones(sh.indices.shape[0])
        if np.any(w < 0):
            raise ValueError("negative edge weights are not supported")
        s, t, d = _asp_local_weighted(n, sh.indptr, sh.indices, w, sources)
        dist = d
    else:
        s, t, d = _asp_local_unweighted(n, sh.indptr, sh.indices, sources)
        dist = d.astype(np.float64)
    table = pa.table({"source": s, "target": t,
                      "distance": np.asarray(dist, dtype=np.float64)})
    if as_dataset:
        import ray.data
        return ray.data.from_arrow(table)
    return table
