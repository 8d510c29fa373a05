"""HITS (Hyperlink-Induced Topic Search) — hub and authority scores.

Reference: alpha/alpha-proc/src/main/java/org/neo4j/gds/pregel/Hits.java
(4k+1-superstep Pregel state machine) and its oracle HitsTest.java
PseudoCodeHits: starting from auth = hub = 1, each of ``hits_iterations``
rounds computes

    auth(v) = sum of hub(u) over in-edges u->v,   then L2-normalizes auth;
    hub(u)  = sum of auth(v) over out-edges u->v, then L2-normalizes hub.

(The reference's SEND_IDS/RECEIVE_IDS prologue makes the first auth update
equal the in-degree — identical to one pseudo-code round with hub = 1.)

Execution shapes:

* ``local`` — two one-shard CSRs (natural + reverse), each half-round one
  vectorized repeat + bincount; exact PseudoCodeHits trajectory.
* ``ray`` — vid-range shard actors holding the forward AND reverse CSR of
  their own range (the Brandes shape, msbfs_dist._BrandesShardActor — no
  whole-graph broadcast).  Each half-round: every actor scatters its local
  vector along its edges, slices the per-destination partial sums by the
  shared vid bounds, and ships each receiver only its slice; the driver
  reduces one scalar (the squared norm) per half-round and folds the
  normalization into the next scatter — 2 exchanges + 2 scalar reduces per
  iteration, payload O(touched vids) per producer-receiver pair.

Directed-only, like the reference ("will only work with directed graphs",
Hits.java:112).  Zero-norm guard: a graph with no edges keeps all-zero
vectors where the reference's division would produce NaN.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pyarrow as pa

from ..state.graph import REVERSE, Graph, build_csr_shard
from .msbfs_dist import (_combine_sum, _expand_rows, _merge_slices,
                         _slice_by_bounds)
from .pregel import _resolve_shard, _shard_handles


def _hits_local(n: int, fwd_indptr, fwd_indices, rev_indptr, rev_indices,
                k: int):
    """PseudoCodeHits (HitsTest.java:120-163), vectorized."""
    auth = np.ones(n)
    hub = np.ones(n)
    fwd_deg = np.diff(fwd_indptr)
    rev_deg = np.diff(rev_indptr)
    for _ in range(k):
        auth = np.bincount(fwd_indices, weights=np.repeat(hub, fwd_deg),
                           minlength=n).astype(np.float64)
        norm = np.sqrt((auth * auth).sum())
        auth /= norm if norm > 0 else 1.0
        hub = np.bincount(rev_indices, weights=np.repeat(auth, rev_deg),
                          minlength=n).astype(np.float64)
        norm = np.sqrt((hub * hub).sum())
        hub /= norm if norm > 0 else 1.0
    return auth, hub


class _HitsShardActor:
    """Holds the out-CSR and in-CSR of one vid range plus two O(nloc)
    vectors.  ``scatter`` folds in the pending normalization of the vector
    it is about to send (driver passes the global norm scalar)."""

    def __init__(self, fwd_ref, rev_ref, bounds):
        self.fwd = _resolve_shard(fwd_ref)
        self.rev = _resolve_shard(rev_ref)
        self.bounds = np.asarray(bounds, dtype=np.int64)
        self.P = len(self.bounds) - 1
        nloc = self.fwd.num_nodes
        self.auth = np.ones(nloc)
        self.hub = np.ones(nloc)

    def scatter(self, phase: str, pending_norm: float):
        if phase == "auth":   # compute auth next: send hub along out-edges
            self.hub /= pending_norm
            shard, vals = self.fwd, self.hub
        else:                 # compute hub next: send auth along in-edges
            self.auth /= pending_norm
            shard, vals = self.rev, self.auth
        ids = np.nonzero(np.diff(shard.indptr) > 0)[0]
        if ids.shape[0] == 0:
            return tuple([None] * self.P)
        tgt, sums = _expand_rows(shard, ids, vals[ids][:, None],
                                 _combine_sum, 4_000_000)
        return _slice_by_bounds(tgt, sums, self.bounds)

    def absorb(self, phase: str, *incoming):
        """Install the summed contributions; returns the local squared norm."""
        ids, sums = _merge_slices(incoming, 1, np.float64, _combine_sum)
        vec = np.zeros(self.fwd.num_nodes)
        if ids.shape[0]:
            vec[ids] = sums[:, 0]
        if phase == "auth":
            self.auth = vec
        else:
            self.hub = vec
        return float((vec * vec).sum())

    def normalize(self, phase: str, norm: float):
        if phase == "auth":
            self.auth /= norm
        else:
            self.hub /= norm
        return 0

    def finish(self):
        return int(self.fwd.lo), self.auth, self.hub


def _hits_sharded(graph: Graph, k: int, num_partitions: Optional[int]):
    import ray

    n = graph.n
    if num_partitions is None:
        ncpu = int(ray.cluster_resources().get("CPU", 8)) \
            if ray.is_initialized() else 8
        num_partitions = max(2, min(ncpu, graph.num_edges // 250_000 + 2))
    P = max(2, num_partitions)
    bounds = graph.bounds(P, "natural")
    nparts = len(bounds) - 1
    if nparts < 2:
        return None  # collapsed bounds: num_returns=1 hazard — caller local
    fwd_handles = _shard_handles(graph, P, "natural")
    # reverse CSR over the SAME bounds (graph.shards would re-balance them)
    if hasattr(graph, "_oriented_sorted"):
        s, d, _ = graph._oriented_sorted(REVERSE)
        rev_handles = []
        for p in range(nparts):
            lo, hi = int(bounds[p]), int(bounds[p + 1])
            a, b = np.searchsorted(s, [lo, hi])
            rev_handles.append(ray.put(build_csr_shard(lo, hi, s[a:b], d[a:b],
                                                       None, n_total=n)))
    else:
        # parquet-backed handle: reverse-layout ShardSpecs over the same
        # natural bounds (vid ranges are orientation-agnostic; each actor
        # loads its own reverse slice from the layout — no driver edges)
        rev_handles = [graph.shard_spec(p, bounds, REVERSE)
                       for p in range(nparts)]
    # fractional CPUs when partitions exceed the cluster (small-graph tests
    # at explicit P): nparts actors each demanding a full CPU would deadlock
    ncpu_avail = ray.cluster_resources().get("CPU", nparts) or nparts
    cpus_per = 1 if ncpu_avail >= nparts else max(0.1, ncpu_avail / nparts / 2)
    Worker = ray.remote(num_cpus=cpus_per)(_HitsShardActor)
    workers = [Worker.remote(fwd_handles[p], rev_handles[p], bounds)
               for p in range(nparts)]
    try:
        pending = 1.0  # hub starts at 1 un-normalized (pseudo-code round 1)
        for _ in range(k):
            for phase in ("auth", "hub"):
                outbox = [w.scatter.options(num_returns=nparts)
                          .remote(phase, pending) for w in workers]
                sq = ray.get([workers[q].absorb.remote(
                    phase, *[outbox[p][q] for p in range(nparts)])
                    for q in range(nparts)])
                norm = float(np.sqrt(sum(sq)))
                pending = norm if norm > 0 else 1.0
        ray.get([w.normalize.remote("hub", pending) for w in workers])
        parts = ray.get([w.finish.remote() for w in workers])
    finally:
        for w in workers:
            ray.kill(w)
    auth = np.zeros(n)
    hub = np.zeros(n)
    for lo, a, h in parts:
        auth[lo:lo + a.shape[0]] = a
        hub[lo:lo + h.shape[0]] = h
    return auth, hub


def hits(graph: Graph, hits_iterations: int = 20, *, execution: str = "auto",
         num_partitions: Optional[int] = None,
         local_threshold: int = 200_000) -> pa.Table:
    """Returns (vid, auth, hub) after ``hits_iterations`` rounds —
    trajectory-exact vs the reference's PseudoCodeHits oracle (and therefore
    vs the 4k+1-superstep Pregel Hits, which HitsTest pins to it)."""
    n = graph.n
    if execution == "auto":
        execution = "local" if graph.num_edges <= local_threshold else "ray"
    out = None
    if execution == "ray":
        out = _hits_sharded(graph, hits_iterations, num_partitions)
    if out is None:  # local, or collapsed-bounds fallback
        fwd = graph.shards(1, "natural")[0]
        rev = graph.shards(1, "reverse")[0]
        out = _hits_local(n, fwd.indptr, fwd.indices, rev.indptr,
                          rev.indices, hits_iterations)
    auth, hub = out
    return pa.table({"vid": np.arange(n, dtype=np.int64),
                     "auth": auth, "hub": hub})
