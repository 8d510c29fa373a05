"""Partitioned-shard multi-source BFS and Brandes betweenness.

Removes the last whole-graph-per-worker pattern (round-3 VERDICT Wrong #1):
every worker holds ONLY its CSR shard (the out-edges — and for Brandes also
the in-edges — of its own vid range) plus O(nloc) accumulators.  No
``ray.put`` of a full-graph CSR anywhere.

Kernels:

* ``msbfs_accumulate_sharded`` — the bit-parallel 64-source BFS of
  centrality._msbfs_accumulate (ref alpha/alpha-algo/.../msbfs/
  MultiSourceBFS.java, after Then et al. "The More the Merrier"), re-expressed
  as frontier-exchange BSP: per superstep each shard actor expands its local
  frontier, OR-combines visit masks per destination, and ships each receiver
  ONLY its vid-range slice (the sliced-payload exchange of
  pregel.slice_payload).  G 64-source batches advance concurrently
  (``seen``: [nloc, G] uint64) to amortize the exchange; the driver walks
  batch groups sequentially, sizing G to a per-shard memory budget.  Feeds
  closeness + harmonic centrality.

* ``brandes_accumulate_sharded`` — Brandes dependency accumulation
  (ref algo/.../betweenness/BetweennessCentrality.java:43-200) vectorized
  over S concurrent sources (columns): forward level-synchronous sweeps
  exchange sigma contributions along out-edges; backward sweeps push
  (1+delta)/sigma terms along IN-edges (a reverse CSR shard over the SAME
  vid bounds) one level at a time.  A receiver accepts a contribution only
  when its own level matches — the BFS property dist[w] <= dist[v]+1 makes
  that filter exact.

Network shape per superstep: each producer→receiver slice carries only the
receiver's vid range — O(active dsts × G) total bytes, never O(P·n).
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from ..state.graph import REVERSE, build_csr_shard
from .pregel import _resolve_shard, _shard_handles

_POP8 = np.array([bin(i).count("1") for i in range(256)], dtype=np.uint8)


def _popcount_rows(x: np.ndarray) -> np.ndarray:
    """Per-row popcount of a [k, G] uint64 matrix."""
    if x.shape[0] == 0:
        return np.zeros(0, dtype=np.int64)
    return _POP8[x.view(np.uint8)].reshape(x.shape[0], -1).sum(axis=1) \
        .astype(np.int64)


def _combine_or(ids: np.ndarray, masks: np.ndarray):
    """OR-combine [k, G] mask rows per id (ids unsorted)."""
    order = np.argsort(ids, kind="stable")
    ids, masks = ids[order], masks[order]
    runs = np.nonzero(np.concatenate(([True], ids[1:] != ids[:-1])))[0]
    return ids[runs], np.bitwise_or.reduceat(masks, runs, axis=0)


def _combine_sum(ids: np.ndarray, vals: np.ndarray):
    """SUM-combine [k, S] value rows per id (ids unsorted)."""
    order = np.argsort(ids, kind="stable")
    ids, vals = ids[order], vals[order]
    runs = np.nonzero(np.concatenate(([True], ids[1:] != ids[:-1])))[0]
    return ids[runs], np.add.reduceat(vals, runs, axis=0)


def _expand_rows(shard, f_ids: np.ndarray, f_rows: np.ndarray, combine,
                 chunk_edges: int):
    """Expand frontier rows along the shard's CSR, combining per destination.
    Chunked so the [edges, G] gather buffer stays bounded; returns
    (dst_global_ids, combined_rows)."""
    indptr, indices = shard.indptr, shard.indices
    lens_all = indptr[f_ids + 1] - indptr[f_ids]
    outs_t, outs_m = [], []
    cum = np.cumsum(lens_all)
    pos = 0
    nf = f_ids.shape[0]
    while pos < nf:
        base = cum[pos - 1] if pos else 0
        end = int(np.searchsorted(cum, base + chunk_edges)) + 1
        end = min(max(end, pos + 1), nf)
        ids = f_ids[pos:end]
        rows = f_rows[pos:end]
        st = indptr[ids]
        ln = indptr[ids + 1] - st
        tt = int(ln.sum())
        if tt:
            offs = np.concatenate(([0], np.cumsum(ln)[:-1]))
            gather = (np.arange(tt, dtype=np.int64)
                      + np.repeat(st - offs, ln))
            tgt = indices[gather].astype(np.int64)
            vals = np.repeat(rows, ln, axis=0)
            u, c = combine(tgt, vals)
            outs_t.append(u)
            outs_m.append(c)
        pos = end
    if not outs_t:
        return (np.empty(0, dtype=np.int64),
                np.empty((0, f_rows.shape[1]), dtype=f_rows.dtype))
    tgt = np.concatenate(outs_t)
    masks = np.concatenate(outs_m, axis=0)
    if len(outs_t) > 1:
        tgt, masks = combine(tgt, masks)
    return tgt, masks


def _slice_by_bounds(ids: np.ndarray, rows: np.ndarray, bounds: np.ndarray):
    """Cut (sorted global ids, rows) into per-receiver (local ids, rows)."""
    P = len(bounds) - 1
    cuts = np.searchsorted(ids, bounds)
    return tuple(
        (ids[cuts[q]:cuts[q + 1]] - int(bounds[q]),
         rows[cuts[q]:cuts[q + 1]])
        if cuts[q + 1] > cuts[q] else None
        for q in range(P))


def _merge_slices(incoming, G: int, dtype, combine):
    """Merge the per-producer slices addressed to this shard."""
    ids_l, rows_l = [], []
    for p in incoming:
        if p is None:
            continue
        ids_l.append(p[0])
        rows_l.append(p[1])
    if not ids_l:
        return (np.empty(0, dtype=np.int64),
                np.empty((0, G), dtype=dtype))
    return combine(np.concatenate(ids_l), np.concatenate(rows_l, axis=0))


class _MsbfsShardActor:
    """One actor per vid-range partition: out-CSR shard + [nloc, G] bitmask
    state + O(nloc) accumulators.  Never sees another partition's topology."""

    def __init__(self, shard_ref, bounds, harmonic: bool,
                 emit_pairs: bool = False):
        self.shard = _resolve_shard(shard_ref)
        self.bounds = np.asarray(bounds, dtype=np.int64)
        self.P = len(self.bounds) - 1
        self.harmonic = harmonic
        nloc = self.shard.num_nodes
        self.acc = np.zeros(nloc)
        self.reach = np.zeros(nloc, dtype=np.int64)
        self.seen = None
        self.frontier_ids = None
        self.frontier_rows = None
        self.G = 1
        self.d = 0
        # all-shortest-paths mode: buffer (source, local target, depth) rows
        # this shard discovers (allpaths.all_shortest_paths)
        self.emit_pairs = emit_pairs
        self.grp_sources = None
        self.pair_src, self.pair_tgt, self.pair_d = [], [], []

    def start_group(self, sources: np.ndarray, G: int):
        """Bit layout: source i of the group -> column i//64, bit i%64."""
        sh = self.shard
        self.G = G
        self.seen = np.zeros((sh.num_nodes, G), dtype=np.uint64)
        self.d = 0
        if self.emit_pairs:
            self.grp_sources = np.asarray(sources, dtype=np.int64)
        idx = np.nonzero((sources >= sh.lo) & (sources < sh.hi))[0]
        lids = sources[idx] - sh.lo
        cols = idx // 64
        bits = (np.uint64(1) << (idx % 64).astype(np.uint64))
        np.bitwise_or.at(self.seen, (lids, cols), bits)
        self.frontier_ids = np.unique(lids)
        self.frontier_rows = self.seen[self.frontier_ids].copy()

    def _chunk_edges(self) -> int:
        return max(1024, 4_000_000 // max(1, self.G))  # ~32 MB uint64 buffer

    def expand(self):
        """Expand the local frontier; returns P per-receiver slices."""
        if self.frontier_ids is None or self.frontier_ids.shape[0] == 0:
            return tuple([None] * self.P)
        tgt, masks = _expand_rows(self.shard, self.frontier_ids,
                                  self.frontier_rows, _combine_or,
                                  self._chunk_edges())
        return _slice_by_bounds(tgt, masks, self.bounds)

    def step(self, *incoming):
        """Absorb incoming OR-masks, update acc/reach at the new depth, form
        the new frontier and expand it.  Returns (n_new_bits, *P slices)."""
        ids, ms = _merge_slices(incoming, self.G, np.uint64, _combine_or)
        n_new = 0
        self.d += 1
        if ids.shape[0]:
            new = ms & ~self.seen[ids]
            nz = (new != 0).any(axis=1)
            ids, new = ids[nz], new[nz]
            if ids.shape[0]:
                cnt = _popcount_rows(new)
                self.acc[ids] += cnt * ((1.0 / self.d) if self.harmonic
                                        else float(self.d))
                self.reach[ids] += cnt
                self.seen[ids] |= new
                n_new = int(cnt.sum())
                if self.emit_pairs:
                    # decode the new-visit bits: little-endian uint64 words →
                    # bit i of column c is group source c*64+i
                    bits = np.unpackbits(new.view(np.uint8), axis=1,
                                         bitorder="little")
                    r, s = np.nonzero(bits)
                    self.pair_src.append(self.grp_sources[s])
                    self.pair_tgt.append(ids[r] + self.shard.lo)
                    self.pair_d.append(
                        np.full(r.shape[0], self.d, dtype=np.int64))
        else:
            new = np.empty((0, self.G), dtype=np.uint64)
        self.frontier_ids = ids
        self.frontier_rows = new
        return (n_new, *self.expand())

    def finish(self):
        return int(self.shard.lo), self.acc, self.reach

    def pairs_table(self):
        """One Arrow table of this shard's buffered (source, target,
        distance) rows — published to the object store by the actor call, so
        pair rows never transit the driver."""
        import pyarrow as pa
        if not self.pair_src:
            return pa.table({"source": pa.array([], pa.int64()),
                             "target": pa.array([], pa.int64()),
                             "distance": pa.array([], pa.float64())})
        return pa.table({
            "source": np.concatenate(self.pair_src),
            "target": np.concatenate(self.pair_tgt),
            "distance": np.concatenate(self.pair_d).astype(np.float64)})


def _centrality_slice(lo: int, acc: np.ndarray, reach, spec: dict):
    """One shard's (vid, centrality) table from its accumulator slice — the
    per-vid formulas of closeness (farness→centrality + Wasserman-Faust),
    harmonic (1/(n-1) scaling) and betweenness (undirected divisor), applied
    WHERE THE SLICE LIVES so n-sized result arrays never transit the driver
    (the COVERAGE "known gaps" item for table-returning centralities)."""
    import pyarrow as pa

    kind, n = spec["kind"], spec["n"]
    vid = np.arange(lo, lo + acc.shape[0], dtype=np.int64)
    if kind == "closeness":
        with np.errstate(divide="ignore", invalid="ignore"):
            c = np.where(acc > 0, reach / np.where(acc > 0, acc, 1.0), 0.0)
            if spec.get("wasserman_faust") and n > 1:
                c = c * (reach / (n - 1.0))
    elif kind == "harmonic":
        c = acc / (n - 1.0) if n > 1 else acc.astype(np.float64)
    elif kind == "betweenness":
        c = acc / spec.get("divisor", 1.0)
    else:
        raise ValueError(f"unknown centrality kind {kind!r}")
    return pa.table({"vid": vid, "centrality": c})


_SLICE_TABLE_FN = None


def _slice_table_fn():
    global _SLICE_TABLE_FN
    if _SLICE_TABLE_FN is None:
        import ray

        @ray.remote(num_cpus=0)
        def _slice_table(fin, spec: dict):
            # fin: (lo, acc, reach) from _MsbfsShardActor.finish or
            # (lo, bc) from _BrandesShardActor.finish
            if len(fin) == 3:
                lo, acc, reach = fin
            else:
                (lo, acc), reach = fin, None
            return _centrality_slice(int(lo), acc, reach, spec)

        _SLICE_TABLE_FN = _slice_table
    return _SLICE_TABLE_FN


def _slice_tables_dataset(workers, spec: dict):
    """Per-shard finish → per-shard (vid, centrality) tables → Dataset.
    Caller kills the workers AFTER this returns (ray.wait pins the tables
    in plasma before the producing actors die)."""
    import ray
    import ray.data

    fn = _slice_table_fn()
    refs = [fn.remote(w.finish.remote(), spec) for w in workers]
    ray.wait(refs, num_returns=len(refs))
    return ray.data.from_arrow_refs(refs)


def _actor_cpus(nparts: int) -> float:
    """Fractional CPUs when partitions exceed the cluster (explicit P on a
    small machine): nparts actors each demanding one full CPU would leave
    some pending forever and deadlock the frontier exchange — the same guard
    hits.py uses."""
    import ray
    ncpu = ray.cluster_resources().get("CPU", nparts) or nparts
    return 1 if ncpu >= nparts else max(0.1, ncpu / nparts / 2)


def asp_pairs_sharded(graph, sources, num_partitions: Optional[int] = None,
                      group_batches: Optional[int] = None):
    """Distributed all-pairs shortest paths stream: the MSBFS frontier
    exchange with per-shard pair emission; returns a ray.data.Dataset of
    (source, target, distance) built from per-shard table refs, or None when
    the partition bounds collapse (caller runs the local kernel)."""
    import ray
    import ray.data

    n = graph.n
    if num_partitions is None:
        ncpu = int(ray.cluster_resources().get("CPU", 8)) \
            if ray.is_initialized() else 8
        num_partitions = max(2, min(ncpu, graph.num_edges // 250_000 + 2))
    P = max(2, num_partitions)
    bounds = graph.bounds(P, "natural")
    handles = _shard_handles(graph, P, "natural")
    nparts = len(bounds) - 1
    sources = np.asarray(sources, dtype=np.int64)
    if nparts < 2:
        return None
    Worker = ray.remote(num_cpus=_actor_cpus(nparts))(_MsbfsShardActor)
    workers = [Worker.remote(handles[p], bounds, False, True)
               for p in range(nparts)]
    max_nloc = int(np.max(np.diff(bounds))) or 1
    if group_batches is None:
        group_batches = int(max(1, min(32, (64 << 20) // (16 * max_nloc))))
    gsz = group_batches * 64
    try:
        for base in range(0, sources.shape[0], gsz):
            grp = sources[base:base + gsz]
            G = -(-grp.shape[0] // 64)
            ray.get([w.start_group.remote(grp, G) for w in workers])
            outbox = [w.expand.options(num_returns=nparts).remote()
                      for w in workers]
            while True:
                res = [workers[q].step.options(num_returns=1 + nparts).remote(
                    *[outbox[p][q] for p in range(nparts)])
                    for q in range(nparts)]
                outbox = [r[1:] for r in res]
                if sum(ray.get([r[0] for r in res])) == 0:
                    break
        refs = [w.pairs_table.remote() for w in workers]
        ray.wait(refs, num_returns=len(refs))  # tables exist before kill
        return ray.data.from_arrow_refs(refs)
    finally:
        for w in workers:
            ray.kill(w)


def msbfs_accumulate_sharded(graph, sources, harmonic: bool,
                             num_partitions: Optional[int] = None,
                             group_batches: Optional[int] = None,
                             finalize: Optional[dict] = None):
    """Distributed MSBFS accumulation; returns (acc, reach) like
    centrality._msbfs_accumulate.  Workers hold only their own shard.

    ``finalize`` (a _centrality_slice spec): return a ray.data.Dataset of
    per-shard (vid, centrality) tables instead — results stay distributed.
    On collapsed bounds the (acc, reach) tuple is returned regardless and
    the caller wraps it (the tiny-graph case)."""
    import ray

    n = graph.n
    if num_partitions is None:
        ncpu = int(ray.cluster_resources().get("CPU", 8)) \
            if ray.is_initialized() else 8
        num_partitions = max(2, min(ncpu, graph.num_edges // 250_000 + 2))
    P = max(2, num_partitions)
    bounds = graph.bounds(P, "natural")
    handles = _shard_handles(graph, P, "natural")
    nparts = len(bounds) - 1
    sources = np.asarray(sources, dtype=np.int64)
    if nparts < 2:
        # bounds collapsed (tiny/degenerate graph): num_returns=1 would make
        # expand/step return a bare ObjectRef and outbox[p][q] indexing would
        # TypeError — run the bit-equal local kernel on the single shard
        from .centrality import _msbfs_accumulate
        sh = _resolve_shard(handles[0])
        return _msbfs_accumulate(n, sh.indptr, sh.indices, sources, harmonic)
    Worker = ray.remote(num_cpus=_actor_cpus(nparts))(_MsbfsShardActor)
    workers = [Worker.remote(handles[p], bounds, harmonic)
               for p in range(nparts)]
    max_nloc = int(np.max(np.diff(bounds))) or 1
    if group_batches is None:
        # [nloc, G] uint64 seen + frontier ≈ 16·nloc·G bytes ≤ ~64 MB/actor
        group_batches = int(max(1, min(32, (64 << 20) // (16 * max_nloc))))
    gsz = group_batches * 64
    try:
        for base in range(0, sources.shape[0], gsz):
            grp = sources[base:base + gsz]
            G = -(-grp.shape[0] // 64)
            ray.get([w.start_group.remote(grp, G) for w in workers])
            outbox = [w.expand.options(num_returns=nparts).remote()
                      for w in workers]
            while True:
                res = [workers[q].step.options(num_returns=1 + nparts).remote(
                    *[outbox[p][q] for p in range(nparts)])
                    for q in range(nparts)]
                outbox = [r[1:] for r in res]
                if sum(ray.get([r[0] for r in res])) == 0:
                    break
        if finalize is not None:
            return _slice_tables_dataset(workers, finalize)
        acc = np.zeros(n)
        reach = np.zeros(n, dtype=np.int64)
        for lo, a, r in ray.get([w.finish.remote() for w in workers]):
            acc[lo:lo + a.shape[0]] = a
            reach[lo:lo + r.shape[0]] = r
    finally:
        for w in workers:  # also on exception: don't leak CSR-pinning actors
            ray.kill(w)
    return acc, reach


# --------------------------------------------------------------------------------
# distributed Brandes (betweenness)
# --------------------------------------------------------------------------------

class _BrandesShardActor:
    """Forward+backward Brandes over S concurrent source columns.  Holds the
    out-CSR AND in-CSR of its own vid range (same bounds) — per-actor memory
    is O(shard edges + nloc·S), never the whole graph."""

    def __init__(self, fwd_ref, rev_ref, bounds):
        self.fwd = _resolve_shard(fwd_ref)
        self.rev = _resolve_shard(rev_ref)
        self.bounds = np.asarray(bounds, dtype=np.int64)
        self.P = len(self.bounds) - 1
        nloc = self.fwd.num_nodes
        self.bc = np.zeros(nloc)
        self.S = 1
        self.dist = None
        self.sigma = None
        self.delta = None
        self.src_lids = None
        self.src_cols = None
        self.d = 0

    def start_group(self, sources: np.ndarray):
        nloc = self.fwd.num_nodes
        S = sources.shape[0]
        self.S = S
        self.dist = np.full((nloc, S), -1, dtype=np.int32)
        self.sigma = np.zeros((nloc, S))
        self.delta = np.zeros((nloc, S))
        self.d = 0
        idx = np.nonzero((sources >= self.fwd.lo) & (sources < self.fwd.hi))[0]
        lids = sources[idx] - self.fwd.lo
        self.src_lids, self.src_cols = lids, idx
        self.dist[lids, idx] = 0
        self.sigma[lids, idx] = 1.0

    def _frontier(self, level: int):
        """Local vids active at ``level`` in any column, plus masked sigma."""
        at = self.dist == level
        ids = np.nonzero(at.any(axis=1))[0]
        return ids, at

    def fwd_expand(self):
        """Push sigma along out-edges from the level-d frontier."""
        ids, at = self._frontier(self.d)
        if ids.shape[0] == 0:
            return tuple([None] * self.P)
        rows = np.where(at[ids], self.sigma[ids], 0.0)
        tgt, sums = _expand_rows(self.fwd, ids, rows, _combine_sum,
                                 max(1024, 4_000_000 // max(1, self.S)))
        return _slice_by_bounds(tgt, sums, self.bounds)

    def fwd_step(self, *incoming):
        """Absorb level-(d+1) sigma contributions; returns (n_new, *slices)."""
        ids, sums = _merge_slices(incoming, self.S, np.float64, _combine_sum)
        self.d += 1
        n_new = 0
        if ids.shape[0]:
            undisc = (self.dist[ids] == -1) & (sums > 0)
            if undisc.any():
                self.dist[ids] = np.where(undisc, self.d, self.dist[ids])
                self.sigma[ids] += np.where(undisc, sums, 0.0)
                n_new = int(undisc.sum())
        return (n_new, *self.fwd_expand())

    def bwd_expand(self, level: int):
        """Push (1+delta)/sigma terms from level+1 vertices along IN-edges."""
        ids, at = self._frontier(level + 1)
        if ids.shape[0] == 0:
            return tuple([None] * self.P)
        with np.errstate(divide="ignore", invalid="ignore"):
            term = np.where(at[ids] & (self.sigma[ids] > 0),
                            (1.0 + self.delta[ids]) / self.sigma[ids], 0.0)
        tgt, sums = _expand_rows(self.rev, ids, term, _combine_sum,
                                 max(1024, 4_000_000 // max(1, self.S)))
        return _slice_by_bounds(tgt, sums, self.bounds)

    def bwd_absorb(self, level: int, *incoming):
        """delta[v] += sigma[v]·Σ_w terms, only for v at ``level`` (the exact
        shortest-path-DAG filter: dist[v] == dist[w] - 1)."""
        ids, sums = _merge_slices(incoming, self.S, np.float64, _combine_sum)
        if ids.shape[0]:
            on_lvl = self.dist[ids] == level
            self.delta[ids] += np.where(on_lvl, self.sigma[ids] * sums, 0.0)
        return 0

    def end_group(self):
        """Fold this group's dependencies into bc (own-source delta excluded,
        ref BetweennessCentrality.java delta[source] = 0)."""
        if self.src_lids is not None and self.src_lids.shape[0]:
            self.delta[self.src_lids, self.src_cols] = 0.0
        self.bc += self.delta.sum(axis=1)
        return 0

    def finish(self):
        return int(self.fwd.lo), self.bc


def brandes_accumulate_sharded(graph, sources,
                               num_partitions: Optional[int] = None,
                               group_size: Optional[int] = None,
                               finalize: Optional[dict] = None):
    """Distributed Brandes: returns the betweenness vector.  Requires an
    in-memory Graph (builds forward + reverse CSR shards over the same vid
    bounds).  ``finalize`` (a _centrality_slice spec): return a Dataset of
    per-shard (vid, centrality) tables instead; on collapsed bounds the
    plain vector is returned regardless and the caller wraps it."""
    import ray

    n = graph.n
    if num_partitions is None:
        ncpu = int(ray.cluster_resources().get("CPU", 8)) \
            if ray.is_initialized() else 8
        num_partitions = max(2, min(ncpu, graph.num_edges // 250_000 + 2))
    P = max(2, num_partitions)
    bounds = graph.bounds(P, "natural")
    nparts = len(bounds) - 1
    sources = np.asarray(sources, dtype=np.int64)
    if nparts < 2:
        # collapsed bounds: same num_returns=1 hazard as msbfs — local Brandes
        from .betweenness import _brandes_source
        sh = _resolve_shard(_shard_handles(graph, 1, "natural")[0])
        bc = np.zeros(n)
        for s in sources:
            bc += _brandes_source(n, sh.indptr, sh.indices, int(s))
        return bc
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
        # loads its own reverse slice from the layout)
        rev_handles = [graph.shard_spec(p, bounds, "reverse")
                       for p in range(nparts)]
    Worker = ray.remote(num_cpus=_actor_cpus(nparts))(_BrandesShardActor)
    workers = [Worker.remote(fwd_handles[p], rev_handles[p], bounds)
               for p in range(nparts)]
    max_nloc = int(np.max(np.diff(bounds))) or 1
    if group_size is None:
        # dist+sigma+delta ≈ 20·nloc·S bytes ≤ ~64 MB/actor
        group_size = int(max(8, min(128, (64 << 20) // (20 * max_nloc))))
    try:
        for base in range(0, sources.shape[0], group_size):
            grp = sources[base:base + group_size]
            ray.get([w.start_group.remote(grp) for w in workers])
            outbox = [w.fwd_expand.options(num_returns=nparts).remote()
                      for w in workers]
            depth = 0
            while True:
                res = [workers[q].fwd_step.options(
                    num_returns=1 + nparts).remote(
                    *[outbox[p][q] for p in range(nparts)])
                    for q in range(nparts)]
                outbox = [r[1:] for r in res]
                if sum(ray.get([r[0] for r in res])) == 0:
                    break
                depth += 1
            for lvl in range(depth - 1, -1, -1):
                outs = [w.bwd_expand.options(num_returns=nparts).remote(lvl)
                        for w in workers]
                ray.get([workers[q].bwd_absorb.remote(
                    lvl, *[outs[p][q] for p in range(nparts)])
                    for q in range(nparts)])
            ray.get([w.end_group.remote() for w in workers])
        if finalize is not None:
            return _slice_tables_dataset(workers, finalize)
        bc = np.zeros(n)
        for lo, part in ray.get([w.finish.remote() for w in workers]):
            bc[lo:lo + part.shape[0]] = part
    finally:
        for w in workers:  # also on exception: don't leak CSR-pinning actors
            ray.kill(w)
    return bc
