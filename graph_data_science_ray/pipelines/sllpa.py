"""Speaker-Listener Label Propagation (SLLPA) — overlapping communities.

Reference: alpha/alpha-proc/src/main/java/org/neo4j/gds/pregel/SpeakerListenerLPA.java
(@PregelProcedure ``gds.alpha.sllpa``), fixtures in SpeakerListenerLPATest.java.

Per-node state is a label history of length ``maxIterations``, initialised to
the node's own id (SpeakerListenerLPA.java:70-75).  Each superstep:

  * superstep 0 — ``labels[0] = nodeId``; send own id to out-neighbors (:82-85);
  * supersteps 1..maxIterations-2 — LISTEN: majority vote over the incoming
    messages (max frequency, exact tie → smaller label, :95-115), stored at
    ``labels[superstep]``; then SPEAK: to each out-neighbor independently send
    ``labels[rng.nextInt(superstep + 1)]`` (:117-124);
  * final superstep — listen, then PRUNE: keep the labels whose relative
    frequency in the history strictly exceeds ``minAssociationStrength``
    (:127-147).  The kept label set is the node's overlapping community ids.

Two deterministic randomness schedules are provided:

  * ``java_compat=True`` — bit-exact ``java.util.Random(seed)`` (the public
    48-bit LCG) consumed in the reference's concurrency-1 order (ascending
    node sweep, ascending adjacency) under AsyncQueueMessenger visibility
    (a message is seen at its target's NEXT compute, possibly in the same
    superstep — AsyncQueueMessenger.java).  Reproduces the reference test
    fixtures exactly; sequential by construction (parity path, small graphs).
  * default — counter-based splitmix64 over ``(seed, superstep, global edge
    index)`` with synchronous message visibility (superstep s listens to
    superstep s-1's sends): partition-count invariant, hence distributable —
    ``execution="ray"`` runs the identical fixpoint over vid-range CSR shard
    actors and is bit-equal to the local kernel at any partition count.  A
    synchronous schedule is one of the valid SLPA update orders (Xie,
    Szymanski & Liu, "SLPA: Uncovering Overlapping Communities in Social
    Networks via A Speaker-listener Interaction Dynamic Process", 2011); the
    reference's own asynchronous schedule is thread-nondeterministic.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pyarrow as pa

from .node2vec_sharded import _u01

_RAY_EDGE_THRESHOLD = 2_000_000


# --------------------------------------------------------------------------------
# java.util.Random — the public 48-bit LCG (Java SE spec, java.util.Random docs)
# --------------------------------------------------------------------------------

class JavaRandom:
    """Bit-exact java.util.Random for fixture parity (nextInt(bound) only)."""

    _MULT = 0x5DEECE66D
    _ADD = 0xB
    _MASK = (1 << 48) - 1

    def __init__(self, seed: int):
        self.seed = (seed ^ self._MULT) & self._MASK

    def _next(self, bits: int) -> int:
        self.seed = (self.seed * self._MULT + self._ADD) & self._MASK
        return self.seed >> (48 - bits)

    def next_int(self, bound: int) -> int:
        if bound <= 0:
            raise ValueError("bound must be positive")
        if bound & (bound - 1) == 0:  # power of two
            return (bound * self._next(31)) >> 31
        while True:
            bits = self._next(31)
            val = bits % bound
            # Java retries while the 32-bit int expression overflows negative
            if bits - val + (bound - 1) < (1 << 31):
                return val


# --------------------------------------------------------------------------------
# shared vote / prune kernels
# --------------------------------------------------------------------------------

def _majority(msg_dst: np.ndarray, msg_label: np.ndarray):
    """Per-destination majority vote over raw messages: max frequency, tie →
    smaller label — order-insensitive, like the reference's listen() (tie
    handling at SpeakerListenerLPA.java:104-110 resolves to the smallest
    label for any message order).  Unit-count form of
    :func:`_majority_from_counts` so the local and sharded paths share one
    tie-break implementation."""
    return _majority_from_counts(
        msg_dst, msg_label, np.ones(msg_dst.shape[0], dtype=np.int64))


def _combine_counts(dst: np.ndarray, label: np.ndarray, cnt: np.ndarray):
    """Merge (dst, label) → summed count triples (pre-combined exchanges)."""
    if dst.shape[0] == 0:
        return dst, label, cnt
    order = np.lexsort((label, dst))
    d, l, c = dst[order], label[order], cnt[order]
    new = np.empty(d.shape[0], dtype=bool)
    new[0] = True
    new[1:] = (d[1:] != d[:-1]) | (l[1:] != l[:-1])
    starts = np.nonzero(new)[0]
    return d[starts], l[starts], np.add.reduceat(c, starts)


def _majority_from_counts(dst: np.ndarray, label: np.ndarray, cnt: np.ndarray):
    dst, label, cnt = _combine_counts(dst, label, cnt)
    if dst.shape[0] == 0:
        e = np.empty(0, dtype=np.int64)
        return e, e
    pick = np.lexsort((label, -cnt, dst))
    dp, lp = dst[pick], label[pick]
    first = np.empty(dp.shape[0], dtype=bool)
    first[0] = True
    first[1:] = dp[1:] != dp[:-1]
    return dp[first], lp[first]


def _prune(labels: np.ndarray, strength: float):
    """Per-row kept-label lists: frequency/T strictly > strength
    (SpeakerListenerLPA.java:133-141).  Returns (offsets, values) of a
    list<int64> column, kept labels ascending within each row."""
    n, T = labels.shape
    ls = np.sort(labels, axis=1)
    new = np.ones((n, T), dtype=bool)
    new[:, 1:] = ls[:, 1:] != ls[:, :-1]
    flat = ls.ravel()
    newf = new.ravel()
    starts = np.nonzero(newf)[0]
    lens = np.diff(np.append(starts, flat.shape[0]))
    keep = lens.astype(np.float64) / T > strength
    kept_vals = flat[starts[keep]]
    rows = starts[keep] // T
    counts = np.bincount(rows, minlength=n)
    offsets = np.concatenate(([0], np.cumsum(counts))).astype(np.int32)
    return offsets, kept_vals


def _result_table(vids: np.ndarray, offsets: np.ndarray, kept: np.ndarray) -> pa.Table:
    lst = pa.ListArray.from_arrays(pa.array(offsets, type=pa.int32()),
                                   pa.array(kept, type=pa.int64()))
    return pa.table({"vid": pa.array(vids, type=pa.int64()), "community_ids": lst})


# --------------------------------------------------------------------------------
# java_compat kernel — sequential, async queue visibility, exact fixtures
# --------------------------------------------------------------------------------

def _sllpa_java(graph, T: int, strength: float, seed: int) -> pa.Table:
    n = graph.n
    src, dst = graph.src, graph.dst  # sorted by (src, dst) — adjacency ascending
    indptr = np.searchsorted(src, np.arange(n + 1))
    rng = JavaRandom(seed)
    labels = np.repeat(np.arange(n, dtype=np.int64)[:, None], T, axis=1)
    queues: list = [[] for _ in range(n)]
    for s in range(T):
        for v in range(n):
            if s == 0:
                # the initial compute never reads its iterator, and the async
                # queue pops LAZILY (PrimitiveAsyncDoubleQueues.Iterator:157-169)
                # — superstep-0 messages stay queued until the s=1 listen
                for w in dst[indptr[v]:indptr[v + 1]]:
                    queues[w].append(v)
                continue
            msgs = queues[v]
            queues[v] = []  # listen() iterates (pops) every queued message
            if msgs:
                counts: dict = {}
                win, winc = 0, -1
                for m in msgs:
                    c = counts.get(m, 0) + 1
                    counts[m] = c
                    if c > winc or (c == winc and m < win):
                        win, winc = m, c
                labels[v, s] = win
            if s < T - 1:  # speak
                for w in dst[indptr[v]:indptr[v + 1]]:
                    queues[w].append(labels[v, rng.next_int(s + 1)])
    offsets, kept = _prune(labels, strength)
    return _result_table(np.arange(n, dtype=np.int64), offsets, kept)


# --------------------------------------------------------------------------------
# counter-based synchronous kernel — vectorized local reference
# --------------------------------------------------------------------------------

def _speak_labels(labels: np.ndarray, src_rep: np.ndarray,
                  edge_idx: np.ndarray, s: int, seed: int) -> np.ndarray:
    """Per-edge spoken label: position = splitmix64(seed, edge, s) % (s+1),
    a pure function of the GLOBAL edge index — identical at any sharding.
    The clip guards the ~2^-53 draws where float rounding makes u01 read
    exactly 1.0 (pos would index the not-yet-written column s+1)."""
    pos = np.minimum((_u01(seed, edge_idx, s, 1) * (s + 1)).astype(np.int64),
                     s)
    return labels[src_rep, pos]


def _sllpa_sync(graph, T: int, strength: float, seed: int) -> pa.Table:
    n = graph.n
    src, dst = graph.src, graph.dst
    m = src.shape[0]
    edge_idx = np.arange(m, dtype=np.int64)
    labels = np.repeat(np.arange(n, dtype=np.int64)[:, None], T, axis=1)
    out_labels = src.copy()  # superstep 0: everyone speaks its own id
    for s in range(1, T):
        dv, lv = _majority(dst, out_labels)
        labels[dv, s] = lv
        if s < T - 1:
            out_labels = _speak_labels(labels, src, edge_idx, s, seed)
    offsets, kept = _prune(labels, strength)
    return _result_table(np.arange(n, dtype=np.int64), offsets, kept)


# --------------------------------------------------------------------------------
# distributed path — vid-range CSR shard actors, bit-equal to _sllpa_sync
# --------------------------------------------------------------------------------

class _SllpaShard:
    """One vid-range shard: CSR slice + the label history of its vid range."""

    def __init__(self, shard_ref, bounds: np.ndarray, p: int, T: int, seed: int):
        from .pregel import _resolve_shard
        self.shard = _resolve_shard(shard_ref)
        self.bounds = np.asarray(bounds, dtype=np.int64)
        self.p = p
        self.T = T
        self.seed = seed
        self.nparts = len(bounds) - 1
        lo, hi = self.shard.lo, self.shard.hi
        self.labels = np.repeat(
            np.arange(lo, hi, dtype=np.int64)[:, None], T, axis=1)
        deg = np.diff(self.shard.indptr)
        self.src_rep = np.repeat(np.arange(hi - lo, dtype=np.int64), deg)
        self.edge_off = 0  # set after all shards report their edge counts

    def num_edges(self) -> int:
        return int(self.shard.indices.shape[0])

    def set_edge_offset(self, off: int) -> None:
        self.edge_off = int(off)

    def _ret(self, parts: list):
        # Ray splits returns only at num_returns > 1 — single-part exchanges
        # must return the bare element (same convention as _N2VShard._ret).
        return parts[0] if self.nparts == 1 else tuple(parts)

    def speak(self, s: int):
        """Produce per-destination-shard (dst, label, count) triples for
        superstep ``s``'s messages (s == 0 ⇒ own ids)."""
        shard = self.shard
        if s == 0:
            lab = np.arange(shard.lo, shard.hi, dtype=np.int64)[self.src_rep]
        else:
            edge_idx = self.edge_off + np.arange(shard.indices.shape[0],
                                                 dtype=np.int64)
            lab = _speak_labels(self.labels, self.src_rep, edge_idx, s,
                                self.seed)
        dstg = shard.indices.astype(np.int64, copy=False)
        d, l, c = _combine_counts(dstg, lab, np.ones(dstg.shape[0], dtype=np.int64))
        cuts = np.searchsorted(d, self.bounds)
        return self._ret([(d[cuts[q]:cuts[q + 1]], l[cuts[q]:cuts[q + 1]],
                           c[cuts[q]:cuts[q + 1]]) for q in range(self.nparts)])

    def listen(self, s: int, *incoming):
        """Merge incoming triples, majority-vote, write labels[:, s]."""
        ds = np.concatenate([t[0] for t in incoming]) if incoming \
            else np.empty(0, dtype=np.int64)
        ls = np.concatenate([t[1] for t in incoming]) if incoming \
            else np.empty(0, dtype=np.int64)
        cs = np.concatenate([t[2] for t in incoming]) if incoming \
            else np.empty(0, dtype=np.int64)
        dv, lv = _majority_from_counts(ds, ls, cs)
        self.labels[dv - self.shard.lo, s] = lv
        return True

    def prune_table(self, strength: float) -> pa.Table:
        offsets, kept = _prune(self.labels, strength)
        vids = np.arange(self.shard.lo, self.shard.hi, dtype=np.int64)
        return _result_table(vids, offsets, kept)


def _sllpa_sharded(graph, T: int, strength: float, seed: int,
                   num_partitions: Optional[int], as_dataset: bool):
    import ray

    import os
    # when Ray is not yet initialized, Worker.remote will auto-init with the
    # machine's CPU count — cap P by that, not by a guess, or placement of
    # num_cpus=1 actors could deadlock on small machines
    ncpu = int(ray.cluster_resources().get("CPU", 8)) \
        if ray.is_initialized() else (os.cpu_count() or 8)
    if num_partitions is None:
        num_partitions = max(2, min(ncpu, graph.num_edges // 250_000 + 2))
    # never more 1-CPU actors than CPUs — placement would deadlock the exchange
    P = max(2, min(num_partitions, ncpu))
    from .pregel import _shard_handles
    bounds = graph.bounds(P, "natural")
    handles = _shard_handles(graph, P, "natural")
    nparts = len(bounds) - 1
    if nparts < 2:
        return None  # caller falls back to the local kernel
    Worker = ray.remote(num_cpus=1)(_SllpaShard)
    workers = [Worker.remote(handles[p], bounds, p, T, seed)
               for p in range(nparts)]
    try:
        counts = ray.get([w.num_edges.remote() for w in workers])
        offs = np.concatenate(([0], np.cumsum(counts)[:-1]))
        ray.get([w.set_edge_offset.remote(int(offs[p]))
                 for p, w in enumerate(workers)])
        for s in range(1, T):
            outbox = [w.speak.options(num_returns=nparts).remote(s - 1)
                      for w in workers]
            ray.get([workers[q].listen.remote(
                s, *[outbox[p][q] for p in range(nparts)])
                for q in range(nparts)])
        refs = [w.prune_table.remote(strength) for w in workers]
        if as_dataset:
            import ray.data
            ray.wait(refs, num_returns=len(refs))  # tables exist before kill
            return ray.data.from_arrow_refs(refs)
        return pa.concat_tables(ray.get(refs))
    finally:
        for w in workers:
            ray.kill(w)


# --------------------------------------------------------------------------------
# public API
# --------------------------------------------------------------------------------

def sllpa(graph, *, max_iterations: int = 10,
          min_association_strength: float = 0.2, seed: int = 42,
          execution: str = "auto", num_partitions: Optional[int] = None,
          java_compat: bool = False, as_dataset: bool = False):
    """Overlapping communities via speaker-listener label propagation.

    Returns a table (vid: int64, community_ids: list<int64> ascending) — the
    analogue of the reference's ``communityIds`` long-array node property.
    ``java_compat=True`` reproduces java.util.Random + async-queue scheduling
    exactly (local only); the default counter-based schedule is bit-equal
    between ``execution="local"`` and ``"ray"`` at any partition count.
    """
    if max_iterations < 2:
        raise ValueError("max_iterations must be >= 2 (init + final prune)")
    T, strength = int(max_iterations), float(min_association_strength)
    has_edges_local = hasattr(graph, "src")  # ParquetGraph holds no edge arrays
    if java_compat:
        if execution == "ray" or not has_edges_local:
            raise ValueError("java_compat is sequential-only (local execution)")
        return _sllpa_java(graph, T, strength, seed)
    if execution == "auto":
        import ray
        execution = "ray" if (not has_edges_local
                              or (graph.num_edges >= _RAY_EDGE_THRESHOLD
                                  and ray.is_initialized())) else "local"
    elif execution == "local" and not has_edges_local:
        raise ValueError("local execution needs in-memory edges; use "
                         "execution='ray' for parquet-backed graphs")
    if execution == "ray":
        res = _sllpa_sharded(graph, T, strength, seed, num_partitions, as_dataset)
        if res is not None:
            return res
        if not has_edges_local:  # bounds collapsed AND no in-memory fallback
            raise ValueError("partition bounds collapsed to one shard and the "
                             "graph holds no in-memory edges for the local "
                             "fallback kernel")
    if as_dataset:
        import ray.data
        return ray.data.from_arrow(_sllpa_sync(graph, T, strength, seed))
    return _sllpa_sync(graph, T, strength, seed)


def sllpa_exploded(graph, **kw) -> pa.Table:
    """(vid, community_id) rows — one per kept label (driver/oracle shape)."""
    t = sllpa(graph, **kw)
    vids = t.column("vid").to_numpy(zero_copy_only=False)
    lst = t.column("community_ids")
    if isinstance(lst, pa.ChunkedArray):
        lst = lst.combine_chunks()
    offsets = lst.offsets.to_numpy(zero_copy_only=False)
    values = lst.values.to_numpy(zero_copy_only=False)
    counts = np.diff(offsets)
    return pa.table({"vid": pa.array(np.repeat(vids, counts), type=pa.int64()),
                     "community_id": pa.array(values, type=pa.int64())})
