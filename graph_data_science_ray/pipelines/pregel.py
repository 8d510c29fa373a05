"""Bulk-synchronous (Pregel-style) vertex computation runner on Ray.

This is the Ray-native re-expression of the reference's Pregel framework
(pregel/src/main/java/org/neo4j/gds/beta/pregel/Pregel.java:56-79,158-199):

  * per-vertex state lives in per-partition columns (the analogue of Pregel
    ``NodeValue`` arrays, pregel/.../NodeValue.java:46-73);
  * one superstep = scatter (push values along CSR out-edges, pre-combining
    messages per destination *inside the source partition* — GDS's
    ReducingMessenger partial combine, pregel/.../ReducingMessenger.java:77-82),
    an all-to-all message exchange keyed by destination partition, a final
    combine (dense ``bincount`` / ``minimum`` per local vid), and the vertex
    update (GDS ComputeStep, pregel/.../ComputeStep.java:76-102);
  * convergence = tiny global aggregates of ``sending`` / ``changed``
    (vote-to-halt — PartitionedComputer.hasConverged, :77-85).

Because scatter pre-combines per source partition, a destination vertex receives
at most P partial payloads per superstep regardless of its in-degree — the
hub-skew guard (a power-law hub's million in-edges collapse to ≤P payloads
before the exchange), complementing degree-balanced edge partitioning
(state/graph.py).  Message payloads are adaptively dense (bincount arrays over
the destination range — the fast path when a partition receives many messages)
or sparse (id/value pairs — the late-superstep path when few vertices are
active), so the combine never pays a sort.

Three execution modes (``run_pregel(execution=...)``):

  * ``local``    — single-process driver loop over the same partition kernels
    (small graphs; conformance oracle for the distributed modes);
  * ``ray``      — persistent shard-actor BSP: one actor per partition holds its
    CSR shard (zero-copy from the object store) + its state slice; one fused
    actor RPC round per superstep exchanges the pre-combined payloads through
    the object store.  This is the throughput path: a 40-round iteration cannot
    afford the Dataset executor's per-pipeline fixed cost, and the per-partition
    mutable state is exactly the case where raw actors are warranted;
  * ``ray-data`` — every superstep as a Ray Data pipeline (map_batches scatter →
    union with the state stream → groupby(part).map_groups apply); identical
    results, higher per-superstep latency; kept as the streaming-integration
    and cross-check path.
"""

from __future__ import annotations

import os
import sys
import time
from dataclasses import dataclass, field
from typing import Optional

import numpy as np
import pyarrow as pa

from ..state.graph import (CsrShard, Graph, ParquetGraph, ShardSpec,
                           load_shard_from_layout)

_RUNNER_COLS = [
    ("send", np.float64),    # value pushed along out-edges next scatter
    ("skey", np.int64),      # message key for keyed computations (e.g. LPA label)
    ("sending", np.uint8),   # 1 ⇒ vertex scatters next superstep (inverse of vote-to-halt)
    ("changed", np.uint8),   # 1 ⇒ vertex changed this superstep (convergence metric)
]


class Computation:
    """Vertex-program protocol — the Ray analogue of GDS PregelComputation
    (pregel/.../PregelComputation.java), vectorized over partitions."""

    orientation = "natural"      # CSR orientation the shards are built with
    reducer = "sum"              # "sum" | "min" | "max" | "count" (Reducer.java:34-86)
    #                              or None ⇒ QUEUE mode: no combine, apply_part
    #                              receives the full per-vertex message lists
    #                              (SyncQueueMessenger analogue — for user
    #                              computations whose messages don't reduce)
    keyed = False                # True ⇒ messages are (key, val); combine = per-key sum
    weighted = False             # apply edge weight to messages (applyRelationshipWeight)
    edge_combine = "mul"         # how weight applies: "mul" (PR) | "add" (shortest paths)
    scatter_remote_only = False  # True ⇒ skip intra-partition targets (handled in apply)
    always_active = False        # every vertex scatters every superstep (LPA, eigenvector)
    idempotent_on_empty = False  # True ⇒ a superstep with no incoming messages is a
    # mathematical no-op for every halted vertex (PR/WCC/BFS-style).  Opt-in gate
    # for the actor-mode pipelined stepping: only such computations may run extra
    # speculative supersteps past convergence without diverging from local mode.
    count_init_as_iteration = True   # superstep 0 counts toward ranIterations (Pregel yes)
    positive_messages = False    # True ⇒ every message value is >= 0 and a
    # vertex's incoming sum is 0 only when every incoming message is 0 (PR
    # deltas).  Lets the dense sum exchange drop its per-payload has/count
    # array — one fewer full-range bincount per producer per superstep and n
    # fewer payload bytes — deriving ``has`` as ``sum != 0`` at the receiver.
    # A vertex whose messages all carry exactly 0.0 (personalized PR superstep
    # 0, zero-weight edges) reads has=False, which is identical for any
    # computation whose apply is a no-op on an all-zero delta.
    asynchronous = False         # True ⇒ async queue mode (AsyncQueueMessenger.java):
    # ONE shared message pool instead of double-buffered queues — a message
    # becomes visible at its target's NEXT compute, which may be in the SAME
    # superstep.  Requires reducer=None; shared-memory only (execution="local",
    # like the reference).  This engine picks one deterministic interleaving
    # (a fixed partition sweep, see _run_local_async) out of the reference's
    # thread-nondeterministic schedules.
    # immutable defaults: subclasses REDECLARE these (a mutable shared
    # default would leak `self.state_spec.append(...)` mutations into every
    # other computation in the process)
    state_spec: tuple = ()       # [(name, np.dtype)] algorithm state columns
    output_cols: dict = {}       # result column name -> state column name
    master_cols: tuple = ()      # state cols summed globally between supersteps

    def init_part(self, vids: np.ndarray, shard: CsrShard, st: dict) -> None:
        raise NotImplementedError

    def apply_part(self, vids, st, msg, superstep: int, shard: CsrShard) -> None:
        raise NotImplementedError

    def master_part(self, vids, st, scalars: dict, superstep: int) -> None:
        """Optional global step between supersteps (Eigenvector normalization).
        In actor mode this runs *after* the next scatter, so it must not change
        what was sent — same position in the superstep as GDS masterCompute."""


@dataclass
class NonKeyedMsg:
    vals: np.ndarray   # dense, aligned to partition vids; identity where no message
    has: np.ndarray    # bool, aligned


@dataclass
class KeyedMsg:
    local: np.ndarray  # local vid indices (may repeat across keys)
    key: np.ndarray
    val: np.ndarray    # summed weight per (local, key)


@dataclass
class QueueMsg:
    """Uncombined per-vertex message queues (SyncQueueMessenger analogue):
    ``local`` is sorted; ``vals[indptr[v]:indptr[v+1]]`` are vertex v's
    messages (order unspecified, like the reference's parallel queues)."""

    local: np.ndarray   # sorted local vid per message
    vals: np.ndarray
    indptr: np.ndarray  # length nloc+1: per-local-vertex segment bounds

    def messages_of(self, v: int) -> np.ndarray:
        return self.vals[self.indptr[v]:self.indptr[v + 1]]

    @property
    def has(self) -> np.ndarray:
        return np.diff(self.indptr) > 0


@dataclass
class PregelResult:
    table: pa.Table
    ran_iterations: int
    did_converge: bool
    metrics: list = field(default_factory=list)
    # wall-clock phase split (actor path): setup = spawn + shard load + init,
    # steps = superstep loop to convergence.  Lets benchmarks separate the
    # per-iteration kernel rate from fixed/startup costs.
    setup_sec: float = 0.0
    steps_sec: float = 0.0

    def to_pandas(self):
        return self.table.to_pandas()


# --------------------------------------------------------------------------------
# kernels shared by all execution paths
# --------------------------------------------------------------------------------

def _expand_edges(comp, shard, local, send, skey, sending):
    """Raw scatter: (dst, key|None, val) per edge of every sending vertex."""
    mask = sending != 0
    srcs = local[mask]
    if srcs.shape[0] == 0:
        e = np.empty(0, dtype=np.int64)
        return e, (e if comp.keyed else None), np.empty(0, dtype=np.float64)
    # full-frontier fast path (the heavy PageRank-style supersteps): when the
    # local vids are the dense sorted range and every positive-degree vertex is
    # sending, the edge index set is the whole CSR — use ``shard.indices``
    # directly (no m-sized idx build, no gather; zero-degree non-senders
    # contribute nothing to np.repeat).  Saves ~12 bytes/edge of allocation +
    # traffic in the superstep that dominates dense-graph wall time.
    if (local.shape[0] == shard.num_nodes and local[0] == 0
            and np.all(np.diff(local) == 1)):
        lens_all = np.diff(shard.indptr)
        if np.all(mask | (lens_all == 0)):
            dst = shard.indices
            vals = np.repeat(send, lens_all)
            if comp.weighted and shard.weights is not None:
                if comp.edge_combine == "add":
                    vals = vals + shard.weights
                else:
                    vals = vals * shard.weights
            keys = np.repeat(skey, lens_all) if comp.keyed else None
            if comp.scatter_remote_only:
                remote = (dst < shard.lo) | (dst >= shard.hi)
                dst, vals = dst[remote], vals[remote]
                keys = keys[remote] if keys is not None else None
            return dst, keys, vals
    idx, lens = shard.neighbors_flat(srcs)
    dst = shard.indices[idx]          # may be int32 (see build_csr_shard)
    vals = np.repeat(send[mask], lens)
    if comp.weighted and shard.weights is not None:
        if comp.edge_combine == "add":
            vals = vals + shard.weights[idx]
        else:
            vals = vals * shard.weights[idx]
    keys = np.repeat(skey[mask], lens) if comp.keyed else None
    if comp.scatter_remote_only:
        remote = (dst < shard.lo) | (dst >= shard.hi)
        dst, vals = dst[remote], vals[remote]
        keys = keys[remote] if keys is not None else None
    return dst, keys, vals


def _combine_sparse_keyed(dst, keys, vals):
    """Pre-combine (dst, key) duplicates — the keyed ReducingMessenger."""
    if dst.shape[0] == 0:
        return dst, keys, vals
    order = np.lexsort((keys, dst))
    dst, keys, vals = dst[order], keys[order], vals[order]
    run = np.empty(dst.shape[0], dtype=bool)
    run[0] = True
    run[1:] = (dst[1:] != dst[:-1]) | (keys[1:] != keys[:-1])
    starts = np.nonzero(run)[0]
    return dst[starts], keys[starts], np.add.reduceat(vals, starts)


def scatter_kernel(comp: Computation, shard: CsrShard, local: np.ndarray,
                   send: np.ndarray, skey: np.ndarray, sending: np.ndarray):
    """Combined sparse scatter (row form, used by the ray-data path)."""
    dst, keys, vals = _expand_edges(comp, shard, local, send, skey, sending)
    if comp.keyed:
        return _combine_sparse_keyed(dst, keys, vals)
    if dst.shape[0] == 0:
        return dst, None, vals
    if comp.reducer is None:  # queue mode: ship raw, no pre-combine
        return np.ascontiguousarray(dst, dtype=np.int64), None, vals
    uq, inv = np.unique(dst, return_inverse=True)
    if comp.reducer == "sum":
        out = np.bincount(inv, weights=vals)
    elif comp.reducer == "count":
        out = np.bincount(inv).astype(np.float64)
    elif comp.reducer == "min":
        out = np.full(uq.shape[0], np.inf)
        np.minimum.at(out, inv, vals)
    elif comp.reducer == "max":
        out = np.full(uq.shape[0], -np.inf)
        np.maximum.at(out, inv, vals)
    else:
        raise ValueError(f"unknown reducer {comp.reducer}")
    return uq, None, out


# message payload tags:
#   "F"  dense full-range sum   (sumv[n], has[n])
#   "Fm" dense full-range min   (acc[n])
#   "s"  sparse global          (dst_global, vals)
#   "k"  sparse keyed, dst-sorted (dst_global, keys, vals)
def scatter_global(comp: Computation, shard: CsrShard, n_total: int,
                   local, send, skey, sending):
    """Scatter into ONE payload covering the whole vid range.

    Receivers slice their own [lo, hi) out of it — on a single node every
    receiver maps the same plasma object zero-copy, so the exchange creates P
    objects per superstep (not P²).  On a multi-node cluster, where network
    bytes matter more than object count, the same payloads are cut into
    per-destination slices before shipping (``payload_mode="sliced"``:
    ``slice_payload`` + ``_ShardActor.step_sliced`` with ``num_returns=1+P``);
    the merge logic below is identical either way.

    Dense payloads (one full-range ``bincount``) are used in heavy supersteps —
    no routing or sort at all; sparse (dst, val) pairs in the late supersteps."""
    dst, keys, vals = _expand_edges(comp, shard, local, send, skey, sending)
    if comp.keyed:
        if dst.shape[0]:
            dst, keys, vals = _combine_sparse_keyed(dst, keys, vals)
        return ("k", dst, keys, vals)
    if dst.shape[0] == 0:
        return None
    if comp.reducer is None:  # queue mode: dst-sorted raw pairs
        order = np.argsort(dst, kind="stable")
        return ("q", np.ascontiguousarray(dst[order], dtype=np.int64),
                vals[order])
    if comp.reducer == "count":
        vals = np.ones(dst.shape[0])
    if dst.shape[0] * 2 >= n_total:
        if comp.reducer in ("sum", "count"):
            sumv = np.bincount(dst, weights=vals, minlength=n_total)
            if comp.positive_messages:
                return ("F", sumv, None)  # receiver derives has = sumv != 0
            cnt = np.bincount(dst, minlength=n_total)
            return ("F", sumv, cnt > 0)
        if comp.reducer == "max":
            acc = np.full(n_total, -np.inf)
            np.maximum.at(acc, dst, vals)
            return ("FM", acc)
        acc = np.full(n_total, np.inf)
        np.minimum.at(acc, dst, vals)
        return ("Fm", acc)
    return ("s", dst, vals)


def slice_payload(comp: Computation, pl, bounds: np.ndarray) -> list:
    """Cut one global payload into P per-receiver payloads (multi-node shape:
    each receiver is shipped ONLY its own vid range — O(n) total network bytes
    per superstep instead of O(P·n) for dense payloads).  Sparse slices keep
    their global tags (merge_payloads' [lo, hi) filter is a no-op on them);
    dense slices get exactly-my-range tags ("Fs"/"FMs"/"Fms") because the
    receiver cannot re-slice an array that no longer spans the full range."""
    P = len(bounds) - 1
    if pl is None:
        return [None] * P
    tag = pl[0]
    if tag in ("F", "FM", "Fm"):
        out = []
        for q in range(P):
            lo, hi = int(bounds[q]), int(bounds[q + 1])
            if tag == "F":
                out.append(("Fs", pl[1][lo:hi],
                            None if pl[2] is None else pl[2][lo:hi]))
            elif tag == "FM":
                out.append(("FMs", pl[1][lo:hi]))
            else:
                out.append(("Fms", pl[1][lo:hi]))
        return out
    dst = pl[1]
    if tag == "s":  # raw expanded pairs: sort once, then slice by bounds
        order = np.argsort(dst, kind="stable")
        dst = dst[order]
        vals = pl[2][order]
        cuts = np.searchsorted(dst, bounds)
        return [("s", dst[cuts[q]:cuts[q + 1]], vals[cuts[q]:cuts[q + 1]])
                if cuts[q + 1] > cuts[q] else None for q in range(P)]
    cuts = np.searchsorted(dst, bounds)  # "k"/"q": already dst-sorted
    if tag == "q":
        return [("q", dst[cuts[q]:cuts[q + 1]], pl[2][cuts[q]:cuts[q + 1]])
                if cuts[q + 1] > cuts[q] else None for q in range(P)]
    return [("k", dst[cuts[q]:cuts[q + 1]], pl[2][cuts[q]:cuts[q + 1]],
             pl[3][cuts[q]:cuts[q + 1]])
            if cuts[q + 1] > cuts[q] else None for q in range(P)]


def slice_payload_grouped(comp: Computation, pl, group_bounds: np.ndarray) -> list:
    """Cut one global payload into K per-NODE-GROUP payloads — the cluster
    deployment shape: with P actors spread over K nodes, a producer ships ONE
    slice per node (covering that node's contiguous vid ranges) and the
    co-located receivers map it zero-copy from their node's object store.
    K = P degenerates to :func:`slice_payload`'s per-receiver slices; K = 1
    degenerates to the shared whole-range payload.  Dense group slices carry
    their range start (tags "Fg"/"FMg"/"Fmg" = (tag, glo, arr...)) so a
    receiver can cut its own [lo, hi) sub-range; sparse slices keep global
    ids, which merge_payloads' [lo, hi) filter already handles."""
    K = len(group_bounds) - 1
    if pl is None:
        return [None] * K
    tag = pl[0]
    if tag in ("F", "FM", "Fm"):
        out = []
        for gix in range(K):
            lo, hi = int(group_bounds[gix]), int(group_bounds[gix + 1])
            if tag == "F":
                out.append(("Fg", lo, pl[1][lo:hi],
                            None if pl[2] is None else pl[2][lo:hi]))
            elif tag == "FM":
                out.append(("FMg", lo, pl[1][lo:hi]))
            else:
                out.append(("Fmg", lo, pl[1][lo:hi]))
        return out
    return slice_payload(comp, pl, group_bounds)


def _msg_count(msg) -> int:
    """Incoming-message metric for a merged per-partition message structure:
    vertices with >= 1 message (KeyedMsg counts (vertex, key) entries;
    QueueMsg counts raw queued messages)."""
    if isinstance(msg, KeyedMsg):
        return int(msg.local.shape[0])
    if isinstance(msg, QueueMsg):
        return int(msg.local.shape[0])
    if isinstance(msg, NonKeyedMsg):
        return int(np.count_nonzero(msg.has))
    return 0


def merge_payloads(comp: Computation, lo: int, hi: int, payloads: list):
    """Final combine: slice/filter each global payload to [lo, hi) and reduce."""
    nloc = hi - lo
    if comp.keyed:
        ids_l, keys_l, vals_l = [], [], []
        for p in payloads:
            if p is None or p[1].shape[0] == 0:
                continue
            a, b = np.searchsorted(p[1], [lo, hi])  # dst-sorted
            if b > a:
                ids_l.append(p[1][a:b] - lo)
                keys_l.append(p[2][a:b])
                vals_l.append(p[3][a:b])
        if not ids_l:
            e = np.empty(0, dtype=np.int64)
            return KeyedMsg(e, e, np.empty(0, dtype=np.float64))
        local, key, val = _combine_sparse_keyed(
            np.concatenate(ids_l), np.concatenate(keys_l), np.concatenate(vals_l))
        return KeyedMsg(local, key, val)
    if comp.reducer is None:  # queue mode: concatenate the raw per-vertex lists
        ids_l, vals_l = [], []
        for p in payloads:
            if p is None:
                continue
            a, b = np.searchsorted(p[1], [lo, hi])  # "q": dst-sorted
            if b > a:
                ids_l.append(p[1][a:b] - lo)
                vals_l.append(p[2][a:b])
        if ids_l:
            local = np.concatenate(ids_l)
            vals = np.concatenate(vals_l)
            order = np.argsort(local, kind="stable")
            local, vals = local[order], vals[order]
        else:
            local, vals = np.empty(0, dtype=np.int64), np.empty(0)
        indptr = np.searchsorted(local, np.arange(nloc + 1))
        return QueueMsg(local, vals, indptr)
    if comp.reducer in ("sum", "count"):
        vals = np.zeros(nloc)
        has = np.zeros(nloc, dtype=bool)
        derive_has = comp.positive_messages  # has = (vals != 0) at the end
        sparse_ids, sparse_vals = [], []
        for p in payloads:
            if p is None:
                continue
            if p[0] == "F":
                vals += p[1][lo:hi]
                if not derive_has:
                    has |= p[2][lo:hi]
            elif p[0] == "Fs":  # sliced dense: already exactly [lo, hi)
                vals += p[1]
                if not derive_has:
                    has |= p[2]
            elif p[0] == "Fg":  # grouped dense: cut [lo, hi) from group range
                vals += p[2][lo - p[1]:hi - p[1]]
                if not derive_has:
                    has |= p[3][lo - p[1]:hi - p[1]]
            else:  # "s" — count payloads already carry per-message ones
                m = (p[1] >= lo) & (p[1] < hi)
                sparse_ids.append(p[1][m] - lo)
                sparse_vals.append(p[2][m])
        if sparse_ids:
            ids = np.concatenate(sparse_ids)
            vv = np.concatenate(sparse_vals)
            if ids.shape[0]:
                vals += np.bincount(ids, weights=vv, minlength=nloc)
                if not derive_has:
                    has |= np.bincount(ids, minlength=nloc) > 0
        if derive_has:
            has = vals != 0
        return NonKeyedMsg(vals, has)
    if comp.reducer == "max":
        vals = np.full(nloc, -np.inf)
        for p in payloads:
            if p is None:
                continue
            if p[0] == "FM":
                np.maximum(vals, p[1][lo:hi], out=vals)
            elif p[0] == "FMs":
                np.maximum(vals, p[1], out=vals)
            elif p[0] == "FMg":
                np.maximum(vals, p[2][lo - p[1]:hi - p[1]], out=vals)
            else:  # "s"
                m = (p[1] >= lo) & (p[1] < hi)
                if m.any():
                    np.maximum.at(vals, p[1][m] - lo, p[2][m])
        return NonKeyedMsg(vals, vals > -np.inf)
    vals = np.full(nloc, np.inf)
    for p in payloads:
        if p is None:
            continue
        if p[0] == "Fm":
            np.minimum(vals, p[1][lo:hi], out=vals)
        elif p[0] == "Fms":
            np.minimum(vals, p[1], out=vals)
        elif p[0] == "Fmg":
            np.minimum(vals, p[2][lo - p[1]:hi - p[1]], out=vals)
        else:  # "s"
            m = (p[1] >= lo) & (p[1] < hi)
            if m.any():
                np.minimum.at(vals, p[1][m] - lo, p[2][m])
    return NonKeyedMsg(vals, vals < np.inf)


def combine_messages(comp: Computation, lo: int, nloc: int,
                     m_vid: np.ndarray, m_key, m_val: np.ndarray):
    """Row-form final combine (ray-data path)."""
    if comp.keyed:
        local = m_vid - lo
        if local.shape[0] == 0:
            return KeyedMsg(local, m_key, m_val)
        loc, key, val = _combine_sparse_keyed(local, m_key, m_val)
        return KeyedMsg(loc, key, val)
    local = m_vid - lo
    if comp.reducer is None:
        order = np.argsort(local, kind="stable")
        local_s, vals_s = local[order], m_val[order]
        indptr = np.searchsorted(local_s, np.arange(nloc + 1))
        return QueueMsg(local_s, vals_s, indptr)
    has = np.zeros(nloc, dtype=bool)
    has[local] = True
    if comp.reducer in ("sum", "count"):
        # count partials are already per-shard counts in m_val — SUM them
        # (re-counting rows here would count partials, not messages)
        vals = np.zeros(nloc)
        np.add.at(vals, local, m_val)
    elif comp.reducer == "max":
        vals = np.full(nloc, -np.inf)
        np.maximum.at(vals, local, m_val)
    else:
        vals = np.full(nloc, np.inf)
        np.minimum.at(vals, local, m_val)
    return NonKeyedMsg(vals, has)


def _payload_count(p) -> int:
    if p is None:
        return 0
    if p[0] in ("s", "k", "q"):
        return int(p[1].shape[0])
    if p[0] in ("F", "Fs"):
        return int(np.count_nonzero(p[1]) if p[2] is None else p[2].sum())
    if p[0] == "Fg":
        return int(np.count_nonzero(p[2]) if p[3] is None else p[3].sum())
    if p[0] in ("FM", "FMs"):
        return int((p[1] > -np.inf).sum())
    if p[0] == "FMg":
        return int((p[2] > -np.inf).sum())
    if p[0] == "Fmg":
        return int((p[2] < np.inf).sum())
    return int((p[1] < np.inf).sum())


# --------------------------------------------------------------------------------
# state <-> arrow
# --------------------------------------------------------------------------------

def _init_state_part(comp: Computation, p: int, lo: int, hi: int, shard: CsrShard):
    vids = np.arange(lo, hi, dtype=np.int64)
    nloc = hi - lo
    st = {}
    for name, dt in comp.state_spec:
        st[name] = np.zeros(nloc, dtype=dt)
    for name, dt in _RUNNER_COLS:
        st[name] = np.zeros(nloc, dtype=dt)
    comp.init_part(vids, shard, st)
    return vids, st


def _state_table(p: int, vids: np.ndarray, st: dict, comp: Computation) -> pa.Table:
    nloc = vids.shape[0]
    cols = {"part": np.full(nloc, p, dtype=np.int32), "vid": vids}
    for name, _ in comp.state_spec:
        cols[name] = st[name]
    for name, _ in _RUNNER_COLS:
        cols[name] = st[name]
    cols["is_msg"] = np.zeros(nloc, dtype=np.uint8)
    cols["m_key"] = np.zeros(nloc, dtype=np.int64)
    cols["m_val"] = np.zeros(nloc, dtype=np.float64)
    return pa.table(cols)


def _msg_table(part: np.ndarray, vid: np.ndarray, key, val: np.ndarray,
               comp: Computation) -> pa.Table:
    n = vid.shape[0]
    cols = {"part": part.astype(np.int32), "vid": vid}
    for name, dt in comp.state_spec:
        cols[name] = np.zeros(n, dtype=dt)
    for name, dt in _RUNNER_COLS:
        cols[name] = np.zeros(n, dtype=dt)
    cols["is_msg"] = np.ones(n, dtype=np.uint8)
    cols["m_key"] = key.astype(np.int64) if key is not None else np.zeros(n, dtype=np.int64)
    cols["m_val"] = val.astype(np.float64)
    return pa.table(cols)


def _resume_part(t: pa.Table, bounds, p: int) -> pa.Table:
    """Checkpoint rows for partition ``p`` selected by CURRENT vid bounds —
    NOT by the saved ``part`` column: the checkpoint may have been written
    under a different num_partitions (the actor-mode default is derived from
    the machine's CPU count), and filtering on the stale part ids silently
    drops every vertex of parts >= nparts.  _table_to_state re-sorts by vid,
    so range selection is layout-independent."""
    vcol = t.column("vid").to_numpy(zero_copy_only=False)
    lo, hi = int(bounds[p]), int(bounds[p + 1])
    return t.filter(pa.array((vcol >= lo) & (vcol < hi)))


def _table_to_state(t: pa.Table, comp: Computation):
    vids = t.column("vid").to_numpy(zero_copy_only=False)
    order = np.argsort(vids, kind="stable")
    vids = vids[order]
    st = {}
    for name, dt in list(comp.state_spec) + _RUNNER_COLS:
        st[name] = np.ascontiguousarray(
            t.column(name).to_numpy(zero_copy_only=False)[order]).astype(dt, copy=False)
    return vids, st


# --------------------------------------------------------------------------------
# ray-data workers (Dataset-pipeline superstep — the north-star formulation)
# --------------------------------------------------------------------------------

class _ScatterWorker:
    """map_batches stage: CSR shards mapped zero-copy from the object store."""

    def __init__(self, comp, shard_refs, bounds):
        self.comp = comp
        self.shard_refs = shard_refs
        self.bounds = np.asarray(bounds)
        self._cache = {}
        self.__name__ = "pregel_scatter"

    def _shard(self, p):
        if p not in self._cache:
            self._cache[p] = _resolve_shard(self.shard_refs[p])
        return self._cache[p]

    def __call__(self, batch: pa.Table) -> pa.Table:
        comp = self.comp
        if batch.num_rows == 0 or "is_msg" not in batch.column_names:
            return _msg_table(np.empty(0, np.int32), np.empty(0, np.int64), None,
                              np.empty(0, np.float64), comp)
        part = batch.column("part").to_numpy(zero_copy_only=False)
        vid = batch.column("vid").to_numpy(zero_copy_only=False)
        send = batch.column("send").to_numpy(zero_copy_only=False)
        skey = batch.column("skey").to_numpy(zero_copy_only=False)
        sending = batch.column("sending").to_numpy(zero_copy_only=False)
        outs = []
        for p in np.unique(part):
            sh = self._shard(int(p))
            m = part == p
            dst, key, val = scatter_kernel(comp, sh, vid[m] - sh.lo,
                                           send[m], skey[m], sending[m])
            if dst.shape[0]:
                dpart = (np.searchsorted(self.bounds, dst, side="right") - 1)
                outs.append(_msg_table(dpart, dst, key, val, comp))
        if not outs:
            return _msg_table(np.empty(0, np.int32), np.empty(0, np.int64), None,
                              np.empty(0, np.float64), comp)
        return pa.concat_tables(outs)


class _ApplyWorker:
    """map_groups stage, one group per partition: final combine + vertex update."""

    def __init__(self, comp, shard_refs, bounds, superstep):
        self.comp = comp
        self.shard_refs = shard_refs
        self.bounds = np.asarray(bounds)
        self.superstep = superstep
        self._cache = {}
        self.__name__ = "pregel_apply"

    def __call__(self, group: pa.Table) -> pa.Table:
        comp = self.comp
        is_msg = group.column("is_msg").to_numpy(zero_copy_only=False).astype(bool)
        state_t = group.filter(pa.array(~is_msg))
        if state_t.num_rows == 0:
            return _state_table(0, np.empty(0, np.int64),
                                {k: np.empty(0, d) for k, d in
                                 list(comp.state_spec) + _RUNNER_COLS}, comp)
        p = int(state_t.column("part")[0].as_py())
        lo, hi = int(self.bounds[p]), int(self.bounds[p + 1])
        vids, st = _table_to_state(state_t, comp)
        msg_t = group.filter(pa.array(is_msg))
        msg = combine_messages(
            comp, lo, hi - lo,
            msg_t.column("vid").to_numpy(zero_copy_only=False),
            msg_t.column("m_key").to_numpy(zero_copy_only=False),
            msg_t.column("m_val").to_numpy(zero_copy_only=False))
        st["changed"][:] = 0
        if p not in self._cache:
            self._cache[p] = _resolve_shard(self.shard_refs[p])
        comp.apply_part(vids, st, msg, self.superstep, self._cache[p])
        return _state_table(p, vids, st, comp)


class _MasterWorker:
    def __init__(self, comp, scalars, superstep, bounds):
        self.comp = comp
        self.scalars = scalars
        self.superstep = superstep
        self.bounds = np.asarray(bounds)
        self.__name__ = "pregel_master"

    def __call__(self, batch: pa.Table) -> pa.Table:
        comp = self.comp
        vids, st = _table_to_state(batch, comp)
        comp.master_part(vids, st, self.scalars, self.superstep)
        t = _state_table(0, vids, st, comp)
        parts = (np.searchsorted(self.bounds, vids, side="right") - 1).astype(np.int32)
        return t.set_column(0, "part", pa.array(parts))


# --------------------------------------------------------------------------------
# runners
# --------------------------------------------------------------------------------

def _shard_handles(graph, P, orientation):
    """Per-partition shard handles: object-store refs for in-memory graphs
    (put once, mapped zero-copy), ShardSpecs for parquet-backed graphs (each
    worker loads its OWN partition from the layout — no driver
    materialization).  A parquet graph whose shards were already built by a
    previous run on this handle returns its cached (ref, spec) pairs: the
    built CSR is mapped zero-copy from the object store, the spec is the
    rebuild fallback."""
    if isinstance(graph, ParquetGraph):
        bounds = graph.bounds(P, orientation)
        nparts = len(bounds) - 1
        cached = graph._shard_ref_cache.get((orientation, nparts))
        if cached is not None:
            return cached
        return [graph.shard_spec(p, bounds, orientation)
                for p in range(nparts)]
    return graph.shard_refs(P, orientation)


def _resolve_shard(handle) -> CsrShard:
    if isinstance(handle, CsrShard):
        return handle
    if isinstance(handle, ShardSpec):
        return load_shard_from_layout(handle)
    import ray
    if isinstance(handle, tuple) and len(handle) == 2 \
            and isinstance(handle[1], ShardSpec):
        ref, spec = handle
        try:
            return ray.get(ref)
        except Exception:  # cached shard evicted/lost: rebuild from layout
            return load_shard_from_layout(spec)
    return ray.get(handle)


def _ensure_comp_picklable(comp):
    """User extensions (SURVEY.md §2.7) may live in modules Ray workers cannot
    import (scripts, test files) — register those modules for pickle-by-value."""
    mod = type(comp).__module__
    if mod.startswith("graph_data_science_ray") or mod == "__main__":
        return
    import sys

    from ray import cloudpickle  # Ray serializes with its vendored cloudpickle
    m = sys.modules.get(mod)
    if m is not None:
        try:
            cloudpickle.register_pickle_by_value(m)
        except Exception:
            pass


def _converged(comp, superstep, sum_sending, sum_changed):
    if comp.always_active:
        return superstep >= 1 and sum_changed == 0
    return sum_sending == 0


def _ran_iterations(comp, superstep, converged, max_iterations):
    """GDS counting: ranIterations is the 0-based iteration index at which
    convergence was detected (Pregel.java:166-195 — ``break`` before increment),
    or maxIterations when the loop ran out; our superstep numbering matches."""
    return superstep if converged else max_iterations


def _has_master(comp):
    return bool(comp.master_cols) or \
        type(comp).master_part is not Computation.master_part


def _result_from_parts(comp, parts_vids, parts_st, ran, converged, metrics):
    cols = {"vid": np.concatenate(parts_vids) if parts_vids else np.empty(0, np.int64)}
    for out_name, st_name in comp.output_cols.items():
        cols[out_name] = np.concatenate([st[st_name] for st in parts_st])
    return PregelResult(pa.table(cols), ran, converged, metrics)


class MemoryEstimationExceeded(RuntimeError):
    """Raised when the pre-run memory estimate exceeds the allowed budget —
    the analogue of the reference's MemoryUsageValidator abort
    (proc/common/.../MemoryUsageValidator.java:50-80)."""


def estimate_pregel_memory(graph, comp: Computation,
                           num_partitions: int) -> dict:
    """Upper-bound byte estimate for one BSP run, in the spirit of
    Pregel.memoryEstimation (pregel/.../Pregel.java:81-98): per-node state
    columns, CSR shards (indices may be int32), and the worst-case message
    exchange (dense payloads: P × n doubles)."""
    n, m = graph.n, graph.num_edges
    state_cols = len(comp.state_spec) + len(_RUNNER_COLS) + 2  # + vid + part
    state = n * 8 * state_cols
    idx_bytes = 4 if n < 2**31 else 8
    shards = m * idx_bytes + (n + num_partitions) * 8 \
        + (m * 8 if getattr(graph, "is_weighted", False) else 0)
    if comp.orientation == "undirected":
        shards *= 2
    messages = min(num_partitions * n * 10, 2 * m * 16 + n * 10)
    total = state + shards + messages
    return {"state_bytes": int(state), "shard_bytes": int(shards),
            "message_bytes": int(messages), "total_bytes": int(total)}


def _available_memory_bytes(execution: str = "local") -> int:
    """Default memory budget.  Local runs are bounded by the driver node's
    available physical RAM; distributed runs ('ray'/'ray-actors'/'ray-data')
    spread state + shards across the cluster, so the budget is the CLUSTER's
    logical memory from ray.cluster_resources() — a busy driver must not
    spuriously abort a run that fits distributed (round-2 ADVICE)."""
    if execution != "local":
        try:
            import ray
            if ray.is_initialized():
                mem = ray.cluster_resources().get("memory")
                if mem:
                    return int(mem)
        except Exception:
            pass
        # distributed run, cluster budget unknown (Ray not initialized yet):
        # do NOT validate against the driver's RAM — a busy driver would
        # spuriously abort a run that fits the cluster
        return 1 << 62
    try:
        return os.sysconf("SC_AVPHYS_PAGES") * os.sysconf("SC_PAGE_SIZE")
    except (ValueError, OSError, AttributeError):
        return 1 << 62


def validate_memory(graph, comp: Computation, num_partitions: int,
                    memory_limit_bytes: Optional[int],
                    execution: str = "local") -> dict:
    """Abort BEFORE execution when the estimate exceeds the budget
    (``memory_limit_bytes``; defaults to available physical RAM for local
    runs, cluster memory for distributed).  GDS's ``sudo`` escape = pass
    ``memory_limit_bytes=0`` to skip."""
    est = estimate_pregel_memory(graph, comp, num_partitions)
    limit = (memory_limit_bytes if memory_limit_bytes is not None
             else _available_memory_bytes(execution))
    if limit and est["total_bytes"] > limit:
        raise MemoryEstimationExceeded(
            f"estimated {est['total_bytes']:,} bytes exceeds the budget "
            f"{limit:,} bytes (state {est['state_bytes']:,} + shards "
            f"{est['shard_bytes']:,} + messages {est['message_bytes']:,}); "
            "raise memory_limit_bytes (or pass 0 to override, the GDS 'sudo')")
    return est


def run_pregel(graph: Graph, comp: Computation, *, max_iterations: int,
               execution: str = "auto", num_partitions: Optional[int] = None,
               checkpoint_dir: Optional[str] = None, checkpoint_interval: int = 1,
               resume: bool = False, local_threshold: int = 200_000,
               result_dir: Optional[str] = None,
               memory_limit_bytes: Optional[int] = None,
               payload_mode: Optional[str] = None) -> PregelResult:
    """Run a vertex computation to convergence (BSP driver loop —
    ref Pregel.run, pregel/.../Pregel.java:158-199).  See the module docstring
    for the three execution modes.

    ``result_dir``: when set (actor mode), each shard actor writes its own
    result partition parquet and the driver never materializes the result
    table (PregelResult.table is None) — the write-mode scale path.

    ``payload_mode``: "shared" (single-node default: one whole-range payload
    per producer, mapped zero-copy by every receiver) or "sliced" (per-receiver
    payload slices, the multi-node network shape).  Defaults to the
    ``GDS_PAYLOAD_MODE`` env var, else "shared"."""
    if payload_mode is None:
        payload_mode = os.environ.get("GDS_PAYLOAD_MODE", "shared")
    if comp.weighted and getattr(graph, "weight", None) is None and \
            not getattr(graph, "is_weighted", False):
        raise ValueError(
            f"{type(comp).__name__} has weighted=True but the graph carries "
            "no edge weights — results would silently fall back to "
            "unweighted messages")
    if payload_mode not in ("shared", "sliced", "grouped"):
        raise ValueError(f"unknown payload_mode {payload_mode!r}")
    if getattr(comp, "asynchronous", False):
        if comp.reducer is not None:
            raise ValueError(
                "asynchronous mode requires reducer=None — async delivery is "
                "defined on raw message queues (AsyncQueueMessenger.java); "
                "reducing computations use the double-buffered messenger")
        if execution not in ("auto", "local"):
            raise ValueError(
                "asynchronous queue mode is shared-memory only, like the "
                "reference (AsyncQueueMessenger.java has no distributed "
                "analogue — same-superstep visibility would serialize the "
                "shard actors); use execution='local'")
        if num_partitions is None:
            num_partitions = 1 if graph.n <= 50_000 else 8
        validate_memory(graph, comp, num_partitions, memory_limit_bytes,
                        execution="local")
        return _run_local_async(graph, comp, max_iterations, num_partitions,
                                checkpoint_dir, checkpoint_interval, resume)
    if execution == "auto":
        execution = "local" if graph.n <= local_threshold else "ray"
    if num_partitions is None:
        if execution == "local":
            num_partitions = 1 if graph.n <= 50_000 else 8
        else:
            # target ~250k-1M edges per shard actor, capped at the CPU count —
            # small graphs don't amortize actor overhead across many partitions
            import ray
            ncpu = int(ray.cluster_resources().get("CPU", 8))                 if ray.is_initialized() else 8
            num_partitions = max(1, min(ncpu, graph.num_edges // 250_000 + 1))
    validate_memory(graph, comp, num_partitions, memory_limit_bytes,
                    execution=execution)
    if execution == "local":
        return _run_local(graph, comp, max_iterations, num_partitions,
                          checkpoint_dir, checkpoint_interval, resume)
    if execution in ("ray", "ray-actors"):
        return _run_ray_actors(graph, comp, max_iterations, num_partitions,
                               checkpoint_dir, checkpoint_interval, resume,
                               result_dir=result_dir, payload_mode=payload_mode)
    if execution == "ray-data":
        return _run_ray(graph, comp, max_iterations, num_partitions,
                        checkpoint_dir, checkpoint_interval, resume)
    raise ValueError(f"unknown execution mode {execution!r}")


def _run_local(graph, comp, max_iterations, P, ckpt_dir, ckpt_interval, resume):
    from ..state.checkpoint import CheckpointManager

    bounds = graph.bounds(P, comp.orientation)
    shards = graph.shards(P, comp.orientation)
    nparts = len(bounds) - 1
    ckpt = CheckpointManager(ckpt_dir, comp) if ckpt_dir else None

    start_superstep = 0
    parts = []
    if ckpt and resume and (latest := ckpt.latest()) is not None:
        start_superstep = latest + 1
        t = ckpt.read_all(latest)
        for p in range(nparts):
            vids, st = _table_to_state(_resume_part(t, bounds, p), comp)
            parts.append((vids, st))
    else:
        for p in range(nparts):
            parts.append(_init_state_part(comp, p, int(bounds[p]), int(bounds[p + 1]),
                                          shards[p]))
        if ckpt:
            ckpt.write_local(0, [_state_table(p, v, s, comp)
                                 for p, (v, s) in enumerate(parts)], {})
    metrics = []
    converged = False
    superstep = max(start_superstep, 1)
    while True:
        it_limit = max_iterations if comp.count_init_as_iteration else max_iterations + 1
        if superstep >= it_limit:
            break
        t0 = time.perf_counter()
        outbox = []
        n_msgs = 0
        for p, (vids, st) in enumerate(parts):
            pl = scatter_global(comp, shards[p], graph.n, vids - shards[p].lo,
                                st["send"], st["skey"], st["sending"])
            n_msgs += _payload_count(pl)
            outbox.append(pl)
        sum_sending = 0
        sum_changed = 0
        scalars_acc = {c: 0.0 for c in comp.master_cols}
        for q, (vids, st) in enumerate(parts):
            msg = merge_payloads(comp, shards[q].lo, shards[q].hi, outbox)
            st["changed"][:] = 0
            comp.apply_part(vids, st, msg, superstep, shards[q])
            for c in comp.master_cols:
                scalars_acc[c] += float(st[c].sum())
        if _has_master(comp):
            for p, (vids, st) in enumerate(parts):
                comp.master_part(vids, st, scalars_acc, superstep)
        for _, st in parts:
            sum_sending += int(st["sending"].sum())
            sum_changed += int(st["changed"].sum())
        metrics.append({"superstep": superstep, "messages": int(n_msgs),
                        "sending": sum_sending, "changed": sum_changed,
                        "sec": time.perf_counter() - t0})
        if ckpt and superstep % ckpt_interval == 0:
            ckpt.write_local(superstep,
                             [_state_table(p, v, s, comp)
                              for p, (v, s) in enumerate(parts)], metrics[-1])
        if _converged(comp, superstep, sum_sending, sum_changed):
            converged = True
            break
        superstep += 1
    ran = _ran_iterations(comp, superstep, converged, max_iterations)
    return _result_from_parts(comp, [v for v, _ in parts], [s for _, s in parts],
                              ran, converged, metrics)


def _run_local_async(graph, comp, max_iterations, P, ckpt_dir, ckpt_interval,
                     resume):
    """Asynchronous queue-mode executor — the AsyncQueueMessenger.java
    analogue (SURVEY §2.2 row 20, the last uncovered messenger).

    ONE shared message pool instead of double-buffered queues: partitions are
    swept in fixed vid order within a superstep; each partition consumes
    everything pending for it (messages from earlier partitions in THIS sweep
    plus leftovers from the previous one) and scatters its sends immediately,
    so later partitions in the sweep see them in the same superstep.  A fixed
    sweep is one valid interleaving of the reference's thread-nondeterministic
    async schedule, chosen so results are reproducible.

    Resume needs no extra persistence: st["send"]/"sending" are not touched
    between a partition's scatter and its next apply, so the in-flight
    payloads at a sweep boundary are exactly re-derivable from checkpointed
    state — pending[q] = {scatter(state_r) : r >= q} (every payload scattered
    at or after q's turn last sweep), or all r at the initial checkpoint."""
    from ..state.checkpoint import CheckpointManager

    bounds = graph.bounds(P, comp.orientation)
    shards = graph.shards(P, comp.orientation)
    nparts = len(bounds) - 1
    ckpt = CheckpointManager(ckpt_dir, comp) if ckpt_dir else None

    start_superstep = 0
    parts = []
    latest = ckpt.latest() if (ckpt and resume) else None
    if latest is not None:
        start_superstep = latest + 1
        t = ckpt.read_all(latest)
        for p in range(nparts):
            vids, st = _table_to_state(_resume_part(t, bounds, p), comp)
            parts.append((vids, st))
    else:
        for p in range(nparts):
            parts.append(_init_state_part(comp, p, int(bounds[p]),
                                          int(bounds[p + 1]), shards[p]))
        if ckpt:
            ckpt.write_local(0, [_state_table(p, v, s, comp)
                                 for p, (v, s) in enumerate(parts)], {})

    def _scatter(q):
        vids, st = parts[q]
        return scatter_global(comp, shards[q], graph.n, vids - shards[q].lo,
                              st["send"], st["skey"], st["sending"])

    payloads = [_scatter(q) for q in range(nparts)]
    if latest is None or latest == 0:
        # initial condition: every partition computed superstep 0 before any
        # delivery — all payloads pending for everyone
        pending = [[pl for pl in payloads if pl is not None]
                   for _ in range(nparts)]
    else:
        # sweep boundary: q consumed payloads of partitions before it
        pending = [[payloads[r] for r in range(q, nparts)
                    if payloads[r] is not None] for q in range(nparts)]

    metrics = []
    converged = False
    superstep = max(start_superstep, 1)
    while True:
        it_limit = (max_iterations if comp.count_init_as_iteration
                    else max_iterations + 1)
        if superstep >= it_limit:
            break
        t0 = time.perf_counter()
        n_msgs = 0
        scalars_acc = {c: 0.0 for c in comp.master_cols}
        for q, (vids, st) in enumerate(parts):
            msg = merge_payloads(comp, shards[q].lo, shards[q].hi, pending[q])
            pending[q] = []
            st["changed"][:] = 0
            comp.apply_part(vids, st, msg, superstep, shards[q])
            for c in comp.master_cols:
                scalars_acc[c] += float(st[c].sum())
            pl = _scatter(q)  # deliver immediately: later partitions in this
            if pl is not None:  # sweep consume it within the same superstep
                n_msgs += _payload_count(pl)
                for r in range(nparts):
                    pending[r].append(pl)
        if _has_master(comp):
            for p, (vids, st) in enumerate(parts):
                comp.master_part(vids, st, scalars_acc, superstep)
        sum_sending = sum(int(st["sending"].sum()) for _, st in parts)
        sum_changed = sum(int(st["changed"].sum()) for _, st in parts)
        metrics.append({"superstep": superstep, "messages": int(n_msgs),
                        "sending": sum_sending, "changed": sum_changed,
                        "sec": time.perf_counter() - t0})
        if ckpt and superstep % ckpt_interval == 0:
            ckpt.write_local(superstep,
                             [_state_table(p, v, s, comp)
                              for p, (v, s) in enumerate(parts)], metrics[-1])
        if _converged(comp, superstep, sum_sending, sum_changed):
            converged = True
            break
        superstep += 1
    ran = _ran_iterations(comp, superstep, converged, max_iterations)
    return _result_from_parts(comp, [v for v, _ in parts],
                              [s for _, s in parts], ran, converged, metrics)


def _run_ray(graph, comp, max_iterations, P, ckpt_dir, ckpt_interval, resume):
    import ray
    import ray.data
    from ray.data.aggregate import Sum

    from ..state.checkpoint import CheckpointManager
    _ensure_comp_picklable(comp)

    bounds = graph.bounds(P, comp.orientation)
    shards_refs = _shard_handles(graph, P, comp.orientation)
    nparts = len(bounds) - 1
    ckpt = CheckpointManager(ckpt_dir, comp) if ckpt_dir else None

    start_superstep = 0
    state_ds = None
    if ckpt and resume and (latest := ckpt.latest()) is not None:
        start_superstep = latest + 1
        # the checkpoint dir also holds manifest.json — read only the parts
        state_ds = ray.data.read_parquet(ckpt.part_files(latest)).materialize()
    else:
        # per-partition init as remote tasks: each task resolves/loads only its
        # own shard — the driver never holds edge data
        @ray.remote
        def _init_table(p, lo, hi, handle):
            vids, st = _init_state_part(comp, p, lo, hi, _resolve_shard(handle))
            return _state_table(p, vids, st, comp)

        refs = [_init_table.remote(p, int(bounds[p]), int(bounds[p + 1]),
                                   shards_refs[p]) for p in range(nparts)]
        state_ds = ray.data.from_arrow_refs(refs)
        if ckpt:
            ckpt.write_ray(0, state_ds, {})
    metrics = []
    converged = False
    superstep = max(start_superstep, 1)
    while True:
        it_limit = max_iterations if comp.count_init_as_iteration else max_iterations + 1
        if superstep >= it_limit:
            break
        t0 = time.perf_counter()
        msgs = state_ds.map_batches(
            _ScatterWorker(comp, shards_refs, bounds),
            batch_format="pyarrow", zero_copy_batch=True)
        unioned = state_ds.union(msgs)
        # `part` is already the partition id, so the apply combine rides the
        # known-partitioner exchange: one output block per partition (the
        # union's block-count doubling and the old sampled-sort groupby are
        # both gone), and from_arrow_refs cuts the lineage so the plan stays
        # O(1) per superstep.
        from ..stages.exchange import grouped_exchange
        state_ds = grouped_exchange(
            unioned, "part", nparts,
            _ApplyWorker(comp, shards_refs, bounds, superstep))
        if _has_master(comp):
            # master pass rewrites state, so sending/changed sums are only
            # meaningful AFTER it — fetch just the master-col sums first
            # (one aggregate each, not a discarded sending/changed pass)
            maggs = state_ds.aggregate(
                *[Sum(c, alias_name=f"m_{c}") for c in comp.master_cols])
            scalars = {c: float(maggs.get(f"m_{c}") or 0.0)
                       for c in comp.master_cols}
            state_ds = state_ds.map_batches(
                _MasterWorker(comp, scalars, superstep, bounds),
                batch_format="pyarrow", zero_copy_batch=True).materialize()
        aggs = state_ds.aggregate(Sum("sending", alias_name="s"),
                                  Sum("changed", alias_name="c"))
        sum_sending = int(aggs.get("s") or 0)
        sum_changed = int(aggs.get("c") or 0)
        metrics.append({"superstep": superstep, "sending": sum_sending,
                        "changed": sum_changed, "sec": time.perf_counter() - t0})
        if ckpt and superstep % ckpt_interval == 0:
            ckpt.write_ray(superstep, state_ds, metrics[-1])
        if _converged(comp, superstep, sum_sending, sum_changed):
            converged = True
            break
        superstep += 1
    out_cols = ["vid"] + [c for c in comp.output_cols.values()]
    final = state_ds.select_columns(out_cols).materialize().to_arrow_refs()
    tables = [t for t in (ray.get(r) for r in final)
              if t.num_rows > 0 and t.num_columns > 0]
    tbl = pa.concat_tables(tables)
    rename = {v: k for k, v in comp.output_cols.items()}
    tbl = tbl.rename_columns([rename.get(c, c) for c in tbl.column_names])
    order = np.argsort(tbl.column("vid").to_numpy(zero_copy_only=False), kind="stable")
    tbl = tbl.take(pa.array(order))
    ran = _ran_iterations(comp, superstep, converged, max_iterations)
    return PregelResult(tbl, ran, converged, metrics)


# --------------------------------------------------------------------------------
# persistent shard-actor BSP (the throughput path)
# --------------------------------------------------------------------------------

class _ShardActor:
    """One actor per partition: owns the CSR shard (zero-copy plasma view) and
    its slice of vertex state; runs one fused apply+scatter per superstep.  The
    distributed analogue of a GDS PartitionedComputeStep that keeps its state
    across iterations (pregel/.../PartitionedComputer.java:96-123)."""

    def __init__(self, comp, shard_ref, p, bounds):
        # in-memory graphs: a top-level ObjectRef arg is auto-resolved by Ray —
        # the shard arrives as a zero-copy plasma view.  Parquet-backed graphs:
        # a ShardSpec arrives and the actor loads its OWN partition files here
        # (once per actor lifetime; restart = reload — retry-safe by design).
        self.shard = _resolve_shard(shard_ref)
        self.comp = comp
        self.p = p
        self.bounds = np.asarray(bounds)
        self.nparts = len(self.bounds) - 1
        self.vids = None
        self.st = None

    def init(self):
        self.vids, self.st = _init_state_part(
            self.comp, self.p, int(self.bounds[self.p]),
            int(self.bounds[self.p + 1]), self.shard)
        return int(self.st["sending"].sum())

    def reset(self, comp):
        """Replace the computation and clear per-run state, KEEPING the loaded
        CSR shard — the pool-reuse path (GDS holds a cataloged graph in memory
        across algorithm calls; a long-lived engine likewise keeps its shard
        actors warm instead of re-paying fork + import + CSR load per run)."""
        self.comp = comp
        self.vids = None
        self.st = None
        return self.p

    def load_state(self, table: pa.Table):
        self.vids, self.st = _table_to_state(table, self.comp)
        return int(self.st["sending"].sum())

    def scatter(self):
        return scatter_global(self.comp, self.shard, int(self.bounds[-1]),
                              self.vids - self.shard.lo, self.st["send"],
                              self.st["skey"], self.st["sending"])

    def apply(self, superstep, *payloads):
        msg = merge_payloads(self.comp, self.shard.lo, self.shard.hi,
                             list(payloads))
        self.st["changed"][:] = 0
        self.comp.apply_part(self.vids, self.st, msg, superstep, self.shard)
        stats = {"sending": int(self.st["sending"].sum()),
                 "changed": int(self.st["changed"].sum()),
                 # vertices with >= 1 incoming message this superstep (the
                 # pre-combined exchange makes raw edge-message counts
                 # unobservable here by design — receivers see combined
                 # per-vertex payloads)
                 "messages": _msg_count(msg)}
        for c in self.comp.master_cols:
            stats[f"m_{c}"] = float(self.st[c].sum())
        return stats

    def step(self, superstep, *payloads):
        """Fused superstep: apply incoming messages, then scatter the updated
        state — ONE actor RPC round and ONE outgoing payload per superstep."""
        stats = self.apply(superstep, *payloads)
        return stats, self.scatter()

    def scatter_sliced(self):
        """Initial scatter, cut into P per-receiver slices (num_returns=P)."""
        return tuple(slice_payload(self.comp, self.scatter(), self.bounds))

    def step_sliced(self, superstep, *payloads):
        """Fused superstep in sliced-payload mode: each of the P return slots
        carries ONLY receiver q's vid range (``num_returns=1+P``), so on a
        multi-node cluster total network bytes per superstep are O(n + m_sparse)
        instead of O(P·n) — the shape the scatter_global docstring promises."""
        stats = self.apply(superstep, *payloads)
        return (stats, *slice_payload(self.comp, self.scatter(), self.bounds))

    def scatter_grouped(self, group_bounds):
        """Initial scatter cut into K per-node-group slices (num_returns=K)."""
        return tuple(slice_payload_grouped(self.comp, self.scatter(),
                                           np.asarray(group_bounds)))

    def step_grouped(self, superstep, group_bounds, *payloads):
        """Fused superstep in grouped-payload mode: K return slots, one per
        NODE group of contiguous partitions — co-located receivers share their
        group's slice zero-copy, so the object count per superstep is O(P·K)
        instead of O(P²) while network bytes stay O(K·n) worst-case dense
        (O(n) when K tracks the node count)."""
        stats = self.apply(superstep, *payloads)
        return (stats, *slice_payload_grouped(self.comp, self.scatter(),
                                              np.asarray(group_bounds)))

    def master(self, scalars, superstep):
        self.comp.master_part(self.vids, self.st, scalars, superstep)
        return {"sending": int(self.st["sending"].sum()),
                "changed": int(self.st["changed"].sum())}

    def publish_shard(self) -> CsrShard:
        """Return the built CSR shard (lands in the object store as this
        call's result) so the graph handle can cache it for later runs."""
        return self.shard

    def state_table(self) -> pa.Table:
        return _state_table(self.p, self.vids, self.st, self.comp)

    def save_part(self, tmp_dir: str) -> str:
        import os

        import pyarrow.parquet as pq
        path = os.path.join(tmp_dir, f"part-{self.p:05d}.parquet")
        pq.write_table(self.state_table(), path)
        return path

    def result_table(self) -> pa.Table:
        cols = {"vid": self.vids}
        for out_name, st_name in self.comp.output_cols.items():
            cols[out_name] = self.st[st_name]
        return pa.table(cols)

    def write_result(self, d: str) -> str:
        import os

        import pyarrow.parquet as pq
        path = os.path.join(d, f"part-{self.p:05d}.parquet")
        pq.write_table(self.result_table(), path)
        return path


def release_actor_pool(graph) -> None:
    """Kill a graph handle's cached shard-actor pool (GDS_ACTOR_POOL_CACHE=1)
    and free its pinned CPUs.  No-op when nothing is cached.  Call between
    pipeline stages that move to a different graph — a live pool reserves
    one CPU per partition for as long as it (or the graph handle) lives."""
    import ray
    pool = getattr(graph, "_actor_pool", None)
    if pool:
        for w in pool[1]:
            try:
                ray.kill(w)
            except Exception:
                pass
        graph._actor_pool = None


def _run_ray_actors(graph, comp, max_iterations, P, ckpt_dir, ckpt_interval,
                    resume, result_dir=None, payload_mode: str = "shared"):
    """``payload_mode``: "shared" (default) publishes ONE whole-range payload
    per producer per superstep — P objects, each mapped zero-copy by every
    receiver on the same node; "sliced" cuts each payload into P per-receiver
    slices (``num_returns=1+P``) so a receiver is shipped only its own vid
    range — the multi-node network shape (O(n) bytes/superstep, not O(P·n)).
    Results are bit-identical; see test_payload_modes."""
    import ray

    from ..state.checkpoint import CheckpointManager
    _ensure_comp_picklable(comp)

    timing = os.environ.get("GDS_RAY_TIMING") == "1"
    tmark = time.perf_counter()
    phase_sec: dict = {}

    def _phase(name):
        nonlocal tmark
        now = time.perf_counter()
        phase_sec[name] = phase_sec.get(name, 0.0) + (now - tmark)
        if timing:
            print(f"[pregel-timing] {name}: {now - tmark:.2f}s",
                  file=sys.stderr, flush=True)
        tmark = now

    bounds = graph.bounds(P, comp.orientation)
    shard_refs = _shard_handles(graph, P, comp.orientation)
    _phase("shard_handles")
    nparts = len(bounds) - 1
    ckpt = CheckpointManager(ckpt_dir, comp) if ckpt_dir else None

    # Opt-in actor-pool cache (GDS_ACTOR_POOL_CACHE=1): a long-lived engine
    # keeps its shard actors warm across runs on the same graph — fork +
    # heavy imports + CSR build are one-time costs, and back-to-back
    # algorithm calls (the graph-catalog usage shape) pay only reset+init.
    # Opt-in because a cached pool PINS nparts CPUs while it lives; callers
    # running mixed pipelines must release_actor_pool(graph) between stages
    # (the pool also dies with the graph handle via normal Ray actor GC).
    cache_pool = os.environ.get("GDS_ACTOR_POOL_CACHE") == "1"
    pool_key = (comp.orientation, nparts)
    workers = None
    if cache_pool:
        pool = getattr(graph, "_actor_pool", None)
        if pool is not None and pool[0] == pool_key:
            try:
                ray.get([w.reset.remote(comp) for w in pool[1]])
                workers = pool[1]
            except Exception:  # a dead/killed actor: fall through to respawn
                workers = None
        if workers is None and pool is not None:
            release_actor_pool(graph)
    if workers is None:
        Worker = ray.remote(num_cpus=1)(_ShardActor)
        workers = [Worker.remote(comp, shard_refs[p], p, bounds)
                   for p in range(nparts)]

    start_superstep = 0
    if ckpt and resume and (latest := ckpt.latest()) is not None:
        start_superstep = latest + 1
        t = ckpt.read_all(latest)
        ray.get([workers[p].load_state.remote(_resume_part(t, bounds, p))
                 for p in range(nparts)])
    else:
        ray.get([w.init.remote() for w in workers])
        if ckpt:
            _ckpt_actors(ckpt, workers, 0, {})
    if (isinstance(graph, ParquetGraph)
            and (comp.orientation, nparts) not in graph._shard_ref_cache
            and any(isinstance(h, ShardSpec) for h in shard_refs)):
        # publish each actor's freshly built CSR to the object store and cache
        # the refs on the graph handle: the NEXT run on this graph maps them
        # zero-copy instead of re-reading the layout (GDS graph-catalog shape).
        # ray.get before the actors can be killed — a killed actor's pending
        # return would be lost.
        pub = [w.publish_shard.remote() for w in workers]
        ray.wait(pub, num_returns=len(pub))
        graph._shard_ref_cache[(comp.orientation, nparts)] = \
            list(zip(pub, shard_refs))
    _phase("spawn+load+init")
    metrics = []
    converged = False
    converged_at = None
    superstep = max(start_superstep, 1)
    it_limit = max_iterations if comp.count_init_as_iteration else max_iterations + 1
    outbox = None
    has_master = _has_master(comp)
    # Pipelined stepping: for computations where a post-convergence superstep is a
    # mathematical no-op (nothing is sent once all vertices halt — PR, WCC, BFS),
    # the driver keeps `lag` supersteps in flight and checks convergence on a
    # delayed stats stream; this hides the per-superstep driver round-trip.
    # Explicit opt-in via Computation.idempotent_on_empty (built-ins set it);
    # master-compute, always-active, and checkpointed runs stay synchronous.
    lag = 2 if (comp.idempotent_on_empty and not ckpt and not has_master
                and not comp.always_active) else 0

    sliced = payload_mode == "sliced" and nparts > 1
    # grouped = the cluster deployment shape: one slice per NODE group of
    # contiguous partitions (GDS_PAYLOAD_GROUPS, default 4 "nodes"), receivers
    # in a group share their slice zero-copy.  K must be >= 2 (K == 1 IS the
    # shared whole-range mode) and <= nparts (K == nparts IS sliced mode).
    grouped = payload_mode == "grouped" and nparts > 1
    if grouped:
        K = int(os.environ.get("GDS_PAYLOAD_GROUPS", "0")) or min(4, nparts)
        K = max(2, min(K, nparts))
        gcut = np.linspace(0, nparts, K + 1).astype(int)  # partition indices
        group_bounds = np.asarray(bounds)[gcut]
        group_of = np.searchsorted(gcut, np.arange(nparts), side="right") - 1

    def _submit(step_s):
        nonlocal outbox
        if grouped:
            if outbox is None:  # outbox[p][g] = producer p's slice for node-group g
                outbox = [w.scatter_grouped.options(num_returns=K)
                          .remote(group_bounds) for w in workers]
            stepped = [
                workers[q].step_grouped.options(num_returns=1 + K).remote(
                    step_s, group_bounds,
                    *[outbox[p][group_of[q]] for p in range(nparts)])
                for q in range(nparts)]
            outbox = [r[1:] for r in stepped]
            return [r[0] for r in stepped]
        if sliced:
            if outbox is None:  # outbox[p][q] = producer p's slice for receiver q
                outbox = [w.scatter_sliced.options(num_returns=nparts).remote()
                          for w in workers]
            stepped = [
                workers[q].step_sliced.options(num_returns=1 + nparts).remote(
                    step_s, *[outbox[p][q] for p in range(nparts)])
                for q in range(nparts)]
            outbox = [r[1:] for r in stepped]
            return [r[0] for r in stepped]
        if outbox is None:  # first superstep after init/resume: initial scatter
            outbox = [w.scatter.remote() for w in workers]
        stepped = [workers[q].step.options(num_returns=2).remote(step_s, *outbox)
                   for q in range(nparts)]
        outbox = [r[1] for r in stepped]
        return [r[0] for r in stepped]

    inflight = []
    next_submit = superstep
    while True:
        while (converged_at is None and next_submit < it_limit
               and len(inflight) <= lag):
            inflight.append((next_submit, _submit(next_submit), time.perf_counter()))
            next_submit += 1
        if not inflight:
            break
        s0, stat_refs, t0 = inflight.pop(0)
        stats = ray.get(stat_refs)
        sum_sending = sum(s["sending"] for s in stats)
        sum_changed = sum(s["changed"] for s in stats)
        n_msgs = sum(s["messages"] for s in stats)
        if has_master:
            scalars = {c: sum(s.get(f"m_{c}", 0.0) for s in stats)
                       for c in comp.master_cols}
            mstats = ray.get([w.master.remote(scalars, s0) for w in workers])
            sum_sending = sum(s["sending"] for s in mstats)
            sum_changed = sum(s["changed"] for s in mstats)
        if converged_at is None:  # drained speculative steps don't pollute metrics
            metrics.append({"superstep": s0, "messages": n_msgs,
                            "sending": sum_sending, "changed": sum_changed,
                            "sec": time.perf_counter() - t0})
        if ckpt and s0 % ckpt_interval == 0:
            _ckpt_actors(ckpt, workers, s0, metrics[-1])
        if converged_at is None and _converged(comp, s0, sum_sending, sum_changed):
            converged = True
            converged_at = s0
    superstep = converged_at if converged_at is not None else it_limit
    ran = _ran_iterations(comp, superstep, converged, max_iterations)
    _phase("supersteps")
    if result_dir is not None:
        # actors write their own result partitions — nothing flows to the driver
        os.makedirs(result_dir, exist_ok=True)
        ray.get([w.write_result.remote(result_dir) for w in workers])
        if cache_pool:
            graph._actor_pool = (pool_key, workers)
        else:
            for w in workers:
                ray.kill(w)
        _phase("write_result")
        return PregelResult(None, ran, converged, metrics,
                            setup_sec=phase_sec.get("spawn+load+init", 0.0),
                            steps_sec=phase_sec.get("supersteps", 0.0))
    tbl = pa.concat_tables(ray.get([w.result_table.remote() for w in workers]))
    order = np.argsort(tbl.column("vid").to_numpy(zero_copy_only=False), kind="stable")
    tbl = tbl.take(pa.array(order))
    if cache_pool:
        graph._actor_pool = (pool_key, workers)
    else:
        for w in workers:
            ray.kill(w)
    return PregelResult(tbl, ran, converged, metrics,
                        setup_sec=phase_sec.get("spawn+load+init", 0.0),
                        steps_sec=phase_sec.get("supersteps", 0.0))


def _ckpt_actors(ckpt, workers, iteration, metrics):
    """Actors write their own partition files; the driver only finalizes the
    manifest (atomic rename) — no state flows through the driver."""
    import os
    import shutil

    import ray
    tmp = os.path.join(ckpt.base, f".tmp-iter={iteration}")
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    os.makedirs(tmp)
    ray.get([w.save_part.remote(tmp) for w in workers])
    ckpt._finalize(tmp, ckpt.part_dir(iteration), iteration, metrics)
