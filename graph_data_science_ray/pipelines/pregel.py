"""Bulk-synchronous (Pregel-style) vertex computation runner on Ray Data.

This is the Ray-native re-expression of the reference's Pregel framework
(pregel/src/main/java/org/neo4j/gds/beta/pregel/Pregel.java:56-79,158-199):

  * per-vertex state lives in a ``state`` Dataset (part, vid, ...columns) — the
    analogue of Pregel ``NodeValue`` arrays (pregel/.../NodeValue.java:46-73);
  * one superstep = one Dataset pipeline:

      1. **scatter** — ``state.map_batches(_ScatterWorker, batch_format="pyarrow")``
         pushes each sending vertex's value along its CSR shard out-edges and
         *pre-combines* messages per destination inside the batch — the analogue of
         GDS's ReducingMessenger partial combine (pregel/.../ReducingMessenger.java:77-82);
      2. **combine+apply** — the message stream is unioned with the state stream and
         ``groupby("part").map_groups(_ApplyWorker)`` performs the wide shuffle
         (messages meet their destination partition) followed by the final reduce
         (dense ``np.add.at`` / ``np.minimum.at`` per local vid) and the vertex
         update — GDS's message-combine + compute step
         (pregel/.../PartitionedComputer.java:96-123);
      3. **convergence** — tiny global aggregates (sum of ``sending`` / ``changed``)
         mirror vote-to-halt convergence (PartitionedComputer.hasConverged, :77-85).

  Because scatter pre-combines per source partition, any destination vertex receives
  at most P partial messages per superstep regardless of its in-degree — this is the
  hub-skew guard (a power-law hub's million in-edges collapse to ≤P rows before the
  shuffle), complementing the degree-balanced edge partitioning in state/graph.py.

A single-process fast path (``execution="local"``) runs the *same* scatter/apply
kernels in a driver loop over the same partition structure — used for small graphs
and as the test oracle for the distributed path (results agree to 1e-6; integer
results exactly).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Optional

import numpy as np
import pyarrow as pa

from ..state.graph import CsrShard, Graph

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
    reducer = "sum"              # "sum" | "min" — message combine
    keyed = False                # True ⇒ messages are (key, val); combine = per-key sum
    weighted = False             # multiply messages by edge weight (applyRelationshipWeight)
    scatter_remote_only = False  # True ⇒ skip intra-partition targets (handled in apply)
    always_active = False        # every vertex scatters every superstep (LPA, eigenvector)
    count_init_as_iteration = True   # superstep 0 counts toward ranIterations (Pregel yes)
    state_spec: list = []        # [(name, np.dtype)] algorithm state columns
    output_cols: dict = {}       # result column name -> state column name
    master_cols: list = []       # state cols summed globally between supersteps

    def init_part(self, vids: np.ndarray, shard: CsrShard, st: dict) -> None:
        raise NotImplementedError

    def apply_part(self, vids, st, msg, superstep: int, shard: CsrShard) -> None:
        raise NotImplementedError

    def master_part(self, vids, st, scalars: dict, superstep: int) -> None:
        pass


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
class PregelResult:
    table: pa.Table
    ran_iterations: int
    did_converge: bool
    metrics: list = field(default_factory=list)

    def to_pandas(self):
        return self.table.to_pandas()


# --------------------------------------------------------------------------------
# kernels shared by the local and distributed paths
# --------------------------------------------------------------------------------

def scatter_kernel(comp: Computation, shard: CsrShard, local: np.ndarray,
                   send: np.ndarray, skey: np.ndarray, sending: np.ndarray):
    """Push ``send`` values of sending vertices along shard out-edges; pre-combine
    per destination (per (dst, key) when keyed).  Returns (dst, key|None, val)."""
    mask = sending != 0
    srcs = local[mask]
    if srcs.shape[0] == 0:
        e = np.empty(0, dtype=np.int64)
        return e, (e if comp.keyed else None), np.empty(0, dtype=np.float64)
    idx, lens = shard.neighbors_flat(srcs)
    dst = shard.indices[idx]
    vals = np.repeat(send[mask], lens)
    if comp.weighted and shard.weights is not None:
        vals = vals * shard.weights[idx]
    if comp.scatter_remote_only:
        remote = (dst < shard.lo) | (dst >= shard.hi)
        dst, vals = dst[remote], vals[remote]
        if comp.keyed:
            keys_all = np.repeat(skey[mask], lens)[remote]
            if dst.shape[0] == 0:
                e = np.empty(0, dtype=np.int64)
                return e, e, np.empty(0, dtype=np.float64)
            order = np.lexsort((keys_all, dst))
            dst, keys_all, vals = dst[order], keys_all[order], vals[order]
            run = np.empty(dst.shape[0], dtype=bool)
            run[0] = True
            run[1:] = (dst[1:] != dst[:-1]) | (keys_all[1:] != keys_all[:-1])
            starts = np.nonzero(run)[0]
            return dst[starts], keys_all[starts], np.add.reduceat(vals, starts)
        lens = None  # fallthrough to unkeyed combine below
    if comp.keyed:
        keys = np.repeat(skey[mask], lens)
        order = np.lexsort((keys, dst))
        dst, keys, vals = dst[order], keys[order], vals[order]
        run = np.empty(dst.shape[0], dtype=bool)
        run[0] = True
        run[1:] = (dst[1:] != dst[:-1]) | (keys[1:] != keys[:-1])
        starts = np.nonzero(run)[0]
        return dst[starts], keys[starts], np.add.reduceat(vals, starts)
    uq, inv = np.unique(dst, return_inverse=True)
    if comp.reducer == "sum":
        out = np.bincount(inv, weights=vals)
    elif comp.reducer == "min":
        out = np.full(uq.shape[0], np.inf)
        np.minimum.at(out, inv, vals)
    else:
        raise ValueError(f"unknown reducer {comp.reducer}")
    return uq, None, out


def combine_messages(comp: Computation, lo: int, nloc: int,
                     m_vid: np.ndarray, m_key, m_val: np.ndarray):
    """Final combine of (possibly partial) messages into the dense partition layout."""
    if comp.keyed:
        local = m_vid - lo
        if local.shape[0] == 0:
            return KeyedMsg(local, m_key, m_val)
        order = np.lexsort((m_key, local))
        local, key, val = local[order], m_key[order], m_val[order]
        run = np.empty(local.shape[0], dtype=bool)
        run[0] = True
        run[1:] = (local[1:] != local[:-1]) | (key[1:] != key[:-1])
        starts = np.nonzero(run)[0]
        return KeyedMsg(local[starts], key[starts], np.add.reduceat(val, starts))
    has = np.zeros(nloc, dtype=bool)
    local = m_vid - lo
    has[local] = True
    if comp.reducer == "sum":
        vals = np.zeros(nloc, dtype=np.float64)
        np.add.at(vals, local, m_val)
    else:
        vals = np.full(nloc, np.inf)
        np.minimum.at(vals, local, m_val)
    return NonKeyedMsg(vals, has)


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
# distributed workers (map_batches / map_groups callables)
# --------------------------------------------------------------------------------

class _ScatterWorker:
    """Actor-pool stage: holds zero-copy views of the CSR shards it has served
    (``ray.get`` of a plasma ref mmaps the numpy buffers — load once per actor,
    GDS's 'CSR shared across threads' analogue)."""

    def __init__(self, comp, shard_refs, bounds):
        self.comp = comp
        self.shard_refs = shard_refs
        self.bounds = np.asarray(bounds)
        self._cache = {}

    def _shard(self, p):
        if p not in self._cache:
            import ray
            self._cache[p] = ray.get(self.shard_refs[p])
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
    """map_groups stage, one group per partition: final message combine + vertex
    update (GDS ComputeStep.computeBatch analogue, pregel/.../ComputeStep.java:76-102)."""

    def __init__(self, comp, shard_refs, bounds, superstep):
        self.comp = comp
        self.shard_refs = shard_refs
        self.bounds = np.asarray(bounds)
        self.superstep = superstep
        self._cache = {}
        self.__name__ = "pregel_apply"  # map_groups requires a __name__ on the UDF

    def __call__(self, group: pa.Table) -> pa.Table:
        comp = self.comp
        is_msg = group.column("is_msg").to_numpy(zero_copy_only=False).astype(bool)
        state_t = group.filter(pa.array(~is_msg))
        if state_t.num_rows == 0:   # stray message-only group (shouldn't happen)
            return _state_table(0, np.empty(0, np.int64),
                                {k: np.empty(0, d) for k, d in
                                 list(comp.state_spec) + _RUNNER_COLS}, comp)
        p = int(state_t.column("part")[0].as_py())
        lo, hi = int(self.bounds[p]), int(self.bounds[p + 1])
        vids, st = _table_to_state(state_t, comp)
        msg_t = group.filter(pa.array(is_msg))
        m_vid = msg_t.column("vid").to_numpy(zero_copy_only=False)
        m_key = msg_t.column("m_key").to_numpy(zero_copy_only=False)
        m_val = msg_t.column("m_val").to_numpy(zero_copy_only=False)
        msg = combine_messages(comp, lo, hi - lo, m_vid, m_key, m_val)
        st["changed"][:] = 0
        if p not in self._cache:
            import ray
            self._cache[p] = ray.get(self.shard_refs[p])
        comp.apply_part(vids, st, msg, self.superstep, self._cache[p])
        return _state_table(p, vids, st, comp)


class _MasterWorker:
    def __init__(self, comp, scalars, superstep, bounds):
        self.comp = comp
        self.scalars = scalars
        self.superstep = superstep
        self.bounds = np.asarray(bounds)

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

def run_pregel(graph: Graph, comp: Computation, *, max_iterations: int,
               execution: str = "auto", num_partitions: Optional[int] = None,
               checkpoint_dir: Optional[str] = None, checkpoint_interval: int = 1,
               resume: bool = False, local_threshold: int = 200_000) -> PregelResult:
    """Run a vertex computation to convergence (BSP driver loop —
    ref Pregel.run, pregel/.../Pregel.java:158-199).

    Execution modes:
      * ``local``    — single-process driver loop over the partition kernels (small
        graphs; also the conformance oracle for the distributed modes);
      * ``ray``      — persistent shard-actor BSP: one actor per partition holds its
        CSR shard + state; supersteps exchange pre-combined message partials
        directly through the object store (two actor RPC rounds per superstep).
        This is the throughput path: the per-superstep message exchange is a fixed
        task graph over a *shared mutable per-partition index* — the one pattern
        the Dataset API cannot express without paying its full per-pipeline fixed
        cost ~40× per run;
      * ``ray-data`` — every superstep as a Dataset pipeline
        (map_batches scatter → union → groupby(part).map_groups apply), exactly the
        north-star formulation; identical results, higher per-superstep latency.
        Use for one-shot/streaming integration and as a cross-check.
    """
    if execution == "auto":
        execution = "local" if graph.n <= local_threshold else "ray"
    if num_partitions is None:
        num_partitions = 1 if execution == "local" and graph.n <= 50_000 else 8
    if execution == "local":
        return _run_local(graph, comp, max_iterations, num_partitions,
                          checkpoint_dir, checkpoint_interval, resume)
    if execution in ("ray", "ray-actors"):
        return _run_ray_actors(graph, comp, max_iterations, num_partitions,
                               checkpoint_dir, checkpoint_interval, resume)
    if execution == "ray-data":
        return _run_ray(graph, comp, max_iterations, num_partitions,
                        checkpoint_dir, checkpoint_interval, resume)
    raise ValueError(f"unknown execution mode {execution!r}")


def _ensure_comp_picklable(comp):
    """User extensions (SURVEY.md §2.7) may live in modules that Ray workers
    cannot import (scripts, test files).  Register such modules for
    pickle-by-value so the Computation ships with the task instead of by
    reference."""
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
    """GDS counting: Pregel's ranIterations is the 0-based iteration index at which
    convergence was detected (Pregel.java:166-195 — ``break`` before increment), or
    maxIterations when the loop ran out.  Our superstep numbering matches Pregel's
    iteration numbering (init == superstep 0)."""
    return superstep if converged else max_iterations


def _result_from_parts(comp, parts_vids, parts_st, ran, converged, metrics):
    cols = {"vid": np.concatenate(parts_vids) if parts_vids else np.empty(0, np.int64)}
    for out_name, st_name in comp.output_cols.items():
        cols[out_name] = np.concatenate([st[st_name] for st in parts_st])
    return PregelResult(pa.table(cols), ran, converged, metrics)


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
        pcol = t.column("part").to_numpy(zero_copy_only=False)
        for p in range(nparts):
            sub = t.filter(pa.array(pcol == p))
            vids, st = _table_to_state(sub, comp)
            parts.append((vids, st))
    else:
        for p in range(nparts):
            parts.append(_init_state_part(comp, p, int(bounds[p]), int(bounds[p + 1]),
                                          shards[p]))
    metrics = []
    converged = False
    superstep = start_superstep
    if superstep == 0:
        if ckpt and 0 % ckpt_interval == 0:
            ckpt.write_local(0, [_state_table(p, v, s, comp) for p, (v, s) in enumerate(parts)], {})
        superstep = 1
    while True:
        it_limit = max_iterations if comp.count_init_as_iteration else max_iterations + 1
        if superstep >= it_limit:
            break
        t0 = time.perf_counter()
        outbox_vid = [[] for _ in range(nparts)]
        outbox_key = [[] for _ in range(nparts)]
        outbox_val = [[] for _ in range(nparts)]
        n_msgs = 0
        for p, (vids, st) in enumerate(parts):
            sh = shards[p]
            dst, key, val = scatter_kernel(comp, sh, vids - sh.lo, st["send"],
                                           st["skey"], st["sending"])
            n_msgs += dst.shape[0]
            if dst.shape[0] == 0:
                continue
            dpart = np.searchsorted(bounds, dst, side="right") - 1
            order = np.argsort(dpart, kind="stable")
            dst, dpart = dst[order], dpart[order]
            key = key[order] if key is not None else None
            val = val[order]
            cut = np.searchsorted(dpart, np.arange(nparts + 1))
            for q in range(nparts):
                a, b = cut[q], cut[q + 1]
                if b > a:
                    outbox_vid[q].append(dst[a:b])
                    outbox_val[q].append(val[a:b])
                    if key is not None:
                        outbox_key[q].append(key[a:b])
        sum_sending = 0
        sum_changed = 0
        scalars_acc = {c: 0.0 for c in comp.master_cols}
        for p, (vids, st) in enumerate(parts):
            m_vid = (np.concatenate(outbox_vid[p]) if outbox_vid[p]
                     else np.empty(0, np.int64))
            m_key = (np.concatenate(outbox_key[p]) if outbox_key[p]
                     else np.empty(0, np.int64))
            m_val = (np.concatenate(outbox_val[p]) if outbox_val[p]
                     else np.empty(0, np.float64))
            msg = combine_messages(comp, shards[p].lo, shards[p].num_nodes,
                                   m_vid, m_key, m_val)
            st["changed"][:] = 0
            comp.apply_part(vids, st, msg, superstep, shards[p])
            for c in comp.master_cols:
                scalars_acc[c] += float(st[c].sum())
        if comp.master_cols or type(comp).master_part is not Computation.master_part:
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
                             [_state_table(p, v, s, comp) for p, (v, s) in enumerate(parts)],
                             metrics[-1])
        if _converged(comp, superstep, sum_sending, sum_changed):
            converged = True
            break
        superstep += 1
    ran = _ran_iterations(comp, superstep, converged, max_iterations)
    return _result_from_parts(comp, [v for v, _ in parts], [s for _, s in parts],
                              ran, converged, metrics)


def _run_ray(graph, comp, max_iterations, P, ckpt_dir, ckpt_interval, resume):
    import ray
    import ray.data
    _ensure_comp_picklable(comp)
    from ray.data.aggregate import Sum

    from ..state.checkpoint import CheckpointManager

    bounds = graph.bounds(P, comp.orientation)
    shards_refs = graph.shard_refs(P, comp.orientation)
    nparts = len(bounds) - 1
    ckpt = CheckpointManager(ckpt_dir, comp) if ckpt_dir else None

    start_superstep = 0
    state_ds = None
    if ckpt and resume and (latest := ckpt.latest()) is not None:
        start_superstep = latest + 1
        state_ds = ray.data.read_parquet(ckpt.part_dir(latest)).materialize()
    else:
        shards = graph.shards(P, comp.orientation)
        tables = []
        for p in range(nparts):
            vids, st = _init_state_part(comp, p, int(bounds[p]), int(bounds[p + 1]),
                                        shards[p])
            tables.append(_state_table(p, vids, st, comp))
        state_ds = ray.data.from_arrow(tables)
    metrics = []
    converged = False
    superstep = max(start_superstep, 1)
    if start_superstep == 0 and ckpt:
        ckpt.write_ray(0, state_ds, {})
    while True:
        it_limit = max_iterations if comp.count_init_as_iteration else max_iterations + 1
        if superstep >= it_limit:
            break
        t0 = time.perf_counter()
        msgs = state_ds.map_batches(
            _ScatterWorker(comp, shards_refs, bounds),
            batch_format="pyarrow", zero_copy_batch=True)
        unioned = state_ds.union(msgs)
        state_ds = unioned.groupby("part").map_groups(
            _ApplyWorker(comp, shards_refs, bounds, superstep),
            batch_format="pyarrow").materialize()
        aggs = state_ds.aggregate(
            Sum("sending", alias_name="s"), Sum("changed", alias_name="c"),
            *[Sum(c, alias_name=f"m_{c}") for c in comp.master_cols])
        if comp.master_cols or type(comp).master_part is not Computation.master_part:
            scalars = {c: float(aggs.get(f"m_{c}") or 0.0) for c in comp.master_cols}
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
    final = state_ds.select_columns(out_cols).to_arrow_refs()
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
    """One actor per partition: owns the CSR shard (zero-copy from the object
    store) and its slice of vertex state; scatters/applies per superstep.  The
    distributed analogue of a GDS PartitionedComputeStep that *keeps* its state
    across iterations (PartitionedComputer.java:96-123)."""

    def __init__(self, comp, shard_ref, p, bounds):
        # a top-level ObjectRef arg is auto-resolved by Ray: the shard arrives as a
        # zero-copy plasma view (its numpy buffers are mmapped, not copied)
        import ray
        self.shard = shard_ref if isinstance(shard_ref, CsrShard) else ray.get(shard_ref)
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

    def load_state(self, table: pa.Table):
        self.vids, self.st = _table_to_state(table, self.comp)
        return int(self.st["sending"].sum())

    def step(self, superstep, *msg_parts):
        """Fused superstep: apply the incoming messages (finishing superstep
        ``superstep``), then scatter the updated state (producing the messages for
        ``superstep + 1``).  Returns (stats, out_0, ..., out_{P-1}) so the driver
        runs ONE actor RPC round per superstep."""
        stats = self.apply(superstep, *msg_parts)
        out = self.scatter()
        if self.nparts > 1:
            return tuple([stats] + list(out))
        return stats, out

    def scatter(self):
        """Returns one (vid, key, val) partial per destination partition."""
        dst, key, val = scatter_kernel(self.comp, self.shard,
                                       self.vids - self.shard.lo,
                                       self.st["send"], self.st["skey"],
                                       self.st["sending"])
        dpart = np.searchsorted(self.bounds, dst, side="right") - 1
        order = np.argsort(dpart, kind="stable")
        dst, dpart = dst[order], dpart[order]
        key = key[order] if key is not None else None
        val = val[order]
        cut = np.searchsorted(dpart, np.arange(self.nparts + 1))
        out = []
        for q in range(self.nparts):
            a, b = int(cut[q]), int(cut[q + 1])
            out.append((dst[a:b], None if key is None else key[a:b], val[a:b]))
        return out if self.nparts > 1 else out[0]

    def apply(self, superstep, *msg_parts):
        vid_parts = [m[0] for m in msg_parts if m[0].shape[0]]
        m_vid = np.concatenate(vid_parts) if vid_parts else np.empty(0, np.int64)
        if self.comp.keyed:
            m_key = (np.concatenate([m[1] for m in msg_parts if m[0].shape[0]])
                     if vid_parts else np.empty(0, np.int64))
        else:
            m_key = np.empty(0, np.int64)
        m_val = (np.concatenate([m[2] for m in msg_parts if m[0].shape[0]])
                 if vid_parts else np.empty(0, np.float64))
        msg = combine_messages(self.comp, self.shard.lo, self.shard.num_nodes,
                               m_vid, m_key, m_val)
        self.st["changed"][:] = 0
        self.comp.apply_part(self.vids, self.st, msg, superstep, self.shard)
        stats = {"sending": int(self.st["sending"].sum()),
                 "changed": int(self.st["changed"].sum()),
                 "messages": int(m_vid.shape[0])}
        for c in self.comp.master_cols:
            stats[f"m_{c}"] = float(self.st[c].sum())
        return stats

    def master(self, scalars, superstep):
        self.comp.master_part(self.vids, self.st, scalars, superstep)
        return {"sending": int(self.st["sending"].sum()),
                "changed": int(self.st["changed"].sum())}

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


def _run_ray_actors(graph, comp, max_iterations, P, ckpt_dir, ckpt_interval, resume):
    import ray

    from ..state.checkpoint import CheckpointManager
    _ensure_comp_picklable(comp)

    bounds = graph.bounds(P, comp.orientation)
    shard_refs = graph.shard_refs(P, comp.orientation)
    nparts = len(bounds) - 1
    ckpt = CheckpointManager(ckpt_dir, comp) if ckpt_dir else None

    Worker = ray.remote(num_cpus=1)(_ShardActor)
    workers = [Worker.remote(comp, shard_refs[p], p, bounds) for p in range(nparts)]

    start_superstep = 0
    if ckpt and resume and (latest := ckpt.latest()) is not None:
        start_superstep = latest + 1
        t = ckpt.read_all(latest)
        pcol = t.column("part").to_numpy(zero_copy_only=False)
        ray.get([workers[p].load_state.remote(t.filter(pa.array(pcol == p)))
                 for p in range(nparts)])
    else:
        ray.get([w.init.remote() for w in workers])
        if ckpt:
            _ckpt_actors(ckpt, workers, 0, {})
    metrics = []
    converged = False
    superstep = max(start_superstep, 1)
    outbox = None
    has_master = bool(comp.master_cols) or \
        type(comp).master_part is not Computation.master_part
    while True:
        it_limit = max_iterations if comp.count_init_as_iteration else max_iterations + 1
        if superstep >= it_limit:
            break
        t0 = time.perf_counter()
        if outbox is None:  # first superstep after init/resume: initial scatter
            if nparts > 1:
                outbox = [workers[p].scatter.options(num_returns=nparts).remote()
                          for p in range(nparts)]
            else:
                outbox = [[workers[0].scatter.remote()]]
        stepped = [workers[q].step.options(num_returns=nparts + 1).remote(
                       superstep, *[outbox[p][q] for p in range(nparts)])
                   for q in range(nparts)] if nparts > 1 else                   [workers[0].step.options(num_returns=2).remote(
                       superstep, outbox[0][0])]
        stats = ray.get([r[0] for r in stepped])
        outbox = [r[1:] for r in stepped] if nparts > 1 else [[stepped[0][1]]]
        sum_sending = sum(s["sending"] for s in stats)
        sum_changed = sum(s["changed"] for s in stats)
        n_msgs = sum(s["messages"] for s in stats)
        if has_master:
            scalars = {c: sum(s.get(f"m_{c}", 0.0) for s in stats)
                       for c in comp.master_cols}
            mstats = ray.get([w.master.remote(scalars, superstep) for w in workers])
            sum_sending = sum(s["sending"] for s in mstats)
            sum_changed = sum(s["changed"] for s in mstats)
        metrics.append({"superstep": superstep, "messages": n_msgs,
                        "sending": sum_sending, "changed": sum_changed,
                        "sec": time.perf_counter() - t0})
        if ckpt and superstep % ckpt_interval == 0:
            _ckpt_actors(ckpt, workers, superstep, metrics[-1])
        if _converged(comp, superstep, sum_sending, sum_changed):
            converged = True
            break
        superstep += 1
    tbl = pa.concat_tables(ray.get([w.result_table.remote() for w in workers]))
    order = np.argsort(tbl.column("vid").to_numpy(zero_copy_only=False), kind="stable")
    tbl = tbl.take(pa.array(order))
    ran = _ran_iterations(comp, superstep, converged, max_iterations)
    for w in workers:
        ray.kill(w)
    return PregelResult(tbl, ran, converged, metrics)


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
