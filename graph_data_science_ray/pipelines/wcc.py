"""Weakly connected components as two-level hash-to-min label propagation.

The reference's WCC is a shared-memory wait-free union-find with Union-by-Min
(algo/src/main/java/org/neo4j/gds/wcc/Wcc.java:69-437,
core/.../paged/dss/HugeAtomicDisjointSetStruct.java:166-191): at convergence
``component(v)`` equals the minimum internal vid of v's component.  A shared CAS
array does not distribute; the BSP-equivalent fixpoint is min-label propagation,
which converges to exactly the same labeling, so exact-match conformance holds.

Two-level scheme (the scale design):
  * at init each partition collapses its *intra-partition* edges with a local
    min-label closure (vectorized pointer-jumping) — the analogue of Wcc's
    subgraph-sampling fast path (Wcc.java:144-190), and what makes the global
    round count the diameter of the *contracted* partition graph rather than of
    the raw graph;
  * each global superstep exchanges labels along cross-partition edges via the
    scatter → groupby-combine (min) → apply pipeline; a vertex re-broadcasts only
    when its label shrank (delta sending, like vote-to-halt).

Direction is ignored (every edge unions both endpoints — Wcc.java:292-296), hence
shards are built with the UNDIRECTED orientation.  ``threshold`` keeps only edges
with ``weight > threshold`` (strict —  Wcc.java:313-319).
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pyarrow as pa

from ..state.graph import Graph
from .pregel import Computation, PregelResult, run_pregel


def local_min_labels(nloc: int, s_local: np.ndarray, d_local: np.ndarray) -> np.ndarray:
    """Min reachable local index per node over the given local edges (both directions
    must be present).  Vectorized hash-to-min with pointer jumping — O(E log V)."""
    label = np.arange(nloc, dtype=np.int64)
    if s_local.shape[0] == 0:
        return label
    while True:
        nl = label.copy()
        np.minimum.at(nl, s_local, label[d_local])
        for _ in range(3):  # pointer jumping: label <- label[label]
            nl = np.minimum(nl, nl[nl])
        if np.array_equal(nl, label):
            return label
        label = nl


class WccComputation(Computation):
    orientation = "undirected"
    reducer = "min"
    idempotent_on_empty = True  # no incoming labels ⇒ components already stable
    state_spec = [("comp", np.int64), ("lcomp", np.int64)]
    output_cols = {"component": "comp"}

    def init_part(self, vids, shard, st):
        lo = shard.lo
        intra = (shard.indices >= shard.lo) & (shard.indices < shard.hi)
        # local source index per edge: expand indptr runs
        deg = np.diff(shard.indptr)
        s_local_all = np.repeat(np.arange(shard.num_nodes, dtype=np.int64), deg)
        s_local = s_local_all[intra]
        d_local = shard.indices[intra] - lo
        lmin = local_min_labels(shard.num_nodes, s_local, d_local)
        st["lcomp"][:] = lmin
        st["comp"][:] = lmin + lo
        pos = deg > 0
        st["sending"][:] = pos.astype(np.uint8)
        st["send"][:] = st["comp"].astype(np.float64)

    def apply_part(self, vids, st, msg, superstep, shard):
        cand = st["comp"].copy()
        incoming = msg.vals[msg.has].astype(np.int64)
        np.minimum.at(cand, np.nonzero(msg.has)[0], incoming)
        # spread the new minima through the (static) local components
        gmin = np.full(shard.num_nodes, np.iinfo(np.int64).max, dtype=np.int64)
        np.minimum.at(gmin, st["lcomp"], cand)
        new = gmin[st["lcomp"]]
        changed = new < st["comp"]
        st["comp"][:] = new
        st["changed"][:] = changed.astype(np.uint8)
        st["sending"][:] = changed.astype(np.uint8)
        st["send"][:] = new.astype(np.float64)


def wcc(graph: Graph, *, threshold: Optional[float] = None,
        seed_property: Optional[str] = None, consecutive_ids: bool = False,
        max_iterations: int = 100, execution: str = "auto",
        num_partitions: Optional[int] = None,
        checkpoint_dir: Optional[str] = None, resume: bool = False,
        result_dir: Optional[str] = None) -> PregelResult:
    g = graph
    if threshold is not None:
        if not graph.is_weighted:
            raise ValueError("threshold requires a weighted graph "
                             "(ref WccBaseConfig.java:28-44)")
        if not hasattr(graph, "weight"):
            raise NotImplementedError(
                "threshold on a parquet-backed graph: load it first "
                "(Graph.load) or filter at projection time")
        keep = graph.weight > threshold
        g = Graph(graph.n, graph.src[keep], graph.dst[keep], graph.weight[keep],
                  keys=graph.keys, node_props=graph.node_props)
    if result_dir is not None and (seed_property is not None or consecutive_ids):
        raise ValueError("result_dir (write mode) does not compose with "
                         "seed_property/consecutive_ids post-processing")
    res = run_pregel(g, WccComputation(), max_iterations=max_iterations,
                     execution=execution, num_partitions=num_partitions,
                     checkpoint_dir=checkpoint_dir, resume=resume,
                     result_dir=result_dir)
    if res.table is None:
        return res
    if seed_property is not None:
        # Seeded semantics (HugeAtomicDisjointSetStruct.setIdOf:131-149): the
        # component's id is the seed of its root (= min-vid member under
        # Union-by-Min); components whose root carries no seed get fresh ids
        # above the max seed, allocated in ascending root-vid order (the order a
        # sequential node scan first touches each root).
        seeds = np.asarray(graph.node_props[seed_property], dtype=np.float64)
        seeds = np.where(np.isnan(seeds), -1, seeds).astype(np.int64)
        comp = res.table.column("component").to_numpy(zero_copy_only=False)
        roots = np.unique(comp)
        root_seed = seeds[roots]
        max_seed = int(seeds.max(initial=-1))
        unseeded = root_seed < 0
        fresh = np.cumsum(unseeded)  # 1-based rank among unseeded roots
        mapped = np.where(unseeded, max_seed + fresh, root_seed)
        new_comp = mapped[np.searchsorted(roots, comp)]  # roots sorted unique
        idx = res.table.column_names.index("component")
        res.table = res.table.set_column(idx, "component", pa.array(new_comp))
    if consecutive_ids:
        comp = res.table.column("component").to_numpy(zero_copy_only=False)
        uq, inv = np.unique(comp, return_inverse=True)
        idx = res.table.column_names.index("component")
        res.table = res.table.set_column(idx, "component", pa.array(inv.astype(np.int64)))
    return res
