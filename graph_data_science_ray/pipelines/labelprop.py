"""Label Propagation with the reference's asynchronous in-place semantics.

Reference (algo/src/main/java/org/neo4j/gds/labelpropagation/):
  * init label = seed property if present, else ``maxSeedId + originalId + 1``
    (InitStep.java:58-79; with no seeds this reduces to the vid);
  * node v gathers votes from its **out-neighbors** u: vote for label(u) with
    weight relationshipWeight(v→u) × nodeWeight(u) (ComputeStepConsumer.java:44-58);
  * new label = argmax summed weight; exact tie → smaller label id; ≥1 vote always
    adopts the winner (tallyVotes, ComputeStepConsumer.java:64-77);
  * labels are updated **in place during the iteration**
    (ComputeStep.java:82-92) — the asynchronous trajectory is what the golden
    fixtures encode (including the 1-iteration unit tests at concurrency=1);
  * converged when no node changed in an iteration; default maxIterations=10
    (LabelPropagationBaseConfig.java:35-39).

Distributed formulation: **asynchronous within a partition, bulk-synchronous
across partitions** — each partition sweeps its nodes in vid order reading
*current* labels of local out-neighbors (pull), while votes from out-neighbors
owned by other partitions arrive as keyed (label, weight) messages carrying the
labels as of the superstep start (push along the REVERSE-oriented CSR, which is
how "v reads label(u)" becomes "u sends label(u) to v").  At one partition this
is bit-for-bit the reference's concurrency=1 trajectory; at P>1 the staleness of
remote votes mirrors the reference's own multi-threaded in-place races, and the
converged labelings (the doc-test oracle) agree on stable graphs.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from ..state.graph import Graph
from .pregel import Computation, PregelResult, run_pregel


class LabelPropagationComputation(Computation):
    orientation = "reverse"
    keyed = True
    always_active = True
    scatter_remote_only = True
    count_init_as_iteration = False
    state_spec = [("label", np.int64), ("nodew", np.float64)]
    output_cols = {"label": "label"}

    def __init__(self, weighted=False, seeds=None, node_weights=None):
        self.weighted = bool(weighted)
        self.seeds = seeds              # np.ndarray[int64]; int64 min sentinel = missing
        self.node_weights = node_weights
        self._pull = {}                 # (lo, hi) -> local pull CSR, built once
        self._dirty = {}                # (lo, hi) -> carry-over dirty frontier

    def init_part(self, vids, shard, st):
        if self.seeds is not None:
            seeds_all = np.asarray(self.seeds)
            seeds = seeds_all[vids]
            present = seeds != np.iinfo(np.int64).min
            max_seed = int(seeds_all[seeds_all != np.iinfo(np.int64).min].max(initial=-1))
            st["label"][:] = np.where(present, seeds, max_seed + vids + 1)
        else:
            st["label"][:] = vids
        st["nodew"][:] = (np.asarray(self.node_weights)[vids]
                          if self.node_weights is not None else 1.0)
        st["sending"][:] = 1
        st["send"][:] = st["nodew"]
        st["skey"][:] = st["label"]

    def _pull_csr(self, shard):
        """Local pull structure: for each local node v, its local out-neighbors u
        (u, v both in [lo, hi)) with edge weights — derived once from the reverse
        shard (which stores, per local u, the receivers v of u's label).  Also
        builds the inverted "readers" CSR (for each u, the local v that read
        u's label) used by the dirty-frontier sweep."""
        key = (shard.lo, shard.hi)
        if key not in self._pull:
            lo, hi = shard.lo, shard.hi
            deg = np.diff(shard.indptr)
            u_local = np.repeat(np.arange(shard.num_nodes, dtype=np.int64), deg)
            v = shard.indices
            local_mask = (v >= lo) & (v < hi)
            v_local = v[local_mask] - lo
            u_loc = u_local[local_mask]
            w = (shard.weights[local_mask] if (self.weighted and shard.weights is not None)
                 else np.ones(v_local.shape[0]))
            order = np.argsort(v_local, kind="stable")
            v_sorted, u_sorted, w_sorted = v_local[order], u_loc[order], w[order]
            indptr = np.searchsorted(v_sorted, np.arange(shard.num_nodes + 1))
            r_order = np.argsort(u_sorted, kind="stable")
            r_u = u_sorted[r_order]
            r_v = v_sorted[r_order]
            r_indptr = np.searchsorted(r_u, np.arange(shard.num_nodes + 1))
            self._pull[key] = (indptr, u_sorted, w_sorted, r_indptr, r_v)
        return self._pull[key]

    def apply_part(self, vids, st, msg, superstep, shard):
        """Sequential ascending sweep with EXACT-trajectory dirty skipping:
        a node is re-tallied only when an input could have changed — any remote
        message arrived, or a local out-neighbor changed label in the previous
        sweep (dirty-carry) or EARLIER IN THIS SWEEP at a smaller index (heap
        of forward marks — preserving the in-place asynchronous order).  A
        skipped node's tally inputs are bit-identical to its last tally, so its
        argmax cannot differ — the trajectory equals the full GDS sweep at any
        partition count."""
        import heapq
        nloc = vids.shape[0]
        indptr, u_sorted, w_sorted, r_indptr, r_v = self._pull_csr(shard)
        # remote votes: msg sorted by (local, key) — slice per node
        m_indptr = np.searchsorted(msg.local, np.arange(nloc + 1))
        labels = st["label"]
        nodew = st["nodew"]
        st["changed"][:] = 0
        key = (shard.lo, shard.hi)
        carry = self._dirty.get(key)
        if carry is None or superstep <= 1:
            todo = np.ones(nloc, dtype=bool)
        else:
            todo = carry
            todo |= np.diff(m_indptr) > 0  # remote votes may differ
        dirty_next = np.zeros(nloc, dtype=bool)
        pending = np.nonzero(todo)[0]
        heap: list = []          # forward in-sweep marks (readers > current v)
        in_heap = np.zeros(nloc, dtype=bool)
        processed = np.zeros(nloc, dtype=bool)
        pi = 0
        while True:
            if heap and (pi >= pending.shape[0] or heap[0] <= pending[pi]):
                v = heapq.heappop(heap)
                in_heap[v] = False
            elif pi < pending.shape[0]:
                v = int(pending[pi])
                pi += 1
            else:
                break
            if processed[v]:
                continue
            processed[v] = True
            a, b = indptr[v], indptr[v + 1]
            ma, mb = m_indptr[v], m_indptr[v + 1]
            if a == b and ma == mb:
                continue
            cand_labels = np.concatenate((labels[u_sorted[a:b]], msg.key[ma:mb]))
            cand_w = np.concatenate((w_sorted[a:b] * nodew[u_sorted[a:b]],
                                     msg.val[ma:mb]))
            uq, inv = np.unique(cand_labels, return_inverse=True)
            sums = np.bincount(inv, weights=cand_w)
            best = sums.max()
            # argmax with smaller-label tie-break (uq is sorted ascending)
            new = uq[np.nonzero(sums == best)[0][0]]
            if new != labels[v]:
                labels[v] = new
                st["changed"][v] = 1
                readers = r_v[r_indptr[v]:r_indptr[v + 1]]
                dirty_next[readers] = True
                for w_ in readers[readers > v]:  # ahead of the sweep: this pass
                    if not in_heap[w_] and not processed[w_]:
                        heapq.heappush(heap, int(w_))
                        in_heap[w_] = True
        self._dirty[key] = dirty_next
        st["skey"][:] = labels
        st["send"][:] = nodew
        st["sending"][:] = 1


def label_propagation(graph: Graph, *, max_iterations: int = 10,
                      weighted: bool = False, seed_property: Optional[str] = None,
                      node_weight_property: Optional[str] = None,
                      execution: str = "auto", num_partitions: Optional[int] = None,
                      checkpoint_dir: Optional[str] = None,
                      resume: bool = False) -> PregelResult:
    if weighted and not graph.is_weighted:
        raise ValueError("weighted=True on an unweighted graph")
    seeds = None
    if seed_property is not None:
        raw = np.asarray(graph.node_props[seed_property])
        seeds = np.where(np.isnan(raw.astype(np.float64)),
                         np.iinfo(np.int64).min, raw).astype(np.int64) \
            if raw.dtype.kind == "f" else raw.astype(np.int64)
    nodew = None
    if node_weight_property is not None:
        nodew = np.asarray(graph.node_props[node_weight_property], dtype=np.float64)
    comp = LabelPropagationComputation(weighted=weighted, seeds=seeds,
                                       node_weights=nodew)
    return run_pregel(graph, comp, max_iterations=max_iterations, execution=execution,
                      num_partitions=num_partitions, checkpoint_dir=checkpoint_dir,
                      resume=resume)
