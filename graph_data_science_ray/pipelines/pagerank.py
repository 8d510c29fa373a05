"""PageRank / ArticleRank / Eigenvector as Pregel computations on the BSP runner.

Semantics mirror the reference exactly (conformance-critical — SURVEY.md §2.1):

* PageRank: delta formulation, ``alpha = 1 - dampingFactor``; superstep 0 always
  sends ``delta/degree`` (no tolerance check), later supersteps send only when
  ``delta > tolerance`` else vote to halt; unnormalized Neo4j fixpoint
  ``r = alpha + damping * Σ_in r_j / deg_j``.
  Ref: algo/src/main/java/org/neo4j/gds/pagerank/PageRankComputation.java:64-108.
* Weighted: messages multiplied by edge weight, degree = weighted out-degree
  (applyRelationshipWeight + DegreeCentrality,
  algo/.../pagerank/PageRankAlgorithmFactory.java:136-157).
* Personalized: init rank = alpha only on source nodes, 0 elsewhere.
* ArticleRank: sends ``delta / (degree + averageDegree)``, averageDegree is the
  *unweighted* mean degree (algo/.../pagerank/ArticleRankComputation.java:79-104,
  PageRankAlgorithmFactory.java:51-59).
* Eigenvector: (A+I) power iteration, per-superstep L2 normalization in master
  compute, convergence on max per-node |Δ| ≤ tolerance
  (algo/.../pagerank/EigenvectorComputation.java:92-162).
* Post-scaling per ScalarScaler variants (algo/.../pagerank/PageRankAlgorithm.java:78-99).
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import pyarrow as pa

from ..functions.scalers import scale
from ..state.graph import Graph
from .pregel import Computation, PregelResult, run_pregel


class _PageRankBase(Computation):
    reducer = "sum"
    idempotent_on_empty = True  # halted vertex + no messages ⇒ no-op superstep
    positive_messages = True    # deltas are >= 0; apply is a no-op on zero delta,
    # so the dense exchange may derive has = (sum != 0) (drops one full-range
    # bincount per producer per superstep + n payload bytes)
    state_spec = [("rank", np.float64), ("delta", np.float64)]
    output_cols = {"score": "rank"}

    def __init__(self, damping, tolerance, source_vids=None, weighted=False):
        self.damping = float(damping)
        self.tolerance = float(tolerance)
        self.alpha = 1.0 - self.damping
        self.source_vids = (np.asarray(sorted(source_vids), dtype=np.int64)
                            if source_vids is not None and len(source_vids) else None)
        self.weighted = bool(weighted)

    def _degrees(self, shard):
        return (shard.weighted_degrees() if self.weighted
                else shard.degrees().astype(np.float64))

    def _denominator(self, deg):
        return deg

    def init_part(self, vids, shard, st):
        if self.source_vids is not None:
            rank = np.where(np.isin(vids, self.source_vids), self.alpha, 0.0)
        else:
            rank = np.full(vids.shape[0], self.alpha)
        st["rank"][:] = rank
        st["delta"][:] = rank
        deg = self._degrees(shard)
        pos = deg > 0
        st["sending"][:] = pos.astype(np.uint8)  # initial superstep always sends
        denom = self._denominator(deg)
        st["send"][:] = np.where(pos, rank / np.where(pos, denom, 1.0), 0.0)

    def apply_part(self, vids, st, msg, superstep, shard):
        has = msg.has
        delta = np.zeros(vids.shape[0])
        delta[has] = self.damping * msg.vals[has]
        st["rank"] += delta
        st["delta"][:] = delta
        deg = self._degrees(shard)
        send_mask = has & (delta > self.tolerance) & (deg > 0)
        st["sending"][:] = send_mask.astype(np.uint8)
        denom = self._denominator(deg)
        st["send"][:] = np.where(send_mask, delta / np.where(deg > 0, denom, 1.0), 0.0)
        st["changed"][:] = has.astype(np.uint8)


class PageRankComputation(_PageRankBase):
    """Ref: algo/.../pagerank/PageRankComputation.java:34-108."""


class ArticleRankComputation(_PageRankBase):
    """Sends delta / (degree + avgDegree) — ref ArticleRankComputation.java:79-104."""

    def __init__(self, damping, tolerance, avg_degree, source_vids=None, weighted=False):
        super().__init__(damping, tolerance, source_vids, weighted)
        self.avg_degree = float(avg_degree)

    def _denominator(self, deg):
        return deg + self.avg_degree


class EigenvectorComputation(Computation):
    """Power iteration on (A+I) with per-superstep L2 master normalization.
    Ref: algo/.../pagerank/EigenvectorComputation.java:92-162."""

    reducer = "sum"
    always_active = True
    state_spec = [("rank", np.float64), ("next_rank", np.float64), ("nr2", np.float64)]
    output_cols = {"score": "rank"}
    master_cols = ["nr2"]

    def __init__(self, n, tolerance, source_vids=None, weighted=False):
        self.n = int(n)
        self.tolerance = float(tolerance)
        self.source_vids = (np.asarray(sorted(source_vids), dtype=np.int64)
                            if source_vids is not None and len(source_vids) else None)
        self.weighted = bool(weighted)

    def _denom(self, shard, nloc):
        # unweighted: no-op divisor 1; weighted: weighted degree
        # (PageRankAlgorithmFactory.java:105-115)
        if not self.weighted:
            return np.ones(nloc)
        d = shard.weighted_degrees()
        return np.where(d > 0, d, 1.0)

    def init_part(self, vids, shard, st):
        k = self.source_vids.shape[0] if self.source_vids is not None else self.n
        r0 = 1.0 / k
        if self.source_vids is not None:
            mask = np.isin(vids, self.source_vids)
            raw = np.where(mask, r0, 0.0)
        else:
            raw = np.full(vids.shape[0], r0)
        # superstep-0 messages use the un-normalized init value; the superstep-0
        # master L2-normalization has the closed form r0/||r0|| = sqrt-scaled
        st["send"][:] = raw / self._denom(shard, vids.shape[0])
        st["rank"][:] = raw * np.sqrt(k)  # == raw / ||raw||_2
        st["sending"][:] = 1

    def apply_part(self, vids, st, msg, superstep, shard):
        next_rank = st["rank"].copy()
        next_rank[msg.has] += msg.vals[msg.has]
        st["next_rank"][:] = next_rank
        st["nr2"][:] = next_rank * next_rank
        st["send"][:] = next_rank / self._denom(shard, vids.shape[0])
        st["sending"][:] = 1

    def master_part(self, vids, st, scalars, superstep):
        norm = np.sqrt(scalars["nr2"])
        if norm < 1e-300:
            norm = 1.0
        new_rank = st["next_rank"] / norm
        st["changed"][:] = (np.abs(new_rank - st["rank"]) > self.tolerance).astype(np.uint8)
        st["rank"][:] = new_rank


def _resolve_sources(graph: Graph, source_nodes):
    if source_nodes is None:
        return None
    vids = []
    for s in source_nodes:
        if isinstance(s, (int, np.integer)):
            vids.append(int(s))
        else:
            if graph.keys is None:
                raise ValueError("graph has no keys; pass source vids as ints")
            idx = np.nonzero(np.asarray(graph.keys, dtype=object) == s)[0]
            if idx.shape[0] == 0:
                raise KeyError(f"unknown source node {s!r}")
            vids.append(int(idx[0]))
    return vids


def pagerank(graph: Graph, *, damping: float = 0.85, tolerance: float = 1e-7,
             max_iterations: int = 20, source_nodes: Optional[Sequence] = None,
             weighted: bool = False, scaler: str = "none", mode: str = "pagerank",
             execution: str = "auto", num_partitions: Optional[int] = None,
             checkpoint_dir: Optional[str] = None, resume: bool = False,
             result_dir: Optional[str] = None,
             memory_limit_bytes: Optional[int] = None) -> PregelResult:
    """Defaults per PageRankConfig.java:39-57 (maxIterations=20, tol=1e-7, d=0.85)."""
    if not (0 <= damping < 1):
        raise ValueError("dampingFactor must be in [0, 1)")
    if max_iterations < 1:
        raise ValueError("maxIterations must be >= 1")
    if weighted and not graph.is_weighted:
        raise ValueError("weighted=True on an unweighted graph")
    svids = _resolve_sources(graph, source_nodes)
    if mode == "pagerank":
        comp = PageRankComputation(damping, tolerance, svids, weighted)
    elif mode == "articlerank":
        comp = ArticleRankComputation(damping, tolerance, graph.average_degree(),
                                      svids, weighted)
    elif mode == "eigenvector":
        comp = EigenvectorComputation(graph.n, tolerance, svids, weighted)
    else:
        raise ValueError(f"unknown mode {mode!r}")
    res = run_pregel(graph, comp, max_iterations=max_iterations, execution=execution,
                     num_partitions=num_partitions, checkpoint_dir=checkpoint_dir,
                     resume=resume, result_dir=result_dir,
                     memory_limit_bytes=memory_limit_bytes)
    if res.table is None:  # write-mode: actors wrote their own partitions
        return res
    if scaler and scaler.lower() != "none":
        scores = scale(res.table.column("score").to_numpy(zero_copy_only=False), scaler)
        idx = res.table.column_names.index("score")
        res.table = res.table.set_column(idx, "score", pa.array(scores))
    return res


def article_rank(graph: Graph, **kw) -> PregelResult:
    return pagerank(graph, mode="articlerank", **kw)


def eigenvector(graph: Graph, **kw) -> PregelResult:
    return pagerank(graph, mode="eigenvector", **kw)
