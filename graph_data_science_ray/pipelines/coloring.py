"""K1-Coloring and ModularityOptimization as standalone algorithms (the
``gds.beta.k1coloring`` / ``gds.beta.modularityOptimization`` procedure
families) — thin public wrappers over the kernels Louvain uses.

Reference: algo/src/main/java/org/neo4j/gds/beta/k1coloring/K1Coloring.java
(greedy recolor + validation rounds, default maxIterations=10) and
beta/modularity/ModularityOptimization.java (color-batched local moving)."""

from __future__ import annotations

from typing import Optional

import numpy as np
import pyarrow as pa

from ..state.graph import Graph
from .louvain import k1_coloring as _k1_kernel
from .louvain import modularity_optimization as _modopt_kernel


def k1_coloring(graph: Graph, *, max_iterations: int = 10) -> dict:
    """Greedy graph coloring: adjacent nodes get different colors (valid after
    convergence; the reference tolerates residual conflicts when the iteration
    budget runs out).  Returns {table(vid, color), ran_iterations, did_converge,
    color_count}."""
    sh = graph.shards(1, "undirected")[0]
    colors = _k1_kernel(graph.n, sh.indptr, sh.indices.astype(np.int64),
                        max_iterations)
    # conflict check (ValidationStep semantics)
    deg = np.diff(sh.indptr)
    srcs = np.repeat(np.arange(graph.n, dtype=np.int64), deg)
    tgts = sh.indices.astype(np.int64)
    conflicts = int(((colors[srcs] == colors[tgts]) & (srcs != tgts)).sum()) // 2
    return {"table": pa.table({"vid": np.arange(graph.n, dtype=np.int64),
                               "color": colors}),
            "did_converge": conflicts == 0,
            "color_count": int(np.unique(colors).shape[0]),
            "conflicts": conflicts}


def conductance(graph: Graph, communities, *, weighted: bool = False) -> dict:
    """Per-community conductance = external / (external + internal) over the
    stored edges, classifying each edge by its SOURCE's community; negative
    community ids are excluded from enumeration but count as external targets —
    ref alpha/.../impl/conductance/Conductance.java:248-274,300-330.

    Returns {table(community, conductance), global_average}."""
    comm = np.asarray(communities, dtype=np.int64)
    w = (graph.weight if (weighted and graph.weight is not None)
         else np.ones(graph.num_edges))
    cs = comm[graph.src]
    keep = cs >= 0
    cs = cs[keep]
    internal_mask = cs == comm[graph.dst[keep]]
    # remap to dense for bincount
    uq = np.unique(comm[comm >= 0])
    idx = np.searchsorted(uq, cs)
    internal = np.bincount(idx[internal_mask], weights=w[keep][internal_mask],
                           minlength=uq.shape[0])
    external = np.bincount(idx[~internal_mask], weights=w[keep][~internal_mask],
                           minlength=uq.shape[0])
    tot = internal + external
    valid = tot > 0
    cond = np.zeros(uq.shape[0])
    cond[valid] = external[valid] / tot[valid]
    table = pa.table({"community": uq[valid], "conductance": cond[valid]})
    avg = float(cond[valid].mean()) if valid.any() else 0.0
    return {"table": table, "global_average": avg}


def modularity_optimization(graph: Graph, *, max_iterations: int = 10,
                            tolerance: float = 0.0001,
                            seed_property: Optional[str] = None,
                            weighted: Optional[bool] = None) -> dict:
    """Single-level parallel local moving (what Louvain runs per level).
    Returns {table(vid, community), modularity, ran_iterations, did_converge}."""
    if weighted is None:
        weighted = graph.is_weighted
    seeds = (np.asarray(graph.node_props[seed_property], dtype=np.int64)
             if seed_property is not None else None)
    w = graph.weight if (weighted and graph.weight is not None) else None
    res = _modopt_kernel(graph.n, graph.src, graph.dst, w, seeds=seeds,
                         max_iterations=max_iterations, tolerance=tolerance)
    return {"table": pa.table({"vid": np.arange(graph.n, dtype=np.int64),
                               "community": res.communities}),
            "modularity": res.modularity,
            "ran_iterations": res.ran_iterations,
            "did_converge": res.did_converge}
