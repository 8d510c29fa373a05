"""Seeded random edge-table generator — the analogue of GDS RandomGraphGenerator
(core/src/main/java/org/neo4j/gds/beta/generator/RandomGraphGenerator.java:57+)
with the same distribution families (RelationshipDistribution.java:35-59):

  * UNIFORM   — every node has exactly avg_degree out-edges, targets uniform;
  * RANDOM    — out-degree ~ Normal(avg, avg/2) clipped at 0, targets uniform;
  * POWER_LAW — out-degree as RANDOM, target choice ~ zipf-ish (heavy hub skew at
    low vids — the shape that exercises degree-balanced partitioning and the
    pre-combine hub guard).

Fully vectorized (NumPy), deterministic per seed; used by the bench harness to
produce multi-ten-million-edge graphs in seconds (no external data)."""

from __future__ import annotations

import numpy as np

from ..state.graph import Graph


def random_edge_table(n: int, avg_degree: float, *, distribution: str = "power_law",
                      seed: int = 42, weighted: bool = False):
    rng = np.random.default_rng(seed)
    if distribution == "uniform":
        deg = np.full(n, int(avg_degree), dtype=np.int64)
    else:
        deg = np.maximum(0, rng.normal(avg_degree, avg_degree / 2, n)).astype(np.int64)
    m = int(deg.sum())
    src = np.repeat(np.arange(n, dtype=np.int64), deg)
    if distribution == "power_law":
        # zipf-ish target skew: floor(n * u^alpha) concentrates mass at low vids
        u = rng.random(m)
        dst = np.minimum(n - 1, (n * u ** 3.5)).astype(np.int64)
    else:
        dst = rng.integers(0, n, m, dtype=np.int64)
    keep = src != dst
    src, dst = src[keep], dst[keep]
    w = rng.random(src.shape[0]) if weighted else None
    return src, dst, w


def random_graph(n: int, avg_degree: float, *, distribution: str = "power_law",
                 seed: int = 42, weighted: bool = False,
                 aggregation: str = "single") -> Graph:
    src, dst, w = random_edge_table(n, avg_degree, distribution=distribution,
                                    seed=seed, weighted=weighted)
    return Graph.from_edges(src, dst, w, n=n, aggregation=aggregation,
                            name=f"random_{distribution}_{n}")
