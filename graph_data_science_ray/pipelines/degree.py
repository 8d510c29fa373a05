"""Degree centrality — ref algo/src/main/java/org/neo4j/gds/degree/
DegreeCentrality.java:69-100: unweighted = out-degree count; weighted = sum of
*positive* out-edge weights; orientation applied first.  This is both a public
algorithm (gds.degree) and the degree function PageRank's factory uses
(PageRankAlgorithmFactory.java:136-157)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..state.graph import Graph, _apply_orientation


def degree_centrality(graph: Graph, *, orientation: str = "natural",
                      weighted: bool = False) -> pa.Table:
    src, dst, w = _apply_orientation(graph.src, graph.dst, graph.weight, orientation)
    if weighted:
        if w is None:
            raise ValueError("weighted degree requires edge weights")
        pos = w > 0  # DegreeCentrality sums only positive weights
        score = np.bincount(src[pos], weights=w[pos], minlength=graph.n)
    else:
        score = np.bincount(src, minlength=graph.n).astype(np.float64)
    return pa.table({"vid": np.arange(graph.n, dtype=np.int64), "score": score})
