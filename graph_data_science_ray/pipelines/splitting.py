"""Train/test relationship splitting — gds.alpha.ml.splitRelationships.

Reference: alpha/alpha-algo/.../ml/splitting/EdgeSplitter.java +
DirectedEdgeSplitter.java / UndirectedEdgeSplitter.java: hold out
``holdout_fraction`` of the edges as a POSITIVE (label 1.0) test set, sample
``negative_sampling_ratio × holdout`` (source, target) NON-edges as the
NEGATIVE (label 0.0) test set, and return the remaining edges as the train
graph.  The reference's per-node streaming reservoir is a sequential
scheme; this implementation draws the same marginal distributions in one
vectorized pass (exact per-seed selections are impl-specific, like the
betweenness sampling precedent).  Counts are the reference's exactly:
``n_pos = int(m · f)``, ``n_neg = int(ratio · m · f)``.

Scale path: at cluster scale run the same scheme per edge partition
(hash-split the Bernoulli draws with a counter-based RNG keyed on edge id)
and rejection-sample negatives against the bucketed edge-key index — the
single-pass array form below is the in-memory shape the reference itself
uses.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pyarrow as pa

from ..state.graph import Graph


def split_relationships(graph: Graph, holdout_fraction: float, *,
                        negative_sampling_ratio: float = 1.0,
                        seed: Optional[int] = None):
    """Returns ``(train_graph, test_table)`` where test_table has columns
    (source, target, label) — label 1.0 for held-out true edges, 0.0 for
    sampled non-edges (EdgeSplitter.POSITIVE/NEGATIVE)."""
    if not 0.0 <= holdout_fraction <= 1.0:
        raise ValueError("holdout_fraction must be in [0, 1]")
    src = np.asarray(graph.src, dtype=np.int64)
    dst = np.asarray(graph.dst, dtype=np.int64)
    w = graph.weight
    m = src.shape[0]
    n = graph.n
    rng = np.random.default_rng(seed)

    n_pos = int(m * holdout_fraction)
    pos_idx = rng.choice(m, size=n_pos, replace=False) if n_pos else \
        np.array([], dtype=np.int64)
    mask = np.zeros(m, dtype=bool)
    mask[pos_idx] = True
    train = Graph.from_edges(src[~mask], dst[~mask],
                             w[~mask] if w is not None else None, n=n)

    # negative sampling: rejection against the sorted edge-key set
    n_neg = int(negative_sampling_ratio * m * holdout_fraction)
    edge_keys = np.unique(src * np.int64(n) + dst)
    neg_s = np.empty(0, dtype=np.int64)
    neg_t = np.empty(0, dtype=np.int64)
    tries = 0
    while neg_s.shape[0] < n_neg and tries < 20:  # EdgeSplitter MAX_RETRIES
        need = (n_neg - neg_s.shape[0]) * 2 + 16
        cs = rng.integers(0, n, need)
        ct = rng.integers(0, n, need)
        ok = cs != ct
        key = cs * np.int64(n) + ct
        pos = np.searchsorted(edge_keys, key)
        pos[pos >= edge_keys.shape[0]] = edge_keys.shape[0] - 1 \
            if edge_keys.shape[0] else 0
        if edge_keys.shape[0]:
            ok &= edge_keys[pos] != key
        neg_s = np.concatenate([neg_s, cs[ok]])
        neg_t = np.concatenate([neg_t, ct[ok]])
        tries += 1
    # on a near-complete graph the retry budget can leave fewer negatives
    # than requested (the reference's bounded MAX_RETRIES behaves the same:
    # it skips a node's negative samples after 20 collisions)
    neg_s, neg_t = neg_s[:n_neg], neg_t[:n_neg]

    test = pa.table({
        "source": np.concatenate([src[mask], neg_s]),
        "target": np.concatenate([dst[mask], neg_t]),
        "label": np.concatenate([np.ones(n_pos),
                                 np.zeros(neg_s.shape[0])]),
    })
    return train, test
