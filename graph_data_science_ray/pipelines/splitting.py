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
``n_pos = int(m · f)``, ``n_neg = int(ratio · m · f)`` over relationship
UNITS — for ``undirected=True`` a unit is the canonical (a < b) pair and
BOTH stored directions of a held-out pair leave the train graph together
(UndirectedEdgeSplitter.java — splitting directions independently would
leak every held-out edge's reverse into the train graph).

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


def _sample_negatives(rng, n: int, n_neg: int, edge_keys: np.ndarray,
                      undirected: bool) -> np.ndarray:
    """Distinct non-edge keys (s·n + t), rejection-sampled against the sorted
    edge-key set.  Sampled negatives are DEDUPLICATED — duplicate test rows
    would double-weight individual non-edges in AUC-style evaluation."""
    acc = np.empty(0, dtype=np.int64)
    tries = 0
    while acc.shape[0] < n_neg and tries < 20:  # EdgeSplitter MAX_RETRIES
        need = (n_neg - acc.shape[0]) * 2 + 16
        cs = rng.integers(0, n, need)
        ct = rng.integers(0, n, need)
        if undirected:  # canonical pair, neither direction may be an edge
            lo, hi = np.minimum(cs, ct), np.maximum(cs, ct)
            cs, ct = lo, hi
        ok = cs != ct
        key = cs * np.int64(n) + ct
        rkey = ct * np.int64(n) + cs
        if edge_keys.shape[0]:
            for k in ((key, rkey) if undirected else (key,)):
                pos = np.searchsorted(edge_keys, k)
                pos[pos >= edge_keys.shape[0]] = edge_keys.shape[0] - 1
                ok &= edge_keys[pos] != k
        key = np.unique(key[ok])
        if acc.shape[0]:
            key = key[~np.isin(key, acc)]
        acc = np.concatenate([acc, key])
        tries += 1
    # on a near-complete graph the retry budget can leave fewer negatives
    # than requested (the reference's bounded MAX_RETRIES behaves the same:
    # it skips a node's negative samples after 20 collisions)
    return acc[:n_neg]


def split_relationships(graph: Graph, holdout_fraction: float, *,
                        negative_sampling_ratio: float = 1.0,
                        undirected: bool = False,
                        seed: Optional[int] = None):
    """Returns ``(train_graph, test_table)`` where test_table has columns
    (source, target, label) — label 1.0 for held-out true edges, 0.0 for
    sampled non-edges (EdgeSplitter.POSITIVE/NEGATIVE).

    ``undirected=True``: the stored edge list carries both directions of each
    relationship (Graph orientation="undirected"); held-out positives are
    canonical (a < b) pairs whose BOTH directions leave the train graph, and
    counts are over pairs, not directed rows."""
    if not 0.0 <= holdout_fraction <= 1.0:
        raise ValueError("holdout_fraction must be in [0, 1]")
    src = np.asarray(graph.src, dtype=np.int64)
    dst = np.asarray(graph.dst, dtype=np.int64)
    w = graph.weight
    m = src.shape[0]
    n = graph.n
    rng = np.random.default_rng(seed)

    if undirected:
        canon = src < dst
        units = np.nonzero(canon)[0]           # one index per (a < b) pair
        mu = units.shape[0]
        n_pos = int(mu * holdout_fraction)
        pick = rng.choice(mu, size=n_pos, replace=False) if n_pos else \
            np.array([], dtype=np.int64)
        held = units[pick]
        # both directions of a held-out pair leave the train graph
        held_keys = np.sort(src[held] * np.int64(n) + dst[held])
        rev_keys = dst * np.int64(n) + src
        row_keys = src * np.int64(n) + dst
        mask = np.zeros(m, dtype=bool)
        for k in (row_keys, rev_keys):
            pos = np.searchsorted(held_keys, k)
            ok = pos < held_keys.shape[0]
            hit = np.zeros(m, dtype=bool)
            hit[ok] = held_keys[pos[ok]] == k[ok]
            mask |= hit
        pos_s, pos_t = src[held], dst[held]
        n_units = mu
    else:
        n_pos = int(m * holdout_fraction)
        pos_idx = rng.choice(m, size=n_pos, replace=False) if n_pos else \
            np.array([], dtype=np.int64)
        mask = np.zeros(m, dtype=bool)
        mask[pos_idx] = True
        pos_s, pos_t = src[mask], dst[mask]
        n_units = m

    train = Graph.from_edges(src[~mask], dst[~mask],
                             w[~mask] if w is not None else None, n=n)

    n_neg = int(negative_sampling_ratio * n_units * holdout_fraction)
    edge_keys = np.unique(src * np.int64(n) + dst)
    neg_keys = _sample_negatives(rng, n, n_neg, edge_keys, undirected)
    neg_s, neg_t = neg_keys // n, neg_keys % n

    test = pa.table({
        "source": np.concatenate([pos_s, neg_s]),
        "target": np.concatenate([pos_t, neg_t]),
        "label": np.concatenate([np.ones(n_pos),
                                 np.zeros(neg_s.shape[0])]),
    })
    return train, test
