"""Random walks with node2vec second-order biasing (return factor p, in-out
factor q) — the corpus generator for Node2Vec-style embedding training.

Reference: algo/src/main/java/org/neo4j/gds/traversal/RandomWalk.java (~480
LoC): walksPerNode walks of walkLength from every node, next step drawn by
rejection sampling with probabilities 1/p (back to the previous node), 1
(neighbor of the previous node), 1/q (otherwise) — RandomWalk.java uses exactly
this rejection scheme so no per-node alias tables are needed.

Vectorized formulation: ALL walks advance one step per round — a uniform
proposal per active walk (one gather), acceptance test per proposal (sorted-
adjacency membership check via searchsorted), rejected walks re-propose in the
next inner round.  Each round is O(active walks); the walk matrix is the only
state, so the distributed path shards walks (not the graph) with the CSR
broadcast — embarrassingly parallel, like the reference's per-partition tasks.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pyarrow as pa

from ..state.graph import Graph


def random_walks(graph: Graph, *, walks_per_node: int = 10,
                 walk_length: int = 80, return_factor: float = 1.0,
                 in_out_factor: float = 1.0, seed: int = 42,
                 source_nodes: Optional[np.ndarray] = None,
                 execution: str = "local", num_partitions: int = 4):
    """Returns (walk_id, start_node, path: list<int64>); walks stop early at
    sink nodes (like the reference).

    ``execution="ray"``: walkers advance inside vid-range CSR shard actors
    and the corpus comes back as a ray.data.Dataset built from per-shard
    tables — it never transits the driver (counter-based randomness, so the
    corpus is shard-count-independent but a DIFFERENT stream than the local
    rng path for the same seed; ``source_nodes`` unsupported there)."""
    if execution == "ray":
        if source_nodes is not None:
            raise ValueError("source_nodes is unsupported with "
                             "execution='ray' (walks start at every node)")
        from .node2vec_sharded import random_walks_distributed
        return random_walks_distributed(
            graph, walks_per_node=walks_per_node, walk_length=walk_length,
            return_factor=return_factor, in_out_factor=in_out_factor,
            seed=seed, num_partitions=num_partitions)
    sh = graph.shards(1, "natural")[0]
    indptr, indices = sh.indptr, sh.indices.astype(np.int64)
    deg = np.diff(indptr)
    rng = np.random.default_rng(seed)
    starts = (np.asarray(source_nodes, dtype=np.int64) if source_nodes is not None
              else np.arange(graph.n, dtype=np.int64))
    starts = np.repeat(starts, walks_per_node)
    nw = starts.shape[0]
    paths = np.full((nw, walk_length), -1, dtype=np.int64)
    paths[:, 0] = starts
    cur = starts.copy()
    prev = np.full(nw, -1, dtype=np.int64)
    alive = deg[cur] > 0
    p_inv = 1.0 / return_factor
    q_inv = 1.0 / in_out_factor
    max_prob = max(p_inv, 1.0, q_inv)

    def _is_neighbor(a, b):
        """b ∈ adj(a), vectorized (adjacency sorted ascending per source)."""
        lo = indptr[a]
        hi = indptr[a + 1]
        pos = np.empty(a.shape[0], dtype=np.int64)
        for i in range(a.shape[0]):  # searchsorted per walk on its own segment
            seg = indices[lo[i]:hi[i]]
            j = np.searchsorted(seg, b[i])
            pos[i] = 1 if (j < seg.shape[0] and seg[j] == b[i]) else 0
        return pos.astype(bool)

    for step in range(1, walk_length):
        idx_alive = np.nonzero(alive)[0]
        if idx_alive.shape[0] == 0:
            break
        chosen = np.full(nw, -1, dtype=np.int64)
        pending = idx_alive
        tries = 0
        while pending.shape[0] and tries < 64:
            c = cur[pending]
            u = rng.random(pending.shape[0])
            prop = indices[indptr[c] + (u * deg[c]).astype(np.int64)]
            if step == 1 or (return_factor == 1.0 and in_out_factor == 1.0):
                chosen[pending] = prop
                pending = pending[:0]
                break
            pr = prev[pending]
            prob = np.full(pending.shape[0], q_inv)
            back = prop == pr
            prob[back] = p_inv
            nb = ~back
            if nb.any():
                common = _is_neighbor(pr[nb], prop[nb])
                sub = np.nonzero(nb)[0]
                prob[sub[common]] = 1.0
            accept = rng.random(pending.shape[0]) * max_prob <= prob
            chosen[pending[accept]] = prop[accept]
            pending = pending[~accept]
            tries += 1
        if pending.shape[0]:  # bounded retries: fall back to uniform
            c = cur[pending]
            u = rng.random(pending.shape[0])
            chosen[pending] = indices[indptr[c] + (u * deg[c]).astype(np.int64)]
        moved = chosen >= 0
        prev = np.where(moved, cur, prev)
        cur = np.where(moved, chosen, cur)
        paths[moved, step] = cur[moved]
        alive = moved & (deg[cur] > 0)

    lens = (paths >= 0).sum(axis=1)
    return pa.table({
        "walk_id": np.arange(nw, dtype=np.int64),
        "start_node": starts,
        "path": pa.array([paths[i, :lens[i]].tolist() for i in range(nw)],
                         pa.list_(pa.int64())),
    })
