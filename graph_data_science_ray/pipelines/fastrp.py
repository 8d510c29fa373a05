"""FastRP node embeddings (Fast Random Projection).

Reference: algo/src/main/java/org/neo4j/gds/embeddings/fastrp/FastRP.java:55+ —
  * init: per-node sparse random vector, entries ±(deg^normalizationStrength ·
    √SPARSITY/√d) with probability 1/(2·SPARSITY)=1/6 each (SPARSITY=3,
    FastRP.java:57-58, InitRandomVectorTask:330-360); seeded per node;
  * iterations (default iterationWeights [0.0, 1.0, 1.0],
    FastRPBaseConfig.java:39): cur[v] = l2norm( (1/deg) Σ_out prev[t]·w ),
    result += iterationWeight · cur (PropagateEmbeddingsTask:440-472);
  * optional nodeSelfInfluence adds init/‖init‖ to the result.

The per-node RNG stream is impl-specific (the reference uses a custom xorshift
"HighQualityRandom"); embeddings are random projections, so conformance is
structural (dimension, per-iteration unit norms, same-neighborhood ⇒ same
embedding under default weights, determinism per seed), matching the
reference's own test strategy (FastRPTest).

Scale shape: one iteration = a degree-normalized SpMM.  Locally it's a
segment-reduce over the CSR; distributed, each shard computes its row block
against the broadcast previous-iteration matrix (ray.put once per iteration —
n×d floats; the per-destination slicing path applies beyond single-broadcast
scale, like the Pregel dense payloads)."""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import pyarrow as pa

from ..state.graph import Graph

SPARSITY = 3


def _init_vectors(n, deg, dim, normalization_strength, rng):
    entry = np.sqrt(SPARSITY) / np.sqrt(dim)
    scale = np.where(deg == 0, 1.0,
                     np.power(np.maximum(deg, 1), normalization_strength))
    u = rng.random((n, dim))
    vec = np.zeros((n, dim), dtype=np.float64)
    p = 1.0 / (2 * SPARSITY)
    vec[u < p] = entry
    vec[(u >= p) & (u < 2 * p)] = -entry
    return vec * scale[:, None]


def fastrp(graph: Graph, *, embedding_dimension: int = 128,
           iteration_weights: Sequence[float] = (0.0, 1.0, 1.0),
           normalization_strength: float = 0.0,
           node_self_influence: float = 0.0,
           weighted: Optional[bool] = None, seed: int = 42,
           execution: str = "auto", local_threshold: int = 200_000) -> pa.Table:
    """Returns (vid, embedding: list<float>).  Deterministic per seed."""
    if weighted is None:
        weighted = graph.is_weighted
    n = graph.n
    sh = graph.shards(1, "natural")[0]
    indptr = sh.indptr
    indices = sh.indices.astype(np.int64)
    w = (sh.weights if (weighted and sh.weights is not None)
         else np.ones(indices.shape[0]))
    deg = np.diff(indptr)
    rng = np.random.default_rng(seed)
    prev = _init_vectors(n, deg, embedding_dimension, normalization_strength, rng)
    result = np.zeros((n, embedding_dimension), dtype=np.float64)
    if node_self_influence:
        norms = np.linalg.norm(prev, axis=1)
        norms[norms < 1e-12] = 1.0
        result += node_self_influence * prev / norms[:, None]

    if execution == "auto":
        execution = "local" if n <= local_threshold else "ray"

    pos = deg > 0
    seg_starts = indptr[:-1][pos]

    def _iterate_local(prev_m):
        gathered = prev_m[indices] * w[:, None]
        cur = np.zeros((n, embedding_dimension))
        if seg_starts.shape[0]:
            cur[pos] = np.add.reduceat(gathered, seg_starts, axis=0)
        cur /= np.maximum(deg, 1)[:, None]
        norms = np.linalg.norm(cur, axis=1)
        norms[norms < 1e-12] = 1.0
        return cur / norms[:, None]

    if execution == "local":
        for iw in iteration_weights:
            cur = _iterate_local(prev)
            result += float(iw) * cur
            prev = cur
    else:
        import ray
        bounds = np.linspace(0, n, min(32, max(2, n // 65536)) + 1,
                             dtype=np.int64)

        @ray.remote
        def _rows(lo, hi, pm):
            # top-level ObjectRef args auto-resolve: pm arrives as a zero-copy
            # plasma view of the previous-iteration matrix
            sl = slice(int(indptr[lo]), int(indptr[hi]))
            idx = indices[sl]
            ww = w[sl]
            gathered = pm[idx] * ww[:, None]
            dd = deg[lo:hi]
            cur = np.zeros((hi - lo, embedding_dimension))
            ppos = dd > 0
            if ppos.any():
                ss = indptr[lo:hi][ppos] - indptr[lo]
                cur[ppos] = np.add.reduceat(gathered, ss, axis=0)
            cur /= np.maximum(dd, 1)[:, None]
            norms = np.linalg.norm(cur, axis=1)
            norms[norms < 1e-12] = 1.0
            return cur / norms[:, None]

        for iw in iteration_weights:
            prev_ref = ray.put(prev)
            parts = ray.get([_rows.remote(int(bounds[i]), int(bounds[i + 1]),
                                          prev_ref)
                             for i in range(len(bounds) - 1)])
            cur = np.concatenate(parts)
            result += float(iw) * cur
            prev = cur

    emb32 = result.astype(np.float32)
    return pa.table({"vid": np.arange(n, dtype=np.int64),
                     "embedding": pa.array([r for r in emb32.tolist()],
                                           pa.list_(pa.float32()))})
