"""K-nearest-neighbors over an embedding column — the exact kNN graph that the
reference's gds.beta.knn (algo/.../similarity/knn/Knn.java:46, randomized
join iterations) converges toward.

Baseline path (this module): the normalized embedding matrix is broadcast ONCE
(``ray.put``), each batch does one float64 matmul against it and keeps its rows'
top-k — one streaming pass, no shuffle.  Memory bound: n×d×8 bytes must fit a
worker (documented); past that the scale path is the LSH-bucketed variant
(functions/similarity.py: HyperplaneLsh buckets → per-bucket exact top-k),
trading recall for a bounded candidate set — the same trade the reference makes
with iterative random joins.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def knn_graph(emb_ds, k: int = 10, *, batch_size: int = 1024,
              metric: str = "cosine") -> pa.Table:
    """Exact kNN: for every vector, its k most similar others.  Returns
    (node1, node2, similarity) sorted by (node1, rank); ties → smaller node2
    (deterministic).  Metrics (the alpha similarity family —
    alpha/.../impl/similarity): "cosine" (default), "pearson" (cosine of
    mean-centered vectors), "euclidean" (similarity = 1/(1+distance), ranking
    identical to nearest-by-L2)."""
    import ray

    ids_l, vecs_l = [], []
    for b in emb_ds.iter_batches(batch_format="pyarrow", batch_size=8192):
        ids_l.append(b.column("vec_id").to_numpy(zero_copy_only=False))
        vecs_l.append(np.asarray(b.column("embedding").to_pylist(),
                                 dtype=np.float64))
    ids = np.concatenate(ids_l)
    mat = np.concatenate(vecs_l)
    order = np.argsort(ids, kind="stable")
    ids, mat = ids[order], mat[order]
    if metric == "pearson":
        mat = mat - mat.mean(axis=1, keepdims=True)
    if metric in ("cosine", "pearson"):
        norms = np.linalg.norm(mat, axis=1)
        norms[norms == 0] = 1e-30
        matn = mat / norms[:, None]
    elif metric == "euclidean":
        matn = mat  # similarity computed from distances below
    else:
        raise ValueError(f"unknown metric {metric!r}")
    sq = (matn ** 2).sum(axis=1)
    mat_ref = ray.put((ids, matn, sq, metric))

    @ray.remote
    def _topk(lo, hi):
        all_ids, m, sqn, met = ray.get(mat_ref)  # zero-copy plasma view
        if met == "euclidean":
            # similarity = 1/(1 + L2): same ranking as nearest-by-distance
            d2 = np.maximum(sqn[lo:hi][:, None] + sqn[None, :]
                            - 2.0 * (m[lo:hi] @ m.T), 0.0)
            sims = 1.0 / (1.0 + np.sqrt(d2))
        else:
            sims = m[lo:hi] @ m.T
        np.put_along_axis(sims, np.arange(lo, hi)[:, None] , -np.inf, axis=1)
        kk = min(k, m.shape[0] - 1)
        part = np.argpartition(-sims, kk - 1, axis=1)[:, :kk]
        rows = np.repeat(np.arange(hi - lo), kk)
        cand_sims = sims[rows, part.ravel()].reshape(hi - lo, kk)
        # order within row: sim desc, then smaller candidate id
        ordk = np.lexsort((all_ids[part], -cand_sims), axis=1)
        part = np.take_along_axis(part, ordk, axis=1)
        cand_sims = np.take_along_axis(cand_sims, ordk, axis=1)
        return pa.table({
            "node1": np.repeat(all_ids[lo:hi], kk),
            "node2": all_ids[part.ravel()],
            "similarity": cand_sims.ravel()})

    n = ids.shape[0]
    refs = [_topk.remote(lo, min(lo + batch_size, n))
            for lo in range(0, n, batch_size)]
    out = pa.concat_tables(ray.get(refs))
    return out
