"""GraphSage (mean aggregator): unsupervised training + inductive inference.

Reference: algo/src/main/java/org/neo4j/gds/embeddings/graphsage/ (~3082 LoC)
  * layer: h_k(v) = act(W_k · MEAN({h_{k-1}(v)} ∪ {h_{k-1}(u), u ∈ N_s(v)}))
    with N_s a per-layer uniform neighbor sample of size sampleSizes[k]
    (MeanAggregator.java:34-58); final embeddings are row-normalized
    (GraphSageHelper.java:95 NormalizeRows);
  * unsupervised loss over (node, positive, negative) triples — positive
    reached by a short random walk, negative sampled from the global
    distribution: L = −log σ(v·p) − Q·log σ(−v·n) (GraphSageLoss.java:68-75,
    Q = negativeSampleWeight);
  * training: minibatch gradient descent on the layer weights
    (GraphSageModelTrainer.java).

This implementation is NumPy forward/backward over the sampled layer
subgraphs (segment-mean matrices), exact gradients including the final row
normalization.  INFERENCE is the distributable surface: node batches fan
out over Ray tasks with the trained weights + feature matrix broadcast once
— each task builds its own sampled subgraph from the shared CSR (the
inductive property: embeddings depend only on the local neighborhood).
Training holds the feature matrix in memory (documented bound — the
reference does the same with its in-heap HugeObjectArray features).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional, Sequence

import numpy as np
import pyarrow as pa

from ..state.graph import Graph


def _act(x, kind):
    if kind == "sigmoid":
        return 1.0 / (1.0 + np.exp(-np.clip(x, -30, 30)))
    if kind == "relu":
        return np.maximum(x, 0.0)
    raise ValueError(f"unknown activation {kind!r}")


def _act_grad(y, kind):
    """d act / d input, expressed from the OUTPUT y."""
    if kind == "sigmoid":
        return y * (1.0 - y)
    return (y > 0).astype(np.float64)


@dataclass
class GraphSageModel:
    weights: list                      # per layer: (dim_out, dim_in)
    activation: str = "sigmoid"
    sample_sizes: tuple = (25, 10)
    seed: int = 42
    losses: list = field(default_factory=list)


def _sampled_layer(indptr, indices, nodes, s, rng):
    """Per node: self + up to s uniformly sampled neighbors.  Returns
    (prev_nodes, seg_ptr, member_idx): layer-k node i's mean pools rows
    member_idx[seg_ptr[i]:seg_ptr[i+1]] of the previous layer's matrix,
    whose row order is prev_nodes."""
    deg = indptr[nodes + 1] - indptr[nodes]
    take = np.minimum(deg, s)
    groups = []
    for i, v in enumerate(nodes):  # per-batch-node sampling (batch-sized loop)
        d = int(deg[i])
        if d == 0:
            groups.append(np.empty(0, dtype=np.int64))
        elif d <= s:
            groups.append(indices[indptr[v]:indptr[v] + d].astype(np.int64))
        else:
            sel = rng.choice(d, size=s, replace=False)
            groups.append(indices[indptr[v] + sel].astype(np.int64))
    seg_lens = 1 + take  # self + sampled neighbors
    seg_ptr = np.concatenate(([0], np.cumsum(seg_lens)))
    members = np.concatenate(
        [np.concatenate(([nodes[i]], g)) for i, g in enumerate(groups)])
    prev_nodes, inv = np.unique(members, return_inverse=True)
    return prev_nodes, seg_ptr, inv


def _forward(features, indptr, indices, batch, model, rng):
    """Forward pass for ``batch``; returns (normalized embeddings, cache)."""
    L = len(model.weights)
    node_sets = [np.asarray(batch, dtype=np.int64)]
    structs = []
    for k in range(L - 1, -1, -1):  # outermost layer samples first
        prev, seg_ptr, inv = _sampled_layer(
            indptr, indices, node_sets[0], model.sample_sizes[k]
            if k < len(model.sample_sizes) else model.sample_sizes[-1], rng)
        structs.insert(0, (seg_ptr, inv))
        node_sets.insert(0, prev)
    h = features[node_sets[0]]
    cache = {"h": [h], "means": [], "node_sets": node_sets,
             "structs": structs}
    for k in range(L):
        seg_ptr, inv = structs[k]
        # mean over each segment's member rows
        sums = np.zeros((seg_ptr.shape[0] - 1, h.shape[1]))
        np.add.at(sums, np.repeat(np.arange(seg_ptr.shape[0] - 1),
                                  np.diff(seg_ptr)), h[inv])
        means = sums / np.diff(seg_ptr)[:, None]
        z = means @ model.weights[k].T
        h = _act(z, model.activation)
        cache["means"].append(means)
        cache["h"].append(h)
    norms = np.linalg.norm(h, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    cache["norms"] = norms
    return h / norms, cache


def _backward(d_out, model, cache):
    """Gradients of the layer weights given dL/d(normalized output)."""
    h_last = cache["h"][-1]
    norms = cache["norms"]
    y = h_last / norms
    dh = (d_out - y * (y * d_out).sum(axis=1, keepdims=True)) / norms
    grads = [None] * len(model.weights)
    for k in range(len(model.weights) - 1, -1, -1):
        seg_ptr, inv = cache["structs"][k]
        means = cache["means"][k]
        dz = dh * _act_grad(cache["h"][k + 1], model.activation)
        grads[k] = dz.T @ means
        dmeans = dz @ model.weights[k]
        dmem = dmeans / np.diff(seg_ptr)[:, None]
        dprev = np.zeros_like(cache["h"][k])
        np.add.at(dprev, inv,
                  dmem[np.repeat(np.arange(seg_ptr.shape[0] - 1),
                                 np.diff(seg_ptr))])
        dh = dprev
    return grads


def graphsage_train(graph: Graph, features: np.ndarray, *,
                    embedding_dimension: int = 64,
                    sample_sizes: Sequence[int] = (25, 10),
                    activation: str = "sigmoid", epochs: int = 1,
                    batch_size: int = 100, learning_rate: float = 0.1,
                    negative_sample_weight: float = 20.0,
                    search_depth: int = 5, seed: int = 42) -> GraphSageModel:
    """Unsupervised GraphSage training; returns the model (layer weights)."""
    features = np.asarray(features, dtype=np.float64)
    n, fdim = features.shape
    if n != graph.n:
        raise ValueError("features must have graph.n rows")
    sh = graph.shards(1, "natural")[0]
    indptr, indices = sh.indptr, sh.indices.astype(np.int64)
    deg = np.diff(indptr)
    rng = np.random.default_rng(seed)
    L = len(sample_sizes)
    dims = [fdim] + [embedding_dimension] * L
    weights = [(rng.random((dims[k + 1], dims[k])) - 0.5)
               * np.sqrt(2.0 / dims[k]) for k in range(L)]
    model = GraphSageModel(weights, activation, tuple(sample_sizes), seed)
    p_neg = (deg + 1.0) ** 0.75
    p_neg /= p_neg.sum()
    Q = negative_sample_weight

    def walk_positive(vs, r):
        cur = vs.copy()
        steps = r.integers(1, search_depth + 1, vs.shape[0])
        for t in range(int(steps.max())):
            can = (deg[cur] > 0) & (t < steps)
            if not can.any():
                break
            c = cur[can]
            off = (r.random(c.shape[0]) * deg[c]).astype(np.int64)
            cur[can] = indices[indptr[c] + off]
        return cur

    nodes_all = np.arange(n, dtype=np.int64)
    for ep in range(epochs):
        order = rng.permutation(n)
        ep_loss = 0.0
        for lo in range(0, n, batch_size):
            vs = nodes_all[order[lo:lo + batch_size]]
            pos = walk_positive(vs, rng)
            neg = rng.choice(n, size=vs.shape[0], p=p_neg)
            trip = np.concatenate([vs, pos, neg])
            emb, cache = _forward(features, indptr, indices, trip, model, rng)
            b = vs.shape[0]
            ev, ep_, en = emb[:b], emb[b:2 * b], emb[2 * b:]
            pos_aff = (ev * ep_).sum(axis=1)
            neg_aff = (ev * en).sum(axis=1)
            s_pos = 1.0 / (1.0 + np.exp(-np.clip(pos_aff, -30, 30)))
            s_neg = 1.0 / (1.0 + np.exp(-np.clip(-neg_aff, -30, 30)))
            ep_loss += float(-np.log(s_pos + 1e-15).sum()
                             - Q * np.log(s_neg + 1e-15).sum())
            d = np.zeros_like(emb)
            gp = (s_pos - 1.0)[:, None]           # d/d pos_aff
            gn = (Q * (1.0 - s_neg))[:, None]     # d/d neg_aff
            d[:b] = gp * ep_ + gn * en
            d[b:2 * b] = gp * ev
            d[2 * b:] = gn * ev
            grads = _backward(d, model, cache)
            for k in range(L):
                model.weights[k] -= learning_rate * grads[k] / b
        model.losses.append(ep_loss / n)
    return model


def graphsage_embeddings(graph: Graph, features: np.ndarray,
                         model: GraphSageModel, *, batch_size: int = 512,
                         execution: str = "local",
                         seed: Optional[int] = None) -> pa.Table:
    """(vid, embedding list<float64>) for every node — row-normalized.  The
    ray path fans node batches over tasks with (weights, features, CSR)
    broadcast once; sampling is seeded per batch (deterministic at any
    parallelism)."""
    features = np.asarray(features, dtype=np.float64)
    sh = graph.shards(1, "natural")[0]
    indptr, indices = sh.indptr, sh.indices.astype(np.int64)
    n = graph.n
    s0 = model.seed if seed is None else seed
    batches = [np.arange(lo, min(lo + batch_size, n), dtype=np.int64)
               for lo in range(0, n, batch_size)]

    def infer(batch, bi):
        r = np.random.default_rng(s0 * 7919 + bi)
        emb, _ = _forward(features, indptr, indices, batch, model, r)
        return emb

    if execution == "ray":
        import ray
        shared = ray.put((features, indptr, indices, model))

        @ray.remote
        def _task(payload, batch, bi):
            feats, ip, ix, mdl = payload
            r = np.random.default_rng(s0 * 7919 + bi)
            emb, _ = _forward(feats, ip, ix, batch, mdl, r)
            return emb

        outs = ray.get([_task.remote(shared, b, i)
                        for i, b in enumerate(batches)])
    else:
        outs = [infer(b, i) for i, b in enumerate(batches)]
    emb = np.concatenate(outs) if outs else np.zeros((0, 0))
    return pa.table({"vid": np.arange(n, dtype=np.int64),
                     "embedding": pa.array(list(emb), pa.list_(pa.float64()))})
