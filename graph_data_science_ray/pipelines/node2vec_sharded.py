"""Actor-sharded Node2Vec SGNS training (round-3 VERDICT Wrong #4 / next #8).

The model-averaging path held BOTH n×d embedding matrices on the driver and
re-broadcast them every epoch — O(n·d) driver memory and averaging semantics
that drift from sequential SGD at high shard counts.  This module replaces
the ray path with vid-range *embedding shards held in actors* (a
parameter-server without a server):

* Actor q owns ``center_emb[lo_q:hi_q]`` and ``context_emb[lo_q:hi_q]`` plus
  the (center, context) pairs whose CENTER vid falls in its range.  The
  driver holds only O(P) object refs — never an embedding matrix.
* A training round is a 4-phase exchange, wired entirely with object refs
  (``num_returns=P`` everywhere, no driver ``ray.get`` of payloads):
    1. ``request``  — q draws its next minibatch + negatives (seeded rng),
       returns the context vids it needs, grouped by owner.
    2. ``serve``    — p gathers the requested context rows per requester.
    3. ``compute``  — q assembles context rows, computes the SGNS gradients,
       applies its CENTER update in place (it owns those rows), and returns
       per-owner context-gradient bundles (ids, grad-sum, count).
    4. ``apply``    — p applies each requester's mean-gradient step in fixed
       q order (deterministic; per-requester means rather than one global
       mean — documented divergence from the single-process kernel).
  Network bytes per round: O(B·(1+k)·d) rows+grads total — proportional to
  the minibatch, never to n.
* Epochs permute each actor's pair shard with a per-(seed, q, epoch) rng;
  rounds advance lock-step with a barrier every ``sync_every`` rounds to
  bound the in-flight task graph.

Semantics: per-row updates are serialized at the owner, so this is closer to
sequential SGD than model averaging; conformance oracle remains the local
kernel (node2vec.py `_sgns_epoch`), with determinism and structure invariants
tested in tests/test_node2vec.py.  Ref: algo/src/main/java/org/neo4j/gds/
embeddings/node2vec/Node2VecModel.java (per-batch positive/negative task
training over shared arrays — here the shared arrays become owned shards).

Documented remaining driver bound: the walk corpus and the pair arrays are
generated driver-side (pipelines/walks.py returns a materialized table)
before being routed to their owners — O(#pairs) ints, not O(n·d) floats.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


class _N2VShard:
    """One vid-range shard of both embedding matrices + its pair shard."""

    def __init__(self, q: int, bounds: np.ndarray, d: int,
                 pairs_c: np.ndarray, pairs_x: np.ndarray,
                 neg_table: np.ndarray, neg_k: int, batch: int, seed: int):
        self.q = q
        self.bounds = np.asarray(bounds)
        self.lo, self.hi = int(bounds[q]), int(bounds[q + 1])
        nloc = self.hi - self.lo
        rng = np.random.default_rng((seed, 7, q))
        self.center = (rng.random((nloc, d)) - 0.5) / d
        self.context = np.zeros((nloc, d))
        self.c = np.asarray(pairs_c)
        self.x = np.asarray(pairs_x)
        self.neg_table = np.asarray(neg_table)
        self.neg_k = neg_k
        self.B = batch
        self.seed = seed
        self.P = len(bounds) - 1
        self.lr = 0.025
        self._pending = None
        self._order = None
        self._ep = -1

    def request(self, ep: int, rnd: int, lr: float):
        """Phase 1: draw minibatch ``rnd`` of epoch ``ep`` + negatives;
        return per-owner unique context-vid requests (num_returns=P).
        Epoch state (lr, pair permutation) is folded in here so the driver
        never needs a per-epoch barrier — actor tasks run in submission
        order, which is the only ordering the phases rely on."""
        if ep != self._ep:
            self._ep = ep
            self.lr = lr
            self._order = np.random.default_rng(
                (self.seed, 11, self.q, ep)).permutation(self.c.shape[0])
        lo_i = rnd * self.B
        cc = self.c[self._order[lo_i:lo_i + self.B]]
        xx = self.x[self._order[lo_i:lo_i + self.B]]
        nb = cc.shape[0]
        if nb == 0:
            self._pending = None
            return tuple(np.empty(0, np.int64) for _ in range(self.P))
        rng = np.random.default_rng((self.seed, 13, self.q, self._ep, rnd))
        negs = self.neg_table[rng.integers(0, self.neg_table.shape[0],
                                           size=(nb, self.neg_k))]
        need = np.unique(np.concatenate([xx, negs.ravel()]))
        self._pending = (cc, xx, negs, need)
        cuts = np.searchsorted(need, self.bounds)
        return tuple(need[cuts[p]:cuts[p + 1]] for p in range(self.P))

    def serve(self, *reqs):
        """Phase 2: gather my context rows for each requester
        (num_returns=P)."""
        return tuple(self.context[np.asarray(r) - self.lo]
                     if np.asarray(r).shape[0] else
                     np.empty((0, self.context.shape[1]))
                     for r in reqs)

    def compute(self, *row_blocks):
        """Phase 3: SGNS gradients over the pending minibatch.  Applies the
        center update in place; returns per-owner (ids, grad_sum, count)
        context-gradient bundles (num_returns=P)."""
        if self._pending is None:
            return tuple(None for _ in range(self.P))
        cc, xx, negs, need = self._pending
        self._pending = None
        ctx = np.concatenate([np.asarray(b) for b in row_blocks], axis=0)
        # row_blocks arrive in owner order == sorted-need order
        pos_ix = np.searchsorted(need, xx)
        neg_ix = np.searchsorted(need, negs)
        v = self.center[cc - self.lo]                  # (b, d) — owned rows
        u_pos = ctx[pos_ix]                            # (b, d)
        u_neg = ctx[neg_ix]                            # (b, k, d)
        z_pos = np.clip(np.einsum("bd,bd->b", v, u_pos), -30, 30)
        z_neg = np.clip(np.einsum("bkd,bd->bk", u_neg, v), -30, 30)
        s_pos = 1.0 / (1.0 + np.exp(-z_pos))
        s_neg = 1.0 / (1.0 + np.exp(-z_neg))
        g_pos = (s_pos - 1.0)[:, None]
        grad_v = g_pos * u_pos + np.einsum("bk,bkd->bd", s_neg, u_neg)
        # owned center rows: per-unique-id mean step, in place
        uniq, inv = np.unique(cc, return_inverse=True)
        acc = np.zeros((uniq.shape[0], v.shape[1]))
        np.add.at(acc, inv, grad_v)
        cnt = np.bincount(inv).astype(np.float64)
        self.center[uniq - self.lo] -= self.lr * acc / cnt[:, None]
        # context gradients → owner bundles
        ctx_ids = np.concatenate([xx, negs.ravel()])
        ctx_grads = np.concatenate(
            [g_pos * v,
             (s_neg[:, :, None] * v[:, None, :]).reshape(-1, v.shape[1])])
        cuniq, cinv = np.unique(ctx_ids, return_inverse=True)
        cacc = np.zeros((cuniq.shape[0], v.shape[1]))
        np.add.at(cacc, cinv, ctx_grads)
        ccnt = np.bincount(cinv).astype(np.float64)
        cuts = np.searchsorted(cuniq, self.bounds)
        return tuple((cuniq[cuts[p]:cuts[p + 1]],
                      cacc[cuts[p]:cuts[p + 1]],
                      ccnt[cuts[p]:cuts[p + 1]])
                     if cuts[p + 1] > cuts[p] else None
                     for p in range(self.P))

    def apply(self, *bundles):
        """Phase 4: apply each requester's mean context-gradient step, fixed
        q order (deterministic)."""
        for b in bundles:
            if b is None:
                continue
            ids, acc, cnt = b
            self.context[np.asarray(ids) - self.lo] -= \
                self.lr * np.asarray(acc) / np.asarray(cnt)[:, None]
        return True

    def result(self) -> pa.Table:
        vids = np.arange(self.lo, self.hi, dtype=np.int64)
        return pa.table({"vid": vids,
                         "embedding": pa.array(list(self.center),
                                               pa.list_(pa.float64()))})


def train_sharded(n: int, c: np.ndarray, x: np.ndarray,
                  neg_table: np.ndarray, *, d: int, epochs: int,
                  initial_learning_rate: float, min_learning_rate: float,
                  neg_k: int, seed: int, num_partitions: int,
                  batch: int = 4096, sync_every: int = 8,
                  as_dataset: bool = False):
    """Drive the 4-phase exchange.  Returns (vid, embedding) — as a pa.Table
    (per-shard results concatenated, O(n·d) only in the returned value) or,
    with ``as_dataset=True``, a ray.data.Dataset built from the shard refs so
    the embedding table never flows through the driver."""
    import ray

    P = max(1, min(num_partitions, n))
    bounds = np.linspace(0, n, P + 1).astype(np.int64)
    owner = np.searchsorted(bounds, c, side="right") - 1
    Actor = ray.remote(_N2VShard)
    neg_ref = ray.put(neg_table)  # broadcast once, not P copies
    workers = []
    max_pairs = 0
    for q in range(P):
        m = owner == q
        max_pairs = max(max_pairs, int(m.sum()))
        workers.append(Actor.remote(q, bounds, d, c[m], x[m], neg_ref,
                                    neg_k, batch, seed))
    rounds = max(1, -(-max_pairs // batch))
    try:
        return _drive_rounds(workers, P, epochs, rounds, sync_every,
                             initial_learning_rate, min_learning_rate,
                             as_dataset)
    finally:
        for w in workers:  # also on exception: don't leak embedding shards
            ray.kill(w)


def _drive_rounds(workers, P, epochs, rounds, sync_every,
                  initial_learning_rate, min_learning_rate, as_dataset):
    import ray
    barrier, tick = [], 0
    for ep in range(epochs):
        lr = max(min_learning_rate,
                 initial_learning_rate * (1.0 - ep / epochs))
        for rnd in range(rounds):
            reqs = [w.request.options(num_returns=P).remote(ep, rnd, lr)
                    for w in workers]
            if P == 1:
                reqs = [[r] for r in reqs]
            served = [workers[p].serve.options(num_returns=P).remote(
                *[reqs[q][p] for q in range(P)]) for p in range(P)]
            if P == 1:
                served = [[s] for s in served]
            grads = [workers[q].compute.options(num_returns=P).remote(
                *[served[p][q] for p in range(P)]) for q in range(P)]
            if P == 1:
                grads = [[g] for g in grads]
            barrier = [workers[p].apply.remote(*[grads[q][p]
                                                 for q in range(P)])
                       for p in range(P)]
            tick += 1
            if tick % sync_every == 0:  # backpressure only — ordering is
                ray.get(barrier)        # per-actor submission order
    if barrier:
        ray.get(barrier)
    shard_tabs = [w.result.remote() for w in workers]
    if as_dataset:
        import ray.data
        # wait until every shard table exists in plasma so the caller's
        # try/finally may kill the producer actors without losing blocks
        # (the data stays distributed — the driver only waits, never gets)
        ray.wait(shard_tabs, num_returns=len(shard_tabs))
        return ray.data.from_arrow_refs(shard_tabs)
    return pa.concat_tables(ray.get(shard_tabs))
