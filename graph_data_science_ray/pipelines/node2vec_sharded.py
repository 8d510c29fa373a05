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

Walk generation is ALSO sharded (round-4 VERDICT next #3): each actor holds
the CSR shard of its vid range, walks resident at their CURRENT node's owner
advance one step per round (counter-based splitmix64 randomness over (seed,
walker, step, try) — the corpus is identical at any shard count), biased
steps resolve the prop∈adj(prev) membership test with one extra per-round
exchange to prev's owner, and (center, context) pairs are routed straight to
their center-vid owner.  Nothing O(#walks) or O(#pairs) transits the driver
— it holds only per-shard counts and the O(n) frequency vector for the
negative table.  The driver-side reference kernel ``walk_pairs_reference``
(same hash randomness, whole CSR) is the conformance oracle
(tests/test_node2vec.py asserts pair-multiset + frequency equality across
shard counts).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_T_TRIES = 16  # bounded rejection-sampling tries per biased step, then uniform


def _u01(seed: int, wid, step: int, t):
    """Deterministic counter-based uniform draws in [0,1): splitmix64
    finalizer over a linear combination of the walk coordinates.  Being a
    pure function of (seed, walker, step, try), the walk corpus is identical
    at ANY shard count — the sharded phase equals the driver-side reference
    kernel bit-for-bit.  Ref semantics: RandomWalk.java's per-walk random
    streams; the counter construction itself follows the splitmix64 public
    algorithm (Steele et al., 'Fast Splittable Pseudorandom Number
    Generators')."""
    with np.errstate(over="ignore"):
        x = (np.asarray(wid, dtype=np.uint64) * np.uint64(0xBF58476D1CE4E5B9)
             + np.uint64((int(seed) * 0x9E3779B97F4A7C15) & (2**64 - 1))
             + np.uint64(step) * np.uint64(0x94D049BB133111EB)
             + np.asarray(t, dtype=np.uint64) * np.uint64(0xD6E8FEB86659FD93))
        x = x ^ (x >> np.uint64(30))
        x = x * np.uint64(0xBF58476D1CE4E5B9)
        x = x ^ (x >> np.uint64(27))
        x = x * np.uint64(0x94D049BB133111EB)
        x = x ^ (x >> np.uint64(31))
    return x / np.float64(2.0 ** 64)


def _member_sorted(keys: np.ndarray, query: np.ndarray) -> np.ndarray:
    """query ∈ keys (keys sorted ascending), vectorized."""
    if keys.shape[0] == 0:
        return np.zeros(query.shape, dtype=bool)
    pos = np.searchsorted(keys, query)
    out = np.zeros(query.shape, dtype=bool)
    hit = pos < keys.shape[0]
    out[hit] = keys[pos[hit]] == query[hit]
    return out


def _owner_bundles(owner: np.ndarray, P: int):
    """(sort order, per-owner slice cuts) for routing rows to P owners."""
    order = np.argsort(owner, kind="stable")
    cuts = np.searchsorted(owner[order], np.arange(P + 1))
    return order, cuts


class _N2VShard:
    """One vid-range shard: both embedding matrices, the CSR slice for the
    walk phase, the resident walkers, and the pair shard they produce."""

    def __init__(self, q: int, bounds: np.ndarray, d: int,
                 neg_k: int, batch: int, seed: int):
        self.q = q
        self.bounds = np.asarray(bounds)
        self.lo, self.hi = int(bounds[q]), int(bounds[q + 1])
        nloc = self.hi - self.lo
        rng = np.random.default_rng((seed, 7, q))
        self.center = (rng.random((nloc, d)) - 0.5) / d
        self.context = np.zeros((nloc, d))
        self.c = None
        self.x = None
        self.neg_table = None
        self.neg_k = neg_k
        self.B = batch
        self.seed = seed
        self.P = len(bounds) - 1
        self.lr = 0.025
        self._pending = None
        self._order = None
        self._ep = -1

    def _ret(self, out):
        """num_returns=P return: Ray only splits tuples when P > 1 — with
        P == 1 the caller receives the value itself, so return it bare."""
        return out[0] if self.P == 1 else tuple(out)

    def load_pairs(self, pairs_c, pairs_x, neg_table) -> bool:
        """Direct pair injection (train_sharded API, pairs precomputed)."""
        self.c = np.asarray(pairs_c)
        self.x = np.asarray(pairs_x)
        self.neg_table = np.asarray(neg_table)
        return True

    # ---- sharded walk phase -------------------------------------------------

    def init_walks(self, shard_ref, walks_per_node: int, window: int,
                   return_factor: float, in_out_factor: float,
                   record: bool = False, walk_length: int = 0) -> int:
        """Create the resident walkers for my vid range; returns #active.

        ``record=True`` (distributed random_walks): the tail is widened to
        the full walk length so each walker carries its whole path, finished
        walkers (sink-hit) are retained instead of dropped, and
        ``finish_walk_paths`` returns this shard's walk table."""
        from .pregel import _resolve_shard
        sh = _resolve_shard(shard_ref)
        self.indptr = sh.indptr
        self.indices = sh.indices.astype(np.int64)
        self.deg = np.diff(self.indptr)
        n = int(self.bounds[-1])
        self.nmul = n  # adjacency membership key: src·n + dst (sorted CSR)
        srcs = np.repeat(np.arange(self.lo, self.hi, dtype=np.int64), self.deg)
        self.K = srcs * self.nmul + self.indices
        self.window = window
        self.record = record
        # tail[-1] = cur, tail[-2] = prev; record mode keeps the whole path
        self.tailw = max(walk_length, 2) if record else max(window, 2)
        self.p_inv = 1.0 / return_factor
        self.q_inv = 1.0 / in_out_factor
        self.max_prob = max(self.p_inv, 1.0, self.q_inv)
        self.first_order = (return_factor == 1.0 and in_out_factor == 1.0)
        starts = np.repeat(np.arange(self.lo, self.hi, dtype=np.int64),
                           walks_per_node)
        # global walker id (P-independent): start·walks_per_node + replica
        self.w_id = (self.lo * walks_per_node
                     + np.arange(starts.shape[0], dtype=np.int64))
        self.w_tail = np.full((starts.shape[0], self.tailw), -1, dtype=np.int64)
        self.w_tail[:, -1] = starts
        nloc = self.hi - self.lo
        # every local node appears walks_per_node times at path position 0
        self.freq = np.full(nloc, walks_per_node, dtype=np.int64)
        alive = self.deg[starts - self.lo] > 0
        self.done_ids: list = []
        self.done_tails: list = []
        if record and (~alive).any():  # length-1 walks from sink starts
            self.done_ids.append(self.w_id[~alive])
            self.done_tails.append(self.w_tail[~alive])
        self.w_id = self.w_id[alive]
        self.w_tail = self.w_tail[alive]
        self.pairs_c: list = []
        self.pairs_x: list = []
        self._props = None
        self._qorder = None
        return int(self.w_id.shape[0])

    def walk_queries(self, step: int):
        """Biased steps only: draw the _T_TRIES candidate proposals for every
        resident walker and return the (prev, proposals) membership queries
        grouped by prev's owner (num_returns=P)."""
        P = self.P
        w = self.w_id.shape[0]
        if self.first_order or step == 1 or w == 0:
            self._props = None
            self._qorder = None
            return self._ret([None] * P)
        T = _T_TRIES
        cur = self.w_tail[:, -1]
        prev = self.w_tail[:, -2]
        loc = cur - self.lo
        dl = self.deg[loc]
        u1 = _u01(self.seed, self.w_id[:, None], step,
                  3 * np.arange(T, dtype=np.int64)[None, :])
        props = self.indices[self.indptr[loc][:, None]
                             + (u1 * dl[:, None]).astype(np.int64)]
        self._props = props
        ownr = np.searchsorted(self.bounds, prev, side="right") - 1
        order, cuts = _owner_bundles(ownr, P)
        self._qorder = order
        out = []
        for p in range(P):
            rows = order[cuts[p]:cuts[p + 1]]
            out.append((prev[rows], props[rows]) if rows.shape[0] else None)
        return self._ret(out)

    def walk_answers(self, *bundles):
        """prop ∈ adj(prev) bits for each requester's bundle
        (num_returns=P; prev rows are all in MY vid range)."""
        out = []
        for b in bundles:
            if b is None:
                out.append(None)
                continue
            prev, props = np.asarray(b[0]), np.asarray(b[1])
            key = prev[:, None] * self.nmul + props
            out.append(_member_sorted(self.K, key.ravel()).reshape(props.shape))
        return self._ret(out)

    def walk_advance(self, step: int, *answer_bundles):
        """Advance every resident walker one step; emit (center, context)
        pairs for the new position; route walkers + pairs to their owners
        (num_returns=P; element p = (walker_bundle, pair_bundle) or None)."""
        P = self.P
        w = self.w_id.shape[0]
        if w == 0:
            return self._ret([None] * P)
        cur = self.w_tail[:, -1]
        loc = cur - self.lo
        dl = self.deg[loc]
        if self.first_order or step == 1:
            u = _u01(self.seed, self.w_id, step, 0)
            new = self.indices[self.indptr[loc] + (u * dl).astype(np.int64)]
        else:
            T = _T_TRIES
            props = self._props
            prev = self.w_tail[:, -2]
            bits = np.zeros((w, T), dtype=bool)
            parts = [np.asarray(b) for b in answer_bundles if b is not None]
            if parts:
                bits[self._qorder] = np.concatenate(parts, axis=0)
            prob = np.where(bits, 1.0, self.q_inv)
            back = props == prev[:, None]
            prob[back] = self.p_inv
            u2 = _u01(self.seed, self.w_id[:, None], step,
                      3 * np.arange(T, dtype=np.int64)[None, :] + 1)
            ok = u2 * self.max_prob <= prob
            anyok = ok.any(axis=1)
            new = props[np.arange(w), np.argmax(ok, axis=1)]
            if (~anyok).any():  # bounded retries exhausted: uniform fallback
                idx = np.nonzero(~anyok)[0]
                uf = _u01(self.seed, self.w_id[idx], step, 3 * T)
                new[idx] = self.indices[self.indptr[loc[idx]]
                                        + (uf * dl[idx]).astype(np.int64)]
            self._props = None
            self._qorder = None
        # pairs (position step-off, step), both directions, off = 1..window
        pcs, pxs = [], []
        for off in range(1, self.window + 1):
            partner = self.w_tail[:, self.tailw - off]
            m = partner >= 0
            if m.any():
                pcs.extend((partner[m], new[m]))
                pxs.extend((new[m], partner[m]))
        # route pairs to center owner
        pair_out = [None] * P
        if pcs:
            pc = np.concatenate(pcs)
            px = np.concatenate(pxs)
            po = np.searchsorted(self.bounds, pc, side="right") - 1
            order, cuts = _owner_bundles(po, P)
            for p in range(P):
                rows = order[cuts[p]:cuts[p + 1]]
                if rows.shape[0]:
                    pair_out[p] = (pc[rows], px[rows])
        # advance tails and route walkers to new cur's owner
        self.w_tail[:, :-1] = self.w_tail[:, 1:]
        self.w_tail[:, -1] = new
        wo = np.searchsorted(self.bounds, new, side="right") - 1
        order, cuts = _owner_bundles(wo, P)
        out = []
        for p in range(P):
            rows = order[cuts[p]:cuts[p + 1]]
            wb = ((self.w_id[rows], self.w_tail[rows])
                  if rows.shape[0] else None)
            out.append(None if wb is None and pair_out[p] is None
                       else (wb, pair_out[p]))
        self.w_id = np.empty(0, dtype=np.int64)
        self.w_tail = np.empty((0, self.tailw), dtype=np.int64)
        return self._ret(out)

    def walk_absorb(self, *elems) -> int:
        """Accept routed walkers + pairs; count visit frequencies; drop
        walkers that reached a sink.  Returns my new #active (the driver's
        early-termination signal)."""
        wid_parts, tail_parts = [], []
        for el in elems:
            if el is None:
                continue
            wb, pb = el
            if pb is not None:
                self.pairs_c.append(np.asarray(pb[0]))
                self.pairs_x.append(np.asarray(pb[1]))
            if wb is not None:
                wid_parts.append(np.asarray(wb[0]))
                tail_parts.append(np.asarray(wb[1]))
        if wid_parts:
            wid = np.concatenate(wid_parts)
            tail = np.concatenate(tail_parts, axis=0)
            loc = tail[:, -1] - self.lo
            np.add.at(self.freq, loc, 1)
            alive = self.deg[loc] > 0
            if self.record and (~alive).any():  # sink-hit: retain the path
                self.done_ids.append(wid[~alive])
                self.done_tails.append(tail[~alive])
            self.w_id = wid[alive]
            self.w_tail = tail[alive]
        return int(self.w_id.shape[0])

    def finish_walks(self):
        """Freeze the routed pairs as my training shard; release walk state.
        Returns (#pairs, my dense freq slice) — O(nloc) to the driver."""
        self.c = (np.concatenate(self.pairs_c) if self.pairs_c
                  else np.empty(0, dtype=np.int64))
        self.x = (np.concatenate(self.pairs_x) if self.pairs_x
                  else np.empty(0, dtype=np.int64))
        self.pairs_c = self.pairs_x = None
        self.indptr = self.indices = self.K = self.deg = None
        self.w_id = self.w_tail = None
        freq, self.freq = self.freq, None
        return int(self.c.shape[0]), freq

    def set_neg_table(self, neg_table) -> bool:
        self.neg_table = np.asarray(neg_table)
        return True

    def dump_pairs(self):
        """TESTING ONLY: my (c, x) pair shard (after finish_walks)."""
        return self.c, self.x

    def finish_walk_paths(self) -> pa.Table:
        """Record mode: this shard's finished + still-resident walks as
        (walk_id, start_node, path: list<int64>), sorted by walk_id.  A walk
        ends at its LAST node's owner, so the corpus is naturally sharded;
        the caller builds a Dataset from the per-shard refs."""
        ids = self.done_ids + ([self.w_id] if self.w_id.shape[0] else [])
        tails = self.done_tails + ([self.w_tail]
                                   if self.w_id.shape[0] else [])
        if not ids:
            return pa.table({"walk_id": pa.array([], pa.int64()),
                             "start_node": pa.array([], pa.int64()),
                             "path": pa.array([], pa.list_(pa.int64()))})
        wid = np.concatenate(ids)
        tail = np.concatenate(tails, axis=0)
        order = np.argsort(wid)
        wid, tail = wid[order], tail[order]
        # strip the -1 left padding: offsets from per-row path lengths
        lens = (tail >= 0).sum(axis=1)
        flat = tail[tail >= 0]  # row-major → per-walk segments in order
        offsets = np.concatenate(([0], np.cumsum(lens))).astype(np.int32)
        path = pa.ListArray.from_arrays(pa.array(offsets),
                                        pa.array(flat, pa.int64()))
        starts = tail[np.arange(tail.shape[0]), tail.shape[1] - lens]
        return pa.table({"walk_id": wid, "start_node": starts, "path": path})

    # ---- SGNS training phases ----------------------------------------------

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
            return self._ret([np.empty(0, np.int64)
                              for _ in range(self.P)])
        rng = np.random.default_rng((self.seed, 13, self.q, self._ep, rnd))
        negs = self.neg_table[rng.integers(0, self.neg_table.shape[0],
                                           size=(nb, self.neg_k))]
        need = np.unique(np.concatenate([xx, negs.ravel()]))
        self._pending = (cc, xx, negs, need)
        cuts = np.searchsorted(need, self.bounds)
        return self._ret([need[cuts[p]:cuts[p + 1]]
                          for p in range(self.P)])

    def serve(self, *reqs):
        """Phase 2: gather my context rows for each requester
        (num_returns=P)."""
        return self._ret([self.context[np.asarray(r) - self.lo]
                          if np.asarray(r).shape[0] else
                          np.empty((0, self.context.shape[1]))
                          for r in reqs])

    def compute(self, *row_blocks):
        """Phase 3: SGNS gradients over the pending minibatch.  Applies the
        center update in place; returns per-owner (ids, grad_sum, count)
        context-gradient bundles (num_returns=P)."""
        if self._pending is None:
            return self._ret([None] * self.P)
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
        return self._ret([(cuniq[cuts[p]:cuts[p + 1]],
                           cacc[cuts[p]:cuts[p + 1]],
                           ccnt[cuts[p]:cuts[p + 1]])
                          if cuts[p + 1] > cuts[p] else None
                          for p in range(self.P)])

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
    loads = []
    max_pairs = 0
    for q in range(P):
        m = owner == q
        max_pairs = max(max_pairs, int(m.sum()))
        w = Actor.remote(q, bounds, d, neg_k, batch, seed)
        loads.append(w.load_pairs.remote(c[m], x[m], neg_ref))
        workers.append(w)
    ray.get(loads)
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


def walk_pairs_reference(graph, *, walks_per_node: int, walk_length: int,
                         window: int, return_factor: float = 1.0,
                         in_out_factor: float = 1.0, seed: int = 42):
    """Driver-side reference for the sharded walk phase: the SAME counter-
    based randomness over the whole CSR.  Returns (c, x, freq).  The sharded
    actors must reproduce these pairs exactly at any shard count
    (tests/test_node2vec.py); O(n + #pairs) driver memory — conformance
    oracle only, never the scale path."""
    sh = graph.shards(1, "natural")[0]
    indptr, indices = sh.indptr, sh.indices.astype(np.int64)
    deg = np.diff(indptr)
    n = graph.n
    K = np.repeat(np.arange(n, dtype=np.int64), deg) * n + indices
    starts = np.repeat(np.arange(n, dtype=np.int64), walks_per_node)
    nw = starts.shape[0]
    wid = np.arange(nw, dtype=np.int64)
    tailw = max(window, 2)
    tail = np.full((nw, tailw), -1, dtype=np.int64)
    tail[:, -1] = starts
    freq = np.full(n, walks_per_node, dtype=np.int64)
    alive = deg[starts] > 0
    first_order = (return_factor == 1.0 and in_out_factor == 1.0)
    p_inv, q_inv = 1.0 / return_factor, 1.0 / in_out_factor
    max_prob = max(p_inv, 1.0, q_inv)
    cs, xs = [], []
    for step in range(1, walk_length):
        act = np.nonzero(alive)[0]
        if act.shape[0] == 0:
            break
        w = wid[act]
        cur = tail[act, -1]
        dl = deg[cur]
        if first_order or step == 1:
            u = _u01(seed, w, step, 0)
            new = indices[indptr[cur] + (u * dl).astype(np.int64)]
        else:
            T = _T_TRIES
            u1 = _u01(seed, w[:, None], step,
                      3 * np.arange(T, dtype=np.int64)[None, :])
            props = indices[indptr[cur][:, None]
                            + (u1 * dl[:, None]).astype(np.int64)]
            prev = tail[act, -2]
            member = _member_sorted(
                K, (prev[:, None] * n + props).ravel()).reshape(props.shape)
            prob = np.where(member, 1.0, q_inv)
            prob[props == prev[:, None]] = p_inv
            u2 = _u01(seed, w[:, None], step,
                      3 * np.arange(T, dtype=np.int64)[None, :] + 1)
            ok = u2 * max_prob <= prob
            anyok = ok.any(axis=1)
            new = props[np.arange(act.shape[0]), np.argmax(ok, axis=1)]
            if (~anyok).any():
                idx = np.nonzero(~anyok)[0]
                uf = _u01(seed, w[idx], step, 3 * T)
                new[idx] = indices[indptr[cur[idx]]
                                   + (uf * dl[idx]).astype(np.int64)]
        for off in range(1, window + 1):
            partner = tail[act, tailw - off]
            m = partner >= 0
            if m.any():
                cs.extend((partner[m], new[m]))
                xs.extend((new[m], partner[m]))
        tail[act, :-1] = tail[act, 1:]
        tail[act, -1] = new
        np.add.at(freq, new, 1)
        alive[act] = deg[new] > 0
    c = np.concatenate(cs) if cs else np.empty(0, dtype=np.int64)
    x = np.concatenate(xs) if xs else np.empty(0, dtype=np.int64)
    return c, x, freq


def _run_walk_phase(workers, handles, P, walks_per_node, walk_length,
                    window, return_factor, in_out_factor, record=False):
    """Drive the per-step walker/pair exchange across the shard actors."""
    import ray

    active = sum(ray.get([
        w.init_walks.remote(handles[q], walks_per_node, window,
                            return_factor, in_out_factor,
                            record, walk_length)
        for q, w in enumerate(workers)]))
    biased = not (return_factor == 1.0 and in_out_factor == 1.0)
    for step in range(1, walk_length):
        if active == 0:
            break
        if biased and step >= 2:
            qs = [w.walk_queries.options(num_returns=P).remote(step)
                  for w in workers]
            if P == 1:
                qs = [[r] for r in qs]
            ans = [workers[p].walk_answers.options(num_returns=P).remote(
                *[qs[q][p] for q in range(P)]) for p in range(P)]
            if P == 1:
                ans = [[a] for a in ans]
        else:
            ans = [[None] * P for _ in range(P)]
        adv = [workers[q].walk_advance.options(num_returns=P).remote(
            step, *[ans[p][q] for p in range(P)]) for q in range(P)]
        if P == 1:
            adv = [[a] for a in adv]
        active = sum(ray.get([
            workers[p].walk_absorb.remote(*[adv[q][p] for q in range(P)])
            for p in range(P)]))


def sharded_walk_pairs(graph, *, walks_per_node: int, walk_length: int,
                       window: int, return_factor: float = 1.0,
                       in_out_factor: float = 1.0, seed: int = 42,
                       num_partitions: int = 4):
    """TESTING ONLY: run just the sharded walk phase and gather
    (c, x, freq) on the driver for equality checks against
    walk_pairs_reference."""
    import ray

    from .pregel import _shard_handles

    n = graph.n
    P = max(1, min(num_partitions, n))
    bounds = graph.bounds(P, "natural")
    handles = _shard_handles(graph, P, "natural")
    P = len(bounds) - 1
    Actor = ray.remote(_N2VShard)
    workers = [Actor.remote(q, bounds, 2, 1, 4096, seed) for q in range(P)]
    try:
        _run_walk_phase(workers, handles, P, walks_per_node, walk_length,
                        window, return_factor, in_out_factor)
        counts_freq = ray.get([w.finish_walks.remote() for w in workers])
        pairs = ray.get([w.dump_pairs.remote() for w in workers])
    finally:
        for w in workers:
            ray.kill(w)
    freq = np.zeros(n, dtype=np.int64)
    for q, (_, fr) in enumerate(counts_freq):
        freq[int(bounds[q]):int(bounds[q + 1])] = fr
    c = np.concatenate([p[0] for p in pairs]) if pairs else np.empty(0)
    x = np.concatenate([p[1] for p in pairs]) if pairs else np.empty(0)
    return c.astype(np.int64), x.astype(np.int64), freq


def random_walks_distributed(graph, *, walks_per_node: int = 10,
                             walk_length: int = 80,
                             return_factor: float = 1.0,
                             in_out_factor: float = 1.0, seed: int = 42,
                             num_partitions: int = 4):
    """Distributed node2vec-biased random walks: walkers advance inside the
    vid-range CSR shard actors (same machinery as the Node2Vec walk phase,
    record mode) and the walk corpus is returned as a ray.data.Dataset built
    from the per-shard tables — it never transits the driver.  Counter-based
    randomness makes the corpus identical at any shard count (NOT equal to
    the rng-based local ``random_walks`` corpus for the same seed — same
    distribution, different stream).  Schema: (walk_id, start_node,
    path: list<int64>); walks stop early at sinks like the reference
    (RandomWalk.java)."""
    import ray
    import ray.data

    from .pregel import _shard_handles

    n = graph.n
    P = max(1, min(num_partitions, n))
    bounds = graph.bounds(P, "natural")
    handles = _shard_handles(graph, P, "natural")
    P = len(bounds) - 1
    Actor = ray.remote(_N2VShard)
    workers = [Actor.remote(q, bounds, 2, 1, 4096, seed) for q in range(P)]
    try:
        _run_walk_phase(workers, handles, P, walks_per_node, walk_length,
                        0, return_factor, in_out_factor, record=True)
        shard_tabs = [w.finish_walk_paths.remote() for w in workers]
        # tables must exist in plasma before the producer actors die
        ray.wait(shard_tabs, num_returns=len(shard_tabs))
        return ray.data.from_arrow_refs(shard_tabs)
    finally:
        for w in workers:
            ray.kill(w)


def node2vec_full_sharded(graph, *, d: int, walks_per_node: int,
                          walk_length: int, window: int, neg_k: int,
                          epochs: int, initial_learning_rate: float,
                          min_learning_rate: float,
                          return_factor: float = 1.0,
                          in_out_factor: float = 1.0, seed: int = 42,
                          num_partitions: int = 4, batch: int = 4096,
                          sync_every: int = 8, as_dataset: bool = False):
    """Walks + pair generation + SGNS training, ALL inside the vid-range
    shard actors: the driver holds only the O(n) visit-frequency vector (for
    the unigram^0.75 negative table) and per-shard counts — never a walk,
    pair, or embedding array (round-4 VERDICT next #3)."""
    import ray

    from .pregel import _shard_handles

    n = graph.n
    P = max(1, min(num_partitions, n))
    bounds = graph.bounds(P, "natural")
    handles = _shard_handles(graph, P, "natural")
    P = len(bounds) - 1
    Actor = ray.remote(_N2VShard)
    workers = [Actor.remote(q, bounds, d, neg_k, batch, seed)
               for q in range(P)]
    try:
        _run_walk_phase(workers, handles, P, walks_per_node, walk_length,
                        window, return_factor, in_out_factor)
        counts_freq = ray.get([w.finish_walks.remote() for w in workers])
        freq = np.zeros(n, dtype=np.int64)
        max_pairs = 0
        total_pairs = 0
        for q, (cnt, fr) in enumerate(counts_freq):
            freq[int(bounds[q]):int(bounds[q + 1])] = fr
            max_pairs = max(max_pairs, cnt)
            total_pairs += cnt
        if total_pairs == 0:
            tab = pa.table({"vid": np.arange(n, dtype=np.int64),
                            "embedding": pa.array([[0.0] * d] * n,
                                                  pa.list_(pa.float64()))})
            if as_dataset:
                import ray.data
                return ray.data.from_arrow(tab)
            return tab
        p_neg = freq.astype(np.float64) ** 0.75
        p_neg /= p_neg.sum()
        table_size = min(1 << 20, max(1 << 12, 16 * n))
        neg_table = np.random.default_rng(seed).choice(
            n, size=table_size, p=p_neg).astype(np.int64)
        neg_ref = ray.put(neg_table)
        ray.get([w.set_neg_table.remote(neg_ref) for w in workers])
        rounds = max(1, -(-max_pairs // batch))
        return _drive_rounds(workers, P, epochs, rounds, sync_every,
                             initial_learning_rate, min_learning_rate,
                             as_dataset)
    finally:
        for w in workers:  # also on exception: don't leak embedding shards
            ray.kill(w)
