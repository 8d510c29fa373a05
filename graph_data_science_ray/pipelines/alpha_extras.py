"""Alpha-tier tail operators: approximate max-k-cut, influence maximization
(greedy / CELF with Independent Cascade), and CollapsePath.

References:
  * alpha/alpha-algo/.../impl/approxmaxkcut/ApproxMaxKCut.java:140-194 —
    GRASP-style: per iteration a seeded random placement + local search
    (ComputeNodeToCommunityWeights → swap each node to the community that
    minimizes its internal weight, i.e. maximizes the cut), keep the best
    cut over iterations.  This re-expression runs the local search as
    synchronous vectorized rounds (Jacobi sweeps) instead of atomic
    in-place swaps — same objective, deterministic at any parallelism.
  * alpha/.../impl/influenceMaximization/{Greedy,CELF,IndependentCascade}.java
    — expected spread under the Independent Cascade model estimated by
    Monte-Carlo; Greedy re-evaluates every candidate per round, CELF
    (Leskovec et al., lazy-forward) re-evaluates only while the cached
    marginal gain of the heap top is stale.  Spread counts activation
    EVENTS like the reference (IndependentCascade.java:72-82 increments on
    every successful coin flip).  Candidate evaluations fan out over Ray
    tasks with the CSR broadcast once — the same shape as the reference's
    IndependentCascadeRunner pool.
  * alpha/.../impl/walking/CollapsePath.java — compose a sequence of
    relationship types into direct (start, end) edges (distinct pairs,
    self-loops optional), e.g. [TOOK, reverse TOOK] ⇒ SAME_DRUG.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import pyarrow as pa

from ..state.graph import Graph

# ---------------------------------------------------------------------------
# Approximate max-k-cut
# ---------------------------------------------------------------------------


def approx_max_k_cut(graph: Graph, *, k: int = 2, iterations: int = 8,
                     local_search_rounds: int = 30, seed: int = 42,
                     weighted: Optional[bool] = None) -> dict:
    """Returns {"table": (vid, community), "cut_cost": float}.  cut_cost =
    total weight of edges whose endpoints differ (each stored edge counted
    once, like the reference's ComputeCost over the stored topology)."""
    if k < 2:
        raise ValueError("k must be >= 2")
    n = graph.n
    src, dst = graph.src, graph.dst
    if weighted is None:
        weighted = graph.is_weighted
    w = (graph.weight if (weighted and graph.weight is not None)
         else np.ones(src.shape[0]))
    rng = np.random.default_rng(seed)
    best_comm = None
    best_cost = -1.0
    for _ in range(max(1, iterations)):
        comm = rng.integers(0, k, n).astype(np.int64)
        for _r in range(local_search_rounds):
            # W[v, c] = Σ w(v,u) for stored edges touching v with other side
            # in community c (both directions: the cut is orientation-free)
            wvc = np.zeros((n, k))
            np.add.at(wvc, (src, comm[dst]), w)
            np.add.at(wvc, (dst, comm[src]), w)
            new = np.argmin(wvc, axis=1).astype(np.int64)
            cur_w = wvc[np.arange(n), comm]
            new_w = wvc[np.arange(n), new]
            move = new_w < cur_w
            if not move.any():
                break
            # randomized half-moves: simultaneous Jacobi swaps of adjacent
            # improving nodes can cancel (both sides jump) — moving each
            # improving node with prob 1/2 breaks the symmetry, the same
            # reason GDS guards swaps with per-node atomics
            # (SwapForLocalImprovements.java NodeSwapStatus)
            move &= rng.random(n) < 0.5
            if not move.any():
                continue
            comm = np.where(move, new, comm)
            cost = float(w[comm[src] != comm[dst]].sum())
            if cost > best_cost:
                best_cost, best_comm = cost, comm.copy()
        cost = float(w[comm[src] != comm[dst]].sum())
        if cost > best_cost:
            best_cost, best_comm = cost, comm.copy()
    return {"table": pa.table({"vid": np.arange(n, dtype=np.int64),
                               "community": best_comm}),
            "cut_cost": best_cost}


# ---------------------------------------------------------------------------
# Influence maximization (Independent Cascade + Greedy / CELF)
# ---------------------------------------------------------------------------


def _ic_spread(indptr, indices, seeds_arr, candidate, p, sims, rng):
    """Mean activation-event count over ``sims`` Monte-Carlo Independent
    Cascade runs from {seeds + candidate} (reference counting semantics:
    +1 per initially-active node, +1 per successful edge trial)."""
    n = indptr.shape[0] - 1
    total = 0.0
    init = np.concatenate([seeds_arr, [candidate]]).astype(np.int64)
    for _ in range(sims):
        active = np.zeros(n, dtype=bool)
        active[init] = True
        frontier = np.unique(init)
        total += frontier.shape[0]
        while frontier.shape[0]:
            starts = indptr[frontier]
            lens = indptr[frontier + 1] - starts
            tot = int(lens.sum())
            if tot == 0:
                break
            offs = np.concatenate(([0], np.cumsum(lens)[:-1]))
            gather = (np.arange(tot, dtype=np.int64)
                      + np.repeat(starts - offs, lens))
            tgt = indices[gather].astype(np.int64)
            hit = rng.random(tot) < p
            total += float(hit.sum())  # every successful trial counts
            newly = np.unique(tgt[hit & ~active[tgt]])
            active[newly] = True
            frontier = newly
    return total / sims


def influence_maximization(graph: Graph, *, seed_set_size: int,
                           propagation_probability: float = 0.1,
                           monte_carlo_simulations: int = 10,
                           seed: int = 42, method: str = "celf",
                           execution: str = "local") -> pa.Table:
    """Returns (node, spread) rows in selection order; ``spread`` is the
    cumulative expected spread after adding the node (the reference's
    InfluenceMaximizationResult).  method: "greedy" | "celf"."""
    n = graph.n
    kset = min(seed_set_size, n)
    sh = graph.shards(1, "natural")[0]
    indptr, indices = sh.indptr, sh.indices.astype(np.int64)
    p = propagation_probability
    sims = monte_carlo_simulations

    def eval_batch(cands, seeds_arr, round_no):
        if execution == "ray" and len(cands) > 4:
            import ray
            csr_ref = ray.put((indptr, indices))

            @ray.remote
            def _eval(chunk, sarr, rno):
                ip, ix = ray.get(csr_ref)
                out = {}
                for c in chunk:
                    r = np.random.default_rng(
                        (seed * 1_000_003 + rno) * np.int64(2654435761) + c)
                    out[int(c)] = _ic_spread(ip, ix, sarr, c, p, sims, r)
                return out

            chunks = np.array_split(np.asarray(cands), 8)
            res = {}
            for d in ray.get([_eval.remote(ch, seeds_arr, round_no)
                              for ch in chunks if ch.shape[0]]):
                res.update(d)
            return res
        out = {}
        for c in cands:
            r = np.random.default_rng(
                (seed * 1_000_003 + round_no) * np.int64(2654435761) + c)
            out[int(c)] = _ic_spread(indptr, indices, seeds_arr, c, p, sims, r)
        return out

    chosen: list = []
    spreads: list = []
    seeds_arr = np.empty(0, dtype=np.int64)
    remaining = np.arange(n, dtype=np.int64)
    gain_total = 0.0

    if method == "greedy":
        for rnd in range(kset):
            scores = eval_batch(remaining, seeds_arr, rnd)
            best = max(scores, key=lambda c: (scores[c], -c))
            chosen.append(best)
            spreads.append(scores[best])
            seeds_arr = np.asarray(chosen, dtype=np.int64)
            remaining = remaining[remaining != best]
        return pa.table({"node": np.asarray(chosen, dtype=np.int64),
                         "spread": np.asarray(spreads)})

    # CELF: round 0 evaluates everyone; afterwards lazy-forward on a heap of
    # cached marginal gains (CELF.java lazyForwardPart)
    import heapq
    scores = eval_batch(remaining, seeds_arr, 0)
    heap = [(-s, c, 0) for c, s in scores.items()]  # (neg gain, node, stamp)
    heapq.heapify(heap)
    neg, best, _ = heapq.heappop(heap)
    chosen.append(best)
    gain_total = -neg
    spreads.append(gain_total)
    seeds_arr = np.asarray(chosen, dtype=np.int64)
    for rnd in range(1, kset):
        while True:
            neg, c, stamp = heapq.heappop(heap)
            if stamp == rnd:  # fresh for this round: take it
                break
            s = eval_batch([c], seeds_arr, rnd)[c]
            heapq.heappush(heap, (-(s - gain_total), c, rnd))
        chosen.append(c)
        gain_total += -neg
        spreads.append(gain_total)
        seeds_arr = np.asarray(chosen, dtype=np.int64)
    return pa.table({"node": np.asarray(chosen, dtype=np.int64),
                     "spread": np.asarray(spreads)})


# ---------------------------------------------------------------------------
# CollapsePath
# ---------------------------------------------------------------------------


def collapse_path(store, path_templates: Sequence[Sequence], *,
                  allow_self_loops: bool = False,
                  mutate_relationship_type: Optional[str] = None):
    """Compose relationship-type chains into direct (src, dst) edges.

    ``path_templates``: each template is a sequence of (rel_type,
    orientation) pairs or bare type names (natural orientation).  The result
    is the DISTINCT union of endpoints over all templates
    (CollapsePath.java semantics; self-loops dropped unless allowed).
    ``mutate_relationship_type`` adds the result to the store (mutate mode).
    """
    n = store.n
    out_s, out_d = [], []
    for template in path_templates:
        cur_s = None
        cur_d = None
        for stepi, step in enumerate(template):
            if isinstance(step, str):
                rel, orient = step, "natural"
            else:
                rel, orient = step
            s, d, _ = store._rels[rel]
            if orient == "reverse":
                s, d = d, s
            elif orient == "undirected":
                s, d = np.concatenate([s, d]), np.concatenate([d, s])
            if stepi == 0:
                cur_s, cur_d = s.copy(), d.copy()
                continue
            # join current (start, mid) with step edges (mid -> next)
            order = np.argsort(s, kind="stable")
            s_sorted, d_sorted = s[order], d[order]
            lo = np.searchsorted(s_sorted, cur_d, side="left")
            hi = np.searchsorted(s_sorted, cur_d, side="right")
            cnt = hi - lo
            tot = int(cnt.sum())
            if tot == 0:
                cur_s = cur_d = np.empty(0, dtype=np.int64)
                break
            offs = np.concatenate(([0], np.cumsum(cnt)[:-1]))
            gather = (np.arange(tot, dtype=np.int64)
                      + np.repeat(lo - offs, cnt))
            cur_s = np.repeat(cur_s, cnt)
            cur_d = d_sorted[gather]
        if cur_s is not None and cur_s.shape[0]:
            out_s.append(cur_s)
            out_d.append(cur_d)
    if out_s:
        s = np.concatenate(out_s)
        d = np.concatenate(out_d)
        if not allow_self_loops:
            keep = s != d
            s, d = s[keep], d[keep]
        # distinct pairs
        order = np.lexsort((d, s))
        s, d = s[order], d[order]
        if s.shape[0]:
            run = np.concatenate(([True], (s[1:] != s[:-1]) | (d[1:] != d[:-1])))
            s, d = s[run], d[run]
    else:
        s = d = np.empty(0, dtype=np.int64)
    if mutate_relationship_type is not None:
        store.add_relationship_type(mutate_relationship_type, s, d)
    return pa.table({"src": s, "dst": d})
