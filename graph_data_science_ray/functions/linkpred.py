"""Link-prediction pairwise measures — the gds.alpha.linkprediction.* user
functions (ref alpha/alpha-proc/.../linkprediction/LinkPredictionFunc.java +
NeighborsFinder.java), vectorized over a PAIRS table instead of per-call.

Semantics (loop-free graphs, like the reference's set-based NeighborsFinder):

  * ``common_neighbors``       |N(a) ∩ N(b)|
  * ``adamic_adar``            Σ_{z ∈ N(a)∩N(b)} 1 / ln(degree(z))
  * ``resource_allocation``    Σ_{z ∈ N(a)∩N(b)} 1 / degree(z)
  * ``preferential_attachment``degree(a) · degree(b)
  * ``total_neighbors``        |N(a) ∪ N(b)|
  * ``same_community``         1.0 iff both nodes carry equal community values
                               (0.0 when either is missing — reference
                               hasProperty check)

``direction`` picks the neighbourhood: "outgoing" (a→z), "incoming" (z→a) or
"both"; degree = |distinct neighbours| in that direction (the NeighborsFinder
set size — == Neo4j getDegree on canonical single-edge graphs; on multigraphs
the reference's getDegree counts relationships instead, documented
deviation).  IEEE edge cases follow Java: a common neighbour with degree 1
contributes 1/ln(1) = +inf to adamic_adar.

Execution shape: the pairs table streams through ``map_batches``; each actor
reads the direction's CSR + sorted edge-key index ONCE from the object store
(``ray.put`` handle in ``__init__``) and scores a whole batch with no
per-pair Python loop — every pair's adj(a) is expanded in one repeat/gather
and membership of (b, z) is one global searchsorted (the reference evaluates
one DB call per pair).  Scale contract: the graph's CSR must fit a worker
(the function-call form of the reference assumes a local DB the same way);
for graphs beyond worker memory, route pairs by vid range and join adjacency
shard-side as triangles.py does.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pyarrow as pa

_METHODS = ("common_neighbors", "adamic_adar", "resource_allocation",
            "preferential_attachment", "total_neighbors", "same_community")

_ORIENT = {"outgoing": "natural", "out": "natural", ">": "natural",
           "incoming": "reverse", "in": "reverse", "<": "reverse",
           "both": "undirected", "b": "undirected", "<>": "undirected"}


def _distinct_csr(graph, orientation):
    """CSR of DISTINCT neighbors in the given orientation — NeighborsFinder
    returns sets, so reciprocal/parallel edges collapse regardless of how the
    graph was stored (an undirected-built graph already holds both directions;
    re-expanding it would double every degree)."""
    n = graph.n
    if orientation == "natural":
        s, d = graph.src, graph.dst
    elif orientation == "reverse":
        s, d = graph.dst, graph.src
    else:  # undirected union
        s = np.concatenate([graph.src, graph.dst])
        d = np.concatenate([graph.dst, graph.src])
    loop = s != d  # NeighborsFinder excludes self (endNode != node)
    key = np.unique(s[loop].astype(np.int64) * np.int64(n)
                    + d[loop].astype(np.int64))
    s = key // np.int64(n)
    d = key % np.int64(n)
    indptr = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(np.bincount(s, minlength=n), out=indptr[1:])
    return indptr, d


def _edge_keys(indptr, indices):
    """Sorted (src, dst) keys of the deduped CSR — the membership index the
    batched kernel probes; build once per call/actor, not per batch."""
    n = indptr.shape[0] - 1
    return (np.repeat(np.arange(n, dtype=np.int64), np.diff(indptr))
            * np.int64(n) + indices)


def _pair_scores_multi(indptr, indices, degrees, a_arr, b_arr, methods,
                       edge_keys=None):
    """Batched scoring of SEVERAL methods in one pass with NO per-pair
    Python loop: expand every pair's adj(a) once (repeat/gather),
    membership-test (b, z) against the GLOBAL sorted edge-key array with one
    searchsorted over all pairs' candidates, and reduce per pair per method
    with add.reduceat.  O(Σ deg(a)) work per batch, amortized across
    methods."""
    n_pairs = a_arr.shape[0]
    a = np.asarray(a_arr, dtype=np.int64)
    b = np.asarray(b_arr, dtype=np.int64)
    n = degrees.shape[0]
    out = {}
    if "preferential_attachment" in methods:
        out["preferential_attachment"] = \
            degrees[a].astype(np.float64) * degrees[b]
    needs_expand = [m for m in methods if m != "preferential_attachment"]
    if not needs_expand:
        return out
    # adj(a) expansion; a == b pairs contribute nothing (reference defines
    # the common-neighbour set of a node with itself empty,
    # NeighborsFinder.java:40-43)
    lens = np.where(a == b, 0, degrees[a])
    total = int(lens.sum())
    if total == 0:
        for m in needs_expand:
            if m == "total_neighbors":
                out[m] = np.where(a == b, degrees[a],
                                  degrees[a] + degrees[b]).astype(np.float64)
            else:
                out[m] = np.zeros(n_pairs)
        return out
    starts = indptr[a]
    offs = np.concatenate(([0], np.cumsum(lens)[:-1]))
    g = np.arange(total, dtype=np.int64) + np.repeat(starts - offs, lens)
    z = indices[g]
    b_rep = np.repeat(b, lens)
    # membership of (b_rep, z) in the sorted edge-key array == z ∈ adj(b)
    if edge_keys is None:
        edge_keys = _edge_keys(indptr, indices)
    probe = b_rep * np.int64(n) + z
    pos = np.searchsorted(edge_keys, probe)
    pos[pos >= edge_keys.shape[0]] = edge_keys.shape[0] - 1
    is_common = edge_keys[pos] == probe
    bounds = np.concatenate((offs, [total]))

    def _reduce(w):
        sums = np.add.reduceat(np.concatenate((w, [0.0])), bounds)[:-1]
        sums[lens == 0] = 0.0
        return sums

    common_f = is_common.astype(np.float64)
    cn_sums = None
    for m in needs_expand:
        if m in ("common_neighbors", "total_neighbors"):
            if cn_sums is None:
                cn_sums = _reduce(common_f)
            out[m] = (cn_sums if m == "common_neighbors" else
                      np.where(a == b, degrees[a].astype(np.float64),
                               degrees[a] + degrees[b] - cn_sums))
        elif m == "adamic_adar":
            with np.errstate(divide="ignore"):
                out[m] = _reduce(np.where(is_common,
                                          1.0 / np.log(degrees[z]), 0.0))
        elif m == "resource_allocation":
            with np.errstate(divide="ignore"):
                out[m] = _reduce(np.where(
                    is_common, 1.0 / degrees[z].astype(np.float64), 0.0))
    return out


def _pair_scores(indptr, indices, degrees, a_arr, b_arr, method,
                 edge_keys=None):
    return _pair_scores_multi(indptr, indices, degrees, a_arr, b_arr,
                              [method], edge_keys=edge_keys)[method]


def link_prediction(graph, pairs, method: str, *, direction: str = "both",
                    community: Optional[np.ndarray] = None,
                    batch_size: int = 8192):
    """Score (a, b) pairs; returns/streams (a, b, score) — or, when
    ``method`` is a LIST of structural methods, one column per method
    computed from a single adjacency expansion (the co-supply near-clique
    measured 5x on this: one expansion instead of one per measure).

    ``pairs``: a pyarrow Table with columns a, b (scored in one call) or a
    Ray Dataset with the same columns (scored as a streaming map_batches
    stage over a once-published CSR handle)."""
    single = isinstance(method, str)
    methods = [method] if single else list(method)
    if not single and methods == ["same_community"]:
        # nothing to combine in a singleton list — callers that pass methods
        # uniformly as lists must be able to score same_community too
        method, single = "same_community", True
    for m in methods:
        if m not in _METHODS:
            raise ValueError(f"method must be one of {_METHODS}, got {m!r}")
    if direction not in _ORIENT:
        raise ValueError(f"direction must be one of {sorted(_ORIENT)}")
    if "same_community" in methods and not single:
        raise ValueError("same_community is not combinable (needs the "
                         "community array, not the adjacency expansion)")
    if not hasattr(graph, "src"):
        raise ValueError("link_prediction needs an in-memory Graph (its "
                         "distinct-neighbor CSR is published once and must "
                         "fit a worker); load parquet-backed graphs first")

    if method == "same_community":
        if community is None:
            raise ValueError("same_community requires the community array")
        comm = np.asarray(community)

        def _score_comm(a, b):
            valid = (a < comm.shape[0]) & (b < comm.shape[0])
            eq = np.zeros(a.shape[0])
            eq[valid] = (comm[a[valid]] == comm[b[valid]]).astype(np.float64)
            return eq

        if isinstance(pairs, pa.Table):
            a = pairs.column("a").to_numpy(zero_copy_only=False)
            b = pairs.column("b").to_numpy(zero_copy_only=False)
            return pa.table({"a": a, "b": b, "score": _score_comm(a, b)})
        return pairs.map_batches(
            lambda t: pa.table({
                "a": t.column("a"), "b": t.column("b"),
                "score": _score_comm(
                    t.column("a").to_numpy(zero_copy_only=False),
                    t.column("b").to_numpy(zero_copy_only=False))}),
            batch_format="pyarrow")

    indptr, indices = _distinct_csr(graph, _ORIENT[direction])
    degrees = np.diff(indptr)

    def _out_table(a, b, scores: dict) -> pa.Table:
        cols = {"a": a, "b": b}
        if single:
            cols["score"] = scores[methods[0]]
        else:
            for m in methods:
                cols[m] = scores[m]
        return pa.table(cols)

    if isinstance(pairs, pa.Table):
        a = pairs.column("a").to_numpy(zero_copy_only=False)
        b = pairs.column("b").to_numpy(zero_copy_only=False)
        return _out_table(a, b, _pair_scores_multi(indptr, indices, degrees,
                                                   a, b, methods))

    import ray
    csr_ref = ray.put((indptr, indices, degrees,
                       _edge_keys(indptr, indices)))

    class _Scorer:
        def __init__(self):
            self.csr = None
            self.__name__ = f"linkpred_{'_'.join(methods)}"

        def __call__(self, t: pa.Table) -> pa.Table:
            if self.csr is None:
                self.csr = ray.get(csr_ref)
            ip, ix, dg, ek = self.csr
            a = t.column("a").to_numpy(zero_copy_only=False)
            b = t.column("b").to_numpy(zero_copy_only=False)
            return _out_table(a, b, _pair_scores_multi(ip, ix, dg, a, b,
                                                       methods,
                                                       edge_keys=ek))

    return pairs.map_batches(_Scorer(), batch_format="pyarrow",
                             batch_size=batch_size)
