"""The full-frontier scatter fast path and the positive_messages has-derivation
(pregel.py _expand_edges / scatter_global) must be bit-identical to the general
path.  The fast path triggers when the local vids are the dense sorted range
and every positive-degree vertex sends — PageRank's heavy supersteps."""

import numpy as np

from graph_data_science_ray.pipelines.pregel import (_expand_edges,
                                                     merge_payloads,
                                                     scatter_global)
from graph_data_science_ray.state.graph import build_csr_shard


class _Comp:
    keyed = False
    weighted = False
    edge_combine = "mul"
    scatter_remote_only = False
    reducer = "sum"
    positive_messages = False


def _shard(n=64, deg=4, seed=3, lo=0, hi=None, weighted=False):
    rng = np.random.default_rng(seed)
    hi = n if hi is None else hi
    m = (hi - lo) * deg
    src = np.sort(rng.integers(lo, hi, m))
    dst = rng.integers(0, n, m)
    # give a couple of vertices degree 0 (the fast path must tolerate them)
    keep = (src % 17 != 0)
    src, dst = src[keep], dst[keep]
    w = rng.random(src.shape[0]) if weighted else None
    return build_csr_shard(lo, hi, src, dst, w, n_total=n)


def _general_path(comp, shard, local, send, skey, sending):
    """Force the general path by withholding one zero-degree vertex's sending
    bit pattern from triggering the fast-path precondition: pass a local array
    that is dense but call neighbors_flat explicitly via a permuted copy."""
    # permuted local breaks the sorted-dense precondition but describes the
    # same scatter (mask permuted identically)
    perm = np.random.default_rng(0).permutation(local.shape[0])
    return _expand_edges(comp, shard, local[perm], send[perm],
                         skey[perm] if skey is not None else skey,
                         sending[perm])


def _sorted_triplet(dst, keys, vals):
    order = np.lexsort((vals, dst))
    return dst[order], vals[order]


def test_full_frontier_expand_matches_general():
    comp = _Comp()
    shard = _shard()
    nloc = shard.num_nodes
    local = np.arange(nloc, dtype=np.int64)
    send = np.random.default_rng(1).random(nloc)
    deg = np.diff(shard.indptr)
    sending = (deg > 0).astype(np.uint8)  # full frontier
    d1, k1, v1 = _expand_edges(comp, shard, local, send, None, sending)
    d2, k2, v2 = _general_path(comp, shard, local, send, None, sending)
    assert d1.shape == d2.shape
    a1, b1 = _sorted_triplet(np.asarray(d1, dtype=np.int64), None, v1)
    a2, b2 = _sorted_triplet(np.asarray(d2, dtype=np.int64), None, v2)
    assert np.array_equal(a1, a2)
    assert np.array_equal(b1, b2)


def test_full_frontier_expand_weighted_matches():
    comp = _Comp()
    comp.weighted = True
    shard = _shard(weighted=True)
    nloc = shard.num_nodes
    local = np.arange(nloc, dtype=np.int64)
    send = np.random.default_rng(2).random(nloc)
    deg = np.diff(shard.indptr)
    sending = (deg > 0).astype(np.uint8)
    d1, _, v1 = _expand_edges(comp, shard, local, send, None, sending)
    d2, _, v2 = _general_path(comp, shard, local, send, None, sending)
    a1, b1 = _sorted_triplet(np.asarray(d1, dtype=np.int64), None, v1)
    a2, b2 = _sorted_triplet(np.asarray(d2, dtype=np.int64), None, v2)
    assert np.array_equal(a1, a2)
    assert np.allclose(b1, b2, rtol=0, atol=0)


def test_partial_frontier_not_fast_pathed_but_equal():
    """A non-sender WITH positive degree must take the general path — and the
    result must equal a manual expansion."""
    comp = _Comp()
    shard = _shard()
    nloc = shard.num_nodes
    local = np.arange(nloc, dtype=np.int64)
    send = np.ones(nloc)
    sending = np.ones(nloc, dtype=np.uint8)
    deg = np.diff(shard.indptr)
    active = np.nonzero(deg > 0)[0]
    sending[active[0]] = 0  # positive-degree non-sender
    d, _, v = _expand_edges(comp, shard, local, send, None, sending)
    assert d.shape[0] == int(deg[sending != 0].sum())


def test_positive_messages_dense_payload_drops_has():
    comp = _Comp()
    comp.positive_messages = True
    shard = _shard(n=32, deg=8)
    nloc = shard.num_nodes
    local = np.arange(nloc, dtype=np.int64)
    send = np.random.default_rng(3).random(nloc) + 0.01
    deg = np.diff(shard.indptr)
    sending = (deg > 0).astype(np.uint8)
    pl = scatter_global(comp, shard, 32, local, send, None, sending)
    assert pl[0] == "F" and pl[2] is None
    msg = merge_payloads(comp, 0, 32, [pl])
    # reference: the non-positive path computes has via the cnt bincount
    comp2 = _Comp()
    pl2 = scatter_global(comp2, shard, 32, local, send, None, sending)
    assert pl2[2] is not None
    msg2 = merge_payloads(comp2, 0, 32, [pl2])
    assert np.array_equal(msg.has, msg2.has)
    assert np.array_equal(msg.vals, msg2.vals)


def test_positive_messages_sliced_and_grouped_payloads():
    from graph_data_science_ray.pipelines.pregel import (slice_payload,
                                                         slice_payload_grouped)
    comp = _Comp()
    comp.positive_messages = True
    shard = _shard(n=40, deg=6)
    nloc = shard.num_nodes
    local = np.arange(nloc, dtype=np.int64)
    send = np.random.default_rng(4).random(nloc) + 0.01
    deg = np.diff(shard.indptr)
    sending = (deg > 0).astype(np.uint8)
    pl = scatter_global(comp, shard, 40, local, send, None, sending)
    bounds = np.array([0, 10, 25, 40])
    full = merge_payloads(comp, 0, 40, [pl])
    sliced = slice_payload(comp, pl, bounds)
    grouped = slice_payload_grouped(comp, pl, np.array([0, 25, 40]))
    for q in range(3):
        lo, hi = int(bounds[q]), int(bounds[q + 1])
        msg = merge_payloads(comp, lo, hi, [sliced[q]])
        assert np.array_equal(msg.vals, full.vals[lo:hi])
        assert np.array_equal(msg.has, full.has[lo:hi])
    for gix, (lo, hi) in enumerate([(0, 25), (25, 40)]):
        msg = merge_payloads(comp, lo, hi, [grouped[gix]])
        assert np.array_equal(msg.vals, full.vals[lo:hi])
        assert np.array_equal(msg.has, full.has[lo:hi])
