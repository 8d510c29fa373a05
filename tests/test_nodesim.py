"""NodeSimilarity conformance vs the reference fixture
(NodeSimilarityTest.java:81-235): persons a-d LIKE items i1-i4."""

import numpy as np
import pytest

from graph_data_science_ray import Graph
from graph_data_science_ray.functions.nodesim import node_similarity

NODES = ["a", "b", "c", "d", "i1", "i2", "i3", "i4"]
EDGES = [("a", "i1", 1.0), ("a", "i2", 1.0), ("a", "i3", 2.0),
         ("b", "i1", 1.0), ("b", "i2", 1.0),
         ("c", "i3", 1.0),
         ("d", "i1", 0.5), ("d", "i2", 1.0), ("d", "i3", 1.0)]


@pytest.fixture
def likes_graph():
    return Graph.from_edge_list(EDGES, nodes=NODES)


def _rows(t):
    return {(int(a), int(b), round(float(s), 6))
            for a, b, s in zip(t.column("node1").to_pylist(),
                               t.column("node2").to_pylist(),
                               t.column("similarity").to_pylist())}


def test_outgoing_topk10_cutoff0(likes_graph):
    t = node_similarity(likes_graph, top_k=10, similarity_cutoff=0.0)
    exp = {(0, 1, round(2 / 3, 6)), (0, 2, round(1 / 3, 6)), (0, 3, 1.0),
           (1, 2, 0.0), (1, 3, round(2 / 3, 6)), (2, 3, round(1 / 3, 6)),
           (1, 0, round(2 / 3, 6)), (2, 0, round(1 / 3, 6)), (3, 0, 1.0),
           (2, 1, 0.0), (3, 1, round(2 / 3, 6)), (3, 2, round(1 / 3, 6))}
    assert _rows(t) == exp


def test_topk1_tie_breaks(likes_graph):
    t = node_similarity(likes_graph, top_k=1, similarity_cutoff=0.0)
    exp = {(0, 3, 1.0), (1, 0, round(2 / 3, 6)), (2, 0, round(1 / 3, 6)),
           (3, 0, 1.0)}
    assert _rows(t) == exp


def test_topn1(likes_graph):
    t = node_similarity(likes_graph, top_k=10, top_n=1, similarity_cutoff=0.0)
    assert _rows(t) == {(0, 3, 1.0)}


def test_similarity_cutoff(likes_graph):
    t = node_similarity(likes_graph, top_k=10, similarity_cutoff=0.1)
    assert (1, 2, 0.0) not in _rows(t) and (2, 1, 0.0) not in _rows(t)
    assert (0, 3, 1.0) in _rows(t)


def test_degree_cutoff(likes_graph):
    t = node_similarity(likes_graph, top_k=10, similarity_cutoff=0.0,
                        degree_cutoff=2)
    exp = {(0, 1, round(2 / 3, 6)), (0, 3, 1.0), (1, 3, round(2 / 3, 6)),
           (1, 0, round(2 / 3, 6)), (3, 0, 1.0), (3, 1, round(2 / 3, 6))}
    assert _rows(t) == exp


def test_weighted(likes_graph):
    t = node_similarity(likes_graph, top_k=10, similarity_cutoff=0.0,
                        weighted=True)
    exp = {(0, 1, 0.5), (0, 2, 0.25), (0, 3, 0.625), (1, 2, 0.0),
           (1, 3, 0.5), (2, 3, 0.4),
           (1, 0, 0.5), (2, 0, 0.25), (3, 0, 0.625), (2, 1, 0.0),
           (3, 1, 0.5), (3, 2, 0.4)}
    assert _rows(t) == exp


def test_all_pairs_mode(likes_graph):
    """top_k=0: each qualifying pair once, node1 < node2 (computeAll)."""
    t = node_similarity(likes_graph, top_k=0, similarity_cutoff=0.0)
    exp = {(0, 1, round(2 / 3, 6)), (0, 2, round(1 / 3, 6)), (0, 3, 1.0),
           (1, 2, 0.0), (1, 3, round(2 / 3, 6)), (2, 3, round(1 / 3, 6))}
    assert _rows(t) == exp


def test_matches_bruteforce_random():
    rng = np.random.default_rng(8)
    n_people, n_items, m = 20, 15, 120
    src = rng.integers(0, n_people, m)
    dst = n_people + rng.integers(0, n_items, m)
    g = Graph.from_edges(src, dst, n=n_people + n_items, aggregation="single")
    t = node_similarity(g, top_k=0, similarity_cutoff=1e-42)
    got = _rows(t)
    # brute force
    sets = [set(g.dst[g.src == i].tolist()) for i in range(n_people + n_items)]
    exp = set()
    for a in range(n_people + n_items):
        if not sets[a]:
            continue
        for b in range(a + 1, n_people + n_items):
            if not sets[b]:
                continue
            i = len(sets[a] & sets[b])
            u = len(sets[a]) + len(sets[b]) - i
            s = i / u if u else 0.0
            if s >= 1e-42:
                exp.add((a, b, round(s, 6)))
    assert got == exp


def test_distributed_topk_matches_driver_kernel():
    """cutoff>0 + top_k>0 takes the bucketed distributed top-k; it must equal
    the driver-side kernel path (cutoff=0 then re-filter) exactly."""
    rng = np.random.default_rng(11)
    n_people, n_items, m = 40, 30, 400
    src = rng.integers(0, n_people, m)
    dst = n_people + rng.integers(0, n_items, m)
    g = Graph.from_edges(src, dst, n=n_people + n_items, aggregation="single")
    dist = node_similarity(g, top_k=3, similarity_cutoff=1e-42)
    # driver path: cutoff=0 runs the old in-driver top-k; drop the zero rows it
    # additionally owes and any consequent top-k slot differences are real bugs
    drv = node_similarity(g, top_k=3, similarity_cutoff=0.0)
    drv_rows = {r for r in _rows(drv) if r[2] > 0}
    # the zero-cutoff run may fill trailing top-k slots with zero-sim pairs;
    # restricting both sides to positive similarities makes the sets comparable
    assert {r for r in _rows(dist) if r[2] > 0} == drv_rows


def test_max_neighbor_degree_drops_hub_pairs():
    """A hub item liked by everyone is excluded; pairs that only co-occur via
    the hub disappear, pairs sharing non-hub items survive."""
    nodes = ["a", "b", "c", "hub", "i1"]
    edges = [("a", "hub", 1.0), ("b", "hub", 1.0), ("c", "hub", 1.0),
             ("a", "i1", 1.0), ("b", "i1", 1.0)]
    g = Graph.from_edge_list(edges, nodes=nodes)
    full = node_similarity(g, top_k=10)
    capped = node_similarity(g, top_k=10, max_neighbor_degree=2)
    full_pairs = {(a, b) for a, b, _ in _rows(full)}
    capped_pairs = {(a, b) for a, b, _ in _rows(capped)}
    assert (0, 2) in full_pairs and (2, 0) in full_pairs      # a-c via hub only
    assert (0, 2) not in capped_pairs and (2, 0) not in capped_pairs
    assert (0, 1) in capped_pairs and (1, 0) in capped_pairs  # a-b via i1


def test_overlap_matches_bruteforce():
    rng = np.random.default_rng(9)
    n_people, n_items, m = 20, 15, 120
    src = rng.integers(0, n_people, m)
    dst = n_people + rng.integers(0, n_items, m)
    g = Graph.from_edges(src, dst, n=n_people + n_items, aggregation="single")
    t = node_similarity(g, top_k=0, similarity_cutoff=1e-42, metric="overlap")
    got = _rows(t)
    sets = [set(g.dst[g.src == i].tolist()) for i in range(n_people + n_items)]
    exp = set()
    for a in range(n_people + n_items):
        if not sets[a]:
            continue
        for b in range(a + 1, n_people + n_items):
            if not sets[b]:
                continue
            i = len(sets[a] & sets[b])
            d = min(len(sets[a]), len(sets[b]))
            s = i / d if d else 0.0
            if s >= 1e-42:
                exp.add((a, b, round(s, 6)))
    assert got == exp


def test_overlap_weighted(likes_graph):
    # weighted overlap = Σmin over intersection / min(ΣA, ΣB)
    t = node_similarity(likes_graph, top_k=0, similarity_cutoff=1e-42,
                        weighted=True, metric="overlap")
    got = _rows(t)
    # a:{i1:1,i2:1,i3:2} b:{i1:1,i2:1} → Σmin=2, min(4,2)=2 → 1.0
    assert (0, 1, 1.0) in got


def test_unknown_metric_rejected(likes_graph):
    with pytest.raises(ValueError):
        node_similarity(likes_graph, metric="dice")
