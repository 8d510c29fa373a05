"""Louvain conformance vs the reference fixtures (LouvainTest.java:64-260) and
invariants.  The fixture graph stores BOTH directions (TYPE_OUT + TYPE_IN), which
orientation="undirected" reproduces."""

import numpy as np
import pytest

from graph_data_science_ray import Graph
from graph_data_science_ray.pipelines.louvain import (louvain, modularity_of,
                                                      modularity_optimization)

NODES = list("abcdefghijklmn") + ["x"]
EDGES = [("a", "b", 1.0), ("a", "d", 1.0), ("a", "f", 1.0), ("b", "d", 1.0),
         ("b", "x", 1.0), ("b", "g", 1.0), ("b", "e", 1.0), ("c", "x", 1.0),
         ("c", "f", 1.0), ("d", "k", 1.0), ("e", "x", 1.0), ("e", "f", 0.01),
         ("e", "h", 1.0), ("f", "g", 1.0), ("g", "h", 1.0), ("h", "i", 1.0),
         ("h", "j", 1.0), ("i", "k", 1.0), ("j", "k", 1.0), ("j", "m", 1.0),
         ("j", "n", 1.0), ("k", "m", 1.0), ("k", "l", 1.0), ("l", "n", 1.0),
         ("m", "n", 1.0)]
SEEDS = {"a": 1, "b": 1, "c": 1, "d": 1, "e": 1, "f": 1, "g": 2, "h": 2,
         "i": 2, "j": 42, "k": 42, "l": 42, "m": 42, "n": 42, "x": 1}


def _vid(names):
    order = sorted(NODES)
    return {order.index(n) for n in names}


@pytest.fixture
def louvain_graph():
    return Graph.from_edge_list(EDGES, nodes=sorted(NODES),
                                orientation="undirected",
                                node_props={"seed": SEEDS})


def _classes(comm):
    out = {}
    for v, c in enumerate(comm):
        out.setdefault(int(c), set()).add(v)
    return {frozenset(v) for v in out.values()}


def test_unweighted_fixture(louvain_graph):
    res = louvain(louvain_graph, weighted=False, include_intermediate=True)
    assert res.ran_levels == 2
    level0 = _classes(res.dendrograms[0])
    assert level0 == {frozenset(_vid("abd")), frozenset(_vid("cefx")),
                      frozenset(_vid("ghi")), frozenset(_vid("jklmn"))}
    level1 = _classes(res.dendrograms[1])
    assert level1 == {frozenset(_vid("abcdefx")), frozenset(_vid("ghi")),
                      frozenset(_vid("jklmn"))}
    assert res.modularity == pytest.approx(0.38, abs=0.01)


def test_weighted_fixture(louvain_graph):
    res = louvain(louvain_graph, weighted=True, include_intermediate=True)
    assert res.ran_levels == 2
    level0 = _classes(res.dendrograms[0])
    assert level0 == {frozenset(_vid("abd")), frozenset(_vid("cex")),
                      frozenset(_vid("fg")), frozenset(_vid("hi")),
                      frozenset(_vid("jklmn"))}
    level1 = _classes(res.dendrograms[1])
    assert level1 == {frozenset(_vid("abcdefgx")), frozenset(_vid("hijklmn"))}
    assert res.modularity == pytest.approx(0.37, abs=0.01)


def test_seeded_fixture(louvain_graph):
    res = louvain(louvain_graph, weighted=True, seed_property="seed")
    comm = res.table.column("community").to_numpy(zero_copy_only=False)
    got = {}
    for v, c in enumerate(comm):
        got.setdefault(int(c), set()).add(v)
    assert got == {1: _vid("abcdefx"), 2: _vid("ghi"), 42: _vid("jklmn")}


def test_modularity_of_matches_optimizer_reported(louvain_graph):
    """Final modularity reported by the optimizer equals the fixed-partition
    metric evaluated on its own output communities."""
    res = louvain(louvain_graph, weighted=False)
    comm = res.table.column("community").to_numpy(zero_copy_only=False)
    g = louvain_graph
    q = modularity_of(Graph(g.n, g.src, g.dst, None), comm)
    assert q == pytest.approx(res.modularity, abs=1e-9)


def test_singleton_partition_modularity_formula():
    """Hand-checkable: triangle graph, singleton communities."""
    g = Graph.from_edge_list([("a", "b"), ("b", "c"), ("a", "c")],
                             orientation="undirected")
    q = modularity_of(g, np.arange(3))
    # each k_i = 2, 2m = 6; ex = 0 → Q = -3*(2/6)^2 = -1/3
    assert q == pytest.approx(-1.0 / 3.0)
    q_all = modularity_of(g, np.zeros(3, dtype=np.int64))
    assert q_all == pytest.approx(0.0)


def test_disconnected_cliques_found():
    """Two 4-cliques joined by one edge → two communities."""
    rng = np.random.default_rng(5)
    edges = []
    for base in (0, 4):
        for i in range(4):
            for j in range(i + 1, 4):
                edges.append((base + i, base + j))
    edges.append((0, 4))
    src = np.array([e[0] for e in edges])
    dst = np.array([e[1] for e in edges])
    g = Graph.from_edges(src, dst, n=8, orientation="undirected")
    res = louvain(g)
    comm = res.table.column("community").to_numpy(zero_copy_only=False)
    assert len(set(comm[:4])) == 1 and len(set(comm[4:])) == 1
    assert comm[0] != comm[4]
    assert res.modularity > 0.3


def test_mod_opt_converges_flag():
    g = Graph.from_edge_list([("a", "b"), ("b", "c")], orientation="undirected")
    r = modularity_optimization(g.n, g.src, g.dst, None)
    assert r.did_converge
