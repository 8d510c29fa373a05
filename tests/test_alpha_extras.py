"""Alpha-tier tail operators (pipelines/alpha_extras.py): approx max-k-cut,
influence maximization (Greedy/CELF + Independent Cascade), CollapsePath."""

import numpy as np
import pytest

from graph_data_science_ray import Graph
from graph_data_science_ray.pipelines.alpha_extras import (approx_max_k_cut,
                                                           collapse_path,
                                                           influence_maximization)
from graph_data_science_ray.state.store import GraphStore


class TestApproxMaxKCut:
    def test_bipartite_recovers_partition(self):
        """Complete bipartite K_{6,6}: the optimal 2-cut is the bipartition
        (cut cost 36); local search from random starts must find it."""
        left = np.repeat(np.arange(6), 6)
        right = 6 + np.tile(np.arange(6), 6)
        g = Graph.from_edges(left, right, n=12)
        res = approx_max_k_cut(g, k=2, iterations=8, seed=1)
        comm = res["table"].column("community").to_numpy(zero_copy_only=False)
        assert res["cut_cost"] == 36.0
        assert len(set(comm[:6])) == 1 and len(set(comm[6:])) == 1
        assert comm[0] != comm[6]

    def test_weighted_and_k3(self):
        rng = np.random.default_rng(5)
        n, m = 60, 400
        g = Graph.from_edges(rng.integers(0, n, m), rng.integers(0, n, m),
                             rng.random(m), n=n)
        res = approx_max_k_cut(g, k=3, iterations=4, seed=2)
        comm = res["table"].column("community").to_numpy(zero_copy_only=False)
        assert set(np.unique(comm)) <= {0, 1, 2}
        # cut must beat a random assignment's expectation (2/3 of weight)
        total = g.weight.sum()
        assert res["cut_cost"] > 2.0 / 3.0 * total

    def test_deterministic(self):
        rng = np.random.default_rng(6)
        g = Graph.from_edges(rng.integers(0, 30, 100),
                             rng.integers(0, 30, 100), n=30)
        a = approx_max_k_cut(g, k=2, seed=3)
        b = approx_max_k_cut(g, k=2, seed=3)
        assert a["cut_cost"] == b["cut_cost"]
        np.testing.assert_array_equal(
            a["table"].column("community").to_numpy(zero_copy_only=False),
            b["table"].column("community").to_numpy(zero_copy_only=False))

    def test_k_validation(self):
        g = Graph.from_edges([0], [1], n=2)
        with pytest.raises(ValueError):
            approx_max_k_cut(g, k=1)


def _celf_fixture():
    """CELFTest graph: a,b are hubs fanning to c..j; c..j chain to g..j."""
    names = list("abcdefghij")
    idx = {c: i for i, c in enumerate(names)}
    edges = [("a", t) for t in "cdefghij"] + [("b", t) for t in "cdefghij"] \
        + [("c", "g"), ("d", "h"), ("e", "i"), ("f", "j")]
    return Graph.from_edges([idx[a] for a, _ in edges],
                            [idx[b] for _, b in edges], n=10), idx


class TestInfluenceMaximization:
    def test_hubs_selected_first(self):
        g, idx = _celf_fixture()
        t = influence_maximization(g, seed_set_size=3,
                                   propagation_probability=0.3,
                                   monte_carlo_simulations=30, seed=4)
        nodes = t.column("node").to_pylist()
        # a or b (the degree-8 hubs) must lead the seed set
        assert nodes[0] in (idx["a"], idx["b"])
        spreads = t.column("spread").to_pylist()
        assert all(b >= a for a, b in zip(spreads, spreads[1:]))  # cumulative

    def test_greedy_and_celf_agree_on_first_pick(self):
        g, idx = _celf_fixture()
        tg = influence_maximization(g, seed_set_size=2, method="greedy",
                                    propagation_probability=0.3,
                                    monte_carlo_simulations=30, seed=4)
        tc = influence_maximization(g, seed_set_size=2, method="celf",
                                    propagation_probability=0.3,
                                    monte_carlo_simulations=30, seed=4)
        assert tg.column("node").to_pylist()[0] == \
            tc.column("node").to_pylist()[0]
        assert tg.column("spread").to_pylist()[0] == \
            pytest.approx(tc.column("spread").to_pylist()[0])

    def test_ray_matches_local(self):
        g, _ = _celf_fixture()
        a = influence_maximization(g, seed_set_size=2,
                                   propagation_probability=0.2,
                                   monte_carlo_simulations=20, seed=5,
                                   execution="local")
        b = influence_maximization(g, seed_set_size=2,
                                   propagation_probability=0.2,
                                   monte_carlo_simulations=20, seed=5,
                                   execution="ray")
        assert a.column("node").to_pylist() == b.column("node").to_pylist()
        np.testing.assert_allclose(a.column("spread").to_numpy(),
                                   b.column("spread").to_numpy())


class TestCollapsePath:
    def _store(self):
        """CollapsePathTest: patients a,b took drug e; c,d took drug f."""
        store = GraphStore(6)
        # a=0 b=1 c=2 d=3 e=4(drug) f=5(drug)
        store.add_relationship_type("TOOK", [0, 1, 2, 3], [4, 4, 5, 5])
        return store

    def test_same_drug_no_loops(self):
        store = self._store()
        t = collapse_path(store, [[("TOOK", "natural"), ("TOOK", "reverse")]])
        pairs = sorted(zip(t.column("src").to_pylist(),
                           t.column("dst").to_pylist()))
        assert pairs == [(0, 1), (1, 0), (2, 3), (3, 2)]

    def test_with_self_loops(self):
        store = self._store()
        t = collapse_path(store, [[("TOOK", "natural"), ("TOOK", "reverse")]],
                          allow_self_loops=True)
        pairs = sorted(zip(t.column("src").to_pylist(),
                           t.column("dst").to_pylist()))
        assert pairs == [(0, 0), (0, 1), (1, 0), (1, 1),
                         (2, 2), (2, 3), (3, 2), (3, 3)]

    def test_mutate_and_multi_template(self):
        store = self._store()
        store.add_relationship_type("KNOWS", [0], [2])
        collapse_path(store, [[("TOOK", "natural"), ("TOOK", "reverse")],
                              [("KNOWS", "natural")]],
                      mutate_relationship_type="OUT")
        assert "OUT" in store.relationship_types()
        s, d, _ = store._rels["OUT"]
        assert (0, 2) in set(zip(s.tolist(), d.tolist()))
        assert store.relationship_count("OUT") == 5

    def test_three_hop(self):
        store = GraphStore(4)
        store.add_relationship_type("E", [0, 1, 2], [1, 2, 3])
        t = collapse_path(store, [["E", "E", "E"]])
        assert list(zip(t.column("src").to_pylist(),
                        t.column("dst").to_pylist())) == [(0, 3)]
