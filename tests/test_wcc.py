"""WCC conformance: component(v) = min vid of its component (Union-by-Min fixpoint,
HugeAtomicDisjointSetStruct.java:166-191)."""

import numpy as np
import pytest

from graph_data_science_ray import Graph, wcc


def components(res):
    return res.table.column("component").to_numpy(zero_copy_only=False)


def chains_graph(orientation="natural"):
    """16 disjoint 10-node chains — WccTest.java:88-119."""
    src, dst = [], []
    for i in range(16):
        for j in range(9):
            src.append(10 * i + j)
            dst.append(10 * i + j + 1)
    return Graph.from_edges(src, dst, n=160, orientation=orientation)


EXPECTED_CHAINS = np.repeat(np.arange(16) * 10, 10)


class TestChains:
    @pytest.mark.parametrize("orientation", ["natural", "reverse", "undirected"])
    def test_direction_ignored(self, orientation):
        # direction is ignored (Wcc.java:292-296) — all orientations agree
        res = wcc(chains_graph(orientation), execution="local")
        assert np.array_equal(components(res), EXPECTED_CHAINS)

    def test_actor_mode_exact(self):
        res = wcc(chains_graph(), execution="ray", num_partitions=4)
        assert np.array_equal(components(res), EXPECTED_CHAINS)

    def test_ray_data_mode_exact(self):
        res = wcc(chains_graph(), execution="ray-data", num_partitions=4)
        assert np.array_equal(components(res), EXPECTED_CHAINS)

    def test_partition_invariance(self):
        for P in (1, 3, 7):
            res = wcc(chains_graph(), execution="local", num_partitions=P)
            assert np.array_equal(components(res), EXPECTED_CHAINS), P


class TestDocExample:
    """wcc.adoc fixture — Alice..Michael (FIXTURES.md §3.2)."""

    NODES = ["Alice", "Bridget", "Charles", "Doug", "Mark", "Michael"]
    EDGES = [("Alice", "Bridget", 0.5), ("Alice", "Charles", 4.0),
             ("Mark", "Doug", 1.1), ("Mark", "Michael", 2.0)]

    def graph(self):
        return Graph.from_edge_list(self.EDGES, nodes=self.NODES)

    def test_unweighted(self):
        res = wcc(self.graph(), execution="local")
        got = dict(zip(self.NODES, components(res)))
        assert got == {"Alice": 0, "Bridget": 0, "Charles": 0,
                       "Doug": 3, "Mark": 3, "Michael": 3}

    def test_threshold(self):
        # union only when weight > 1.0 (Wcc.java:313-319): Bridget splits off
        res = wcc(self.graph(), threshold=1.0, execution="local")
        got = dict(zip(self.NODES, components(res)))
        assert got == {"Alice": 0, "Bridget": 1, "Charles": 0,
                       "Doug": 3, "Mark": 3, "Michael": 3}

    def test_threshold_requires_weights(self):
        g = Graph.from_edge_list([("a", "b")])
        with pytest.raises(ValueError):
            wcc(g, threshold=1.0)

    def test_consecutive_ids(self):
        res = wcc(self.graph(), threshold=1.0, consecutive_ids=True, execution="local")
        got = components(res)
        assert set(got) == {0, 1, 2}


class TestRandomized:
    def test_vs_bfs_closure(self):
        """Erdős–Rényi style random graphs vs a brute-force closure oracle."""
        rng = np.random.default_rng(7)
        for trial in range(5):
            n = int(rng.integers(20, 60))
            m = int(rng.integers(10, 80))
            src = rng.integers(0, n, m)
            dst = rng.integers(0, n, m)
            g = Graph.from_edges(src, dst, n=n)
            res = wcc(g, execution="local", num_partitions=int(rng.integers(1, 5)))
            # oracle: iterative min-label over the undirected adjacency
            comp = np.arange(n)
            for _ in range(n):
                nxt = comp.copy()
                np.minimum.at(nxt, src, comp[dst])
                np.minimum.at(nxt, dst, comp[src])
                if np.array_equal(nxt, comp):
                    break
                comp = nxt
            assert np.array_equal(components(res), comp), trial


class TestSeeded:
    def test_seeded_component_ids(self):
        """Seeded semantics: component id = seed of the min-vid root; unseeded
        components numbered above maxSeed in root order
        (HugeAtomicDisjointSetStruct.setIdOf:131-149)."""
        from graph_data_science_ray import Graph, wcc
        # three chains: [0..3] seeded 42 (on root), [4..7] unseeded, [8..11] seeded 7
        src = [0, 1, 2, 4, 5, 6, 8, 9, 10]
        dst = [1, 2, 3, 5, 6, 7, 9, 10, 11]
        seeds = np.full(12, np.nan)
        seeds[0] = 42.0
        seeds[8] = 7.0
        g = Graph.from_edges(src, dst, n=12, node_props={"seed": seeds})
        res = wcc(g, seed_property="seed", execution="local")
        comp = res.table.column("component").to_numpy(zero_copy_only=False)
        assert comp[:4].tolist() == [42] * 4
        assert comp[8:].tolist() == [7] * 4
        # unseeded chain gets maxSeed + 1 = 43
        assert comp[4:8].tolist() == [43] * 4
