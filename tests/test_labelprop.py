"""Label propagation conformance vs the GDS doc + unit fixtures (FIXTURES.md §4)."""

import numpy as np

from graph_data_science_ray import Graph, label_propagation

NODES = ["Alice", "Bridget", "Charles", "Doug", "Mark", "Michael"]


def labels(res, nodes=NODES):
    return dict(zip(nodes, res.table.column("label").to_numpy(zero_copy_only=False)))


class TestDocExample:
    def test_unseeded(self, lpa_doc_graph):
        res = label_propagation(lpa_doc_graph, max_iterations=10, execution="local")
        assert labels(res) == {"Alice": 1, "Bridget": 1, "Michael": 1,
                               "Charles": 4, "Doug": 4, "Mark": 4}

    def test_weighted(self, lpa_doc_graph):
        res = label_propagation(lpa_doc_graph, max_iterations=10, weighted=True,
                                execution="local")
        assert labels(res) == {"Alice": 4, "Bridget": 2, "Michael": 2,
                               "Charles": 4, "Doug": 4, "Mark": 4}

    def test_seeded(self, lpa_doc_graph):
        res = label_propagation(lpa_doc_graph, max_iterations=10,
                                seed_property="seed", execution="local")
        assert labels(res) == {"Alice": 21, "Bridget": 21, "Michael": 21,
                               "Charles": 19, "Doug": 19, "Mark": 19}


class TestUnitFixtures:
    """LabelPropagationTest.java:65-136 — single-iteration trajectories at
    concurrency=1; our P=1 sweep reproduces the sequential async order."""

    EDGES = [("Alice", "Bridget", 1), ("Alice", "Charles", 10), ("Mark", "Doug", 1),
             ("Bridget", "Michael", 1), ("Doug", "Mark", 1), ("Michael", "Alice", 1),
             ("Alice", "Michael", 1), ("Bridget", "Alice", 1),
             ("Michael", "Bridget", 1), ("Charles", "Doug", 1)]

    def test_single_iteration_unseeded(self):
        g = Graph.from_edge_list(self.EDGES, nodes=NODES)
        res = label_propagation(g, max_iterations=1, execution="local",
                                num_partitions=1)
        got = [labels(res)[k] for k in NODES]
        assert got == [1, 1, 3, 4, 4, 1]

    def test_single_iteration_seeded(self):
        seeds = {"Alice": 2, "Bridget": 3, "Charles": 4, "Doug": 3, "Mark": 4,
                 "Michael": 2}
        g = Graph.from_edge_list(self.EDGES, nodes=NODES,
                                 node_props={"seedId": seeds})
        res = label_propagation(g, max_iterations=1, seed_property="seedId",
                                execution="local", num_partitions=1)
        got = [labels(res)[k] for k in NODES]
        assert got == [2, 2, 3, 4, 4, 2]


class TestDistributed:
    def test_actor_mode_community_structure(self, lpa_doc_graph):
        """P>1 trajectories may pick different representatives (the reference's own
        multi-threaded runs do too); the *partition into communities* must match."""
        res = label_propagation(lpa_doc_graph, max_iterations=10, execution="ray",
                                num_partitions=2)
        lab = res.table.column("label").to_numpy(zero_copy_only=False)
        groups = {}
        for node, l in zip(NODES, lab):
            groups.setdefault(l, set()).add(node)
        assert sorted(sorted(g) for g in groups.values()) == [
            ["Alice", "Bridget", "Michael"], ["Charles", "Doug", "Mark"]]

    def test_converges_flag(self, lpa_doc_graph):
        res = label_propagation(lpa_doc_graph, max_iterations=10, execution="local")
        assert res.did_converge
        assert res.ran_iterations <= 10

    def test_ray_data_mode_matches_actor(self, lpa_doc_graph):
        a = label_propagation(lpa_doc_graph, max_iterations=10, execution="ray",
                              num_partitions=2)
        d = label_propagation(lpa_doc_graph, max_iterations=10,
                              execution="ray-data", num_partitions=2)
        assert a.table.column("label").to_pylist() == \
            d.table.column("label").to_pylist()
