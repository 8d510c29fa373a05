import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session", autouse=True)
def ray_session():
    import ray

    from graph_data_science_ray.stages.memory import configure_worker_memory
    configure_worker_memory()  # before ray.init: workers inherit the env
    ray.init(address="local", num_cpus=4, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext
    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.execution_options.preserve_order = False
    yield
    ray.shutdown()


@pytest.fixture
def pagerank_fixture_graph():
    """11-node graph from PageRankTest.java:72-105 (FIXTURES.md §2.1)."""
    from graph_data_science_ray import Graph
    edges = [("b", "c"), ("c", "b"), ("d", "a"), ("d", "b"), ("e", "b"), ("e", "d"),
             ("e", "f"), ("f", "b"), ("f", "e"), ("g", "b"), ("g", "e"), ("h", "b"),
             ("h", "e"), ("i", "b"), ("i", "e"), ("j", "e"), ("k", "e")]
    return Graph.from_edge_list(edges, nodes=list("abcdefghijk"))


@pytest.fixture
def doc_web_graph():
    """8-page weighted web graph from page-rank.adoc:249-272 (FIXTURES.md §2.3)."""
    from graph_data_science_ray import Graph
    nodes = ["About", "Home", "Links", "Product", "Site A", "Site B", "Site C", "Site D"]
    edges = [("Home", "About", 0.2), ("Home", "Links", 0.2), ("Home", "Product", 0.6),
             ("About", "Home", 1.0), ("Product", "Home", 1.0), ("Site A", "Home", 1.0),
             ("Site B", "Home", 1.0), ("Site C", "Home", 1.0), ("Site D", "Home", 1.0),
             ("Links", "Home", 0.8), ("Links", "Site A", 0.05), ("Links", "Site B", 0.05),
             ("Links", "Site C", 0.05), ("Links", "Site D", 0.05)]
    return Graph.from_edge_list(edges, nodes=nodes)


@pytest.fixture
def lpa_doc_graph():
    from graph_data_science_ray import Graph
    nodes = ["Alice", "Bridget", "Charles", "Doug", "Mark", "Michael"]
    edges = [("Alice", "Bridget", 1), ("Alice", "Charles", 10), ("Mark", "Doug", 1),
             ("Bridget", "Michael", 1), ("Doug", "Mark", 1), ("Michael", "Alice", 1),
             ("Alice", "Michael", 1), ("Bridget", "Alice", 1), ("Michael", "Bridget", 1),
             ("Charles", "Doug", 1)]
    seeds = {"Alice": 52, "Bridget": 21, "Charles": 43, "Doug": 21, "Mark": 19,
             "Michael": 52}
    return Graph.from_edge_list(edges, nodes=nodes, node_props={"seed": seeds})
