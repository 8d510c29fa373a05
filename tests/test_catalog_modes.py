"""Graph catalog, execution modes (stream/stats/mutate/write), degree centrality,
subgraph filtering, degree distribution."""

import numpy as np
import pytest

from graph_data_science_ray import Graph
from graph_data_science_ray.pipelines.degree import degree_centrality
from graph_data_science_ray.pipelines.modes import community_stats, run
from graph_data_science_ray.state.catalog import (GraphCatalog,
                                                  degree_distribution,
                                                  filter_subgraph)


@pytest.fixture
def g():
    rng = np.random.default_rng(31)
    return Graph.from_edges(rng.integers(0, 40, 160), rng.integers(0, 40, 160),
                            rng.random(160), n=40, aggregation="sum",
                            keys=np.array([f"n{i:02d}" for i in range(40)],
                                          dtype=object))


class TestCatalog:
    def test_create_list_exists_drop(self, tmp_path, g):
        cat = GraphCatalog(str(tmp_path))
        cat.create("g1", g)
        assert cat.exists("g1") and not cat.exists("g2")
        infos = cat.list()
        assert len(infos) == 1 and infos[0]["node_count"] == 40
        g2 = cat.get("g1")
        assert np.array_equal(g2.src, g.src)
        assert cat.drop("g1") and not cat.exists("g1")
        assert not cat.drop("g1")

    def test_remove_node_property(self, tmp_path, g):
        """gds.graph.removeNodeProperties analogue: drop + persist."""
        cat = GraphCatalog(str(tmp_path))
        cat.create("g1", g)
        cat.set_node_property("g1", "score", np.arange(40, dtype=np.float64))
        assert cat.remove_node_property("g1", "score")
        cat._cache.clear()
        assert "score" not in cat.get("g1").node_props
        assert not cat.remove_node_property("g1", "score")  # idempotent

    def test_duplicate_name_rejected(self, tmp_path, g):
        cat = GraphCatalog(str(tmp_path))
        cat.create("g1", g)
        with pytest.raises(ValueError):
            cat.create("g1", g)

    def test_mutate_roundtrip(self, tmp_path, g):
        cat = GraphCatalog(str(tmp_path))
        cat.create("g1", g)
        out = run("wcc", g, mode="mutate", catalog=cat, graph_name="g1",
                  mutate_property="component", execution="local")
        assert out["mutateProperty"] == "component"
        cat._cache.clear()
        g2 = cat.get("g1")
        assert "component" in g2.node_props
        assert g2.node_props["component"].shape[0] == 40


class TestModes:
    def test_stream_includes_keys(self, g):
        t = run("pagerank", g, mode="stream", execution="local", max_iterations=5)
        assert {"vid", "score", "key"} <= set(t.column_names)
        assert t.num_rows == 40

    def test_stats_community(self, g):
        s = run("wcc", g, mode="stats", execution="local")
        assert "communityCount" in s and "p50" in s and s["didConverge"]

    def test_stats_score(self, g):
        s = run("pagerank", g, mode="stats", execution="local", max_iterations=10)
        assert s["min"] >= 0.15 - 1e-9 and "p99" in s

    def test_write(self, tmp_path, g):
        import pyarrow.parquet as pq
        out = run("pagerank", g, mode="write", execution="local",
                  write_path=str(tmp_path / "pr.parquet"), max_iterations=5)
        assert out["rowsWritten"] == 40
        t = pq.read_table(tmp_path / "pr.parquet")
        assert t.num_rows == 40

    def test_unknown_algo(self, g):
        with pytest.raises(ValueError):
            run("louvain2000", g)

    def test_community_stats_values(self):
        s = community_stats(np.array([0, 0, 0, 1, 1, 2]))
        assert s["communityCount"] == 3
        assert s["min"] == 1 and s["max"] == 3


class TestDegree:
    def test_unweighted_natural(self):
        g = Graph.from_edges([0, 0, 1], [1, 2, 2], n=3)
        t = degree_centrality(g)
        assert t.column("score").to_pylist() == [2.0, 1.0, 0.0]

    def test_reverse_and_undirected(self):
        g = Graph.from_edges([0, 0, 1], [1, 2, 2], n=3)
        assert degree_centrality(g, orientation="reverse") \
            .column("score").to_pylist() == [0.0, 1.0, 2.0]
        assert degree_centrality(g, orientation="undirected") \
            .column("score").to_pylist() == [2.0, 2.0, 2.0]

    def test_weighted_positive_only(self):
        # DegreeCentrality.java:127 — only weights > 0 are summed
        g = Graph.from_edges([0, 0, 0], [1, 2, 1], [2.0, -5.0, 3.0], n=3,
                             aggregation="none")
        t = degree_centrality(g, weighted=True)
        assert t.column("score").to_pylist() == [5.0, 0.0, 0.0]


class TestSubgraph:
    def test_filter_and_redensify(self, g):
        sub, old = filter_subgraph(g, node_mask=np.arange(40) < 20)
        assert sub.n == 20
        assert old.tolist() == list(range(20))
        assert sub.src.max(initial=-1) < 20 and sub.dst.max(initial=-1) < 20
        # edges kept iff both endpoints kept
        expect = int((((g.src < 20) & (g.dst < 20))).sum())
        assert sub.num_edges == expect
        assert list(sub.keys) == [f"n{i:02d}" for i in range(20)]

    def test_edge_pred(self, g):
        sub, _ = filter_subgraph(g, edge_pred=lambda w: w > 0.5)
        assert np.all(sub.weight > 0.5)


class TestDegreeDistribution:
    def test_percentiles(self, g):
        d = degree_distribution(g)
        assert d["min"] <= d["p50"] <= d["max"]
        assert "p999" in d


def test_mutate_preserves_partition_layout(tmp_path):
    """set_node_property must not re-save edges with a different partition count
    (ADVICE r1: stale part files silently duplicated edges on reload)."""
    import numpy as np

    from graph_data_science_ray import Graph
    from graph_data_science_ray.state.catalog import GraphCatalog
    rng = np.random.default_rng(11)
    n, m = 60, 99
    g = Graph.from_edges(rng.integers(0, n, m), rng.integers(0, n, m), n=n)
    cat = GraphCatalog(str(tmp_path))
    cat.create("g", g, num_partitions=3)
    cat.set_node_property("g", "score", np.arange(n, dtype=np.float64))
    cat._cache.clear()
    g2 = cat.get("g")
    assert g2.num_edges == g.num_edges
    assert np.array_equal(g2.src, g.src) and np.array_equal(g2.dst, g.dst)
    assert np.array_equal(g2.node_props["score"], np.arange(n, dtype=np.float64))


def test_resave_with_fewer_partitions_drops_stale_parts(tmp_path):
    import numpy as np

    from graph_data_science_ray import Graph
    rng = np.random.default_rng(12)
    n, m = 60, 99
    g = Graph.from_edges(rng.integers(0, n, m), rng.integers(0, n, m), n=n)
    d = str(tmp_path / "g")
    g.save(d, num_partitions=6)
    g.save(d, num_partitions=2)
    g2 = Graph.load(d)
    assert g2.num_edges == g.num_edges


def test_stream_relationship_properties():
    import numpy as np

    from graph_data_science_ray import Graph
    from graph_data_science_ray.pipelines.modes import (
        stream_relationship_properties)
    g = Graph.from_edge_list([("a", "b", 2.0), ("b", "c", 0.5)])
    t = stream_relationship_properties(g)
    assert t.column_names == ["src", "dst", "weight"]
    assert sorted(t.column("weight").to_pylist()) == [0.5, 2.0]


def test_write_relationships_roundtrip(tmp_path):
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from graph_data_science_ray import Graph, node_similarity
    from graph_data_science_ray.pipelines.modes import write_relationships
    g = Graph.from_edge_list([("a", "i1"), ("b", "i1"), ("a", "i2"), ("b", "i2")],
                             nodes=["a", "b", "i1", "i2"])
    sims = node_similarity(g, top_k=0, similarity_cutoff=0.0)
    out = write_relationships(sims, str(tmp_path / "sims.parquet"),
                              src_col="node1", dst_col="node2")
    assert out["relationshipsWritten"] == sims.num_rows
    back = pq.read_table(str(tmp_path / "sims.parquet"))
    assert back.column_names == ["src", "dst", "similarity"]


def test_csv_export_import_roundtrip(tmp_path):
    import numpy as np

    from graph_data_science_ray import Graph, pagerank
    from graph_data_science_ray.pipelines.modes import export_csv, import_csv
    rng = np.random.default_rng(71)
    g = Graph.from_edges(rng.integers(0, 40, 120), rng.integers(0, 40, 120),
                         rng.random(120), n=40,
                         node_props={"seed": np.arange(40)})
    export_csv(g, str(tmp_path / "csv"))
    g2 = import_csv(str(tmp_path / "csv"))
    assert (g2.n, g2.num_edges) == (g.n, g.num_edges)
    assert np.array_equal(g2.src, g.src) and np.allclose(g2.weight, g.weight)
    assert np.array_equal(g2.node_props["seed"], g.node_props["seed"])
    s1 = pagerank(g, execution="local").table.column("score")
    s2 = pagerank(g2, execution="local").table.column("score")
    np.testing.assert_allclose(s1.to_numpy(zero_copy_only=False),
                               s2.to_numpy(zero_copy_only=False), atol=1e-12)
