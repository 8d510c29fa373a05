"""gds.util.* / gds.version utility functions.

Semantics fixtures from proc/common/src/test/java/org/neo4j/gds/functions/
IsFiniteFuncTest.java (the exact truth table incl. null), AsNodeFuncTest.java
(missing ids: asNode → null, asNodes filters), NodePropertyFuncTest.java
(long → double, NaN double → null, unknown key/id raise).
"""

import math

import numpy as np
import pytest

from graph_data_science_ray.functions import util as U
from graph_data_science_ray.state.graph import Graph


class TestIsFinite:
    # IsFiniteFuncTest.isFinite / isInfinite truth tables, verbatim
    NON_FINITE = [None, math.nan, math.inf, -math.inf]
    FINITE = [0, 42.1337, 1.7976931348623157e308, 5e-324,
              2**63 - 1, -(2**63)]

    def test_is_finite(self):
        for v in self.NON_FINITE:
            assert U.is_finite(v) is False
        for v in self.FINITE:
            assert U.is_finite(v) is True

    def test_is_infinite_is_exact_complement(self):
        for v in self.NON_FINITE + self.FINITE:
            assert U.is_infinite(v) == (not U.is_finite(v))

    def test_constants(self):
        assert U.infinity() == math.inf
        assert math.isnan(U.nan())

    def test_doc_filter_example(self):
        # IsFiniteFuncTest.testInfinityAndNaN: the WHERE isFinite filter
        values = [42, U.infinity(), 13.37, 0, U.nan(),
                  1.7976931348623157e308, -13]
        kept = [x for x in values if U.is_finite(x)]
        assert kept == [42, 13.37, 0, 1.7976931348623157e308, -13]

    def test_is_finite_column(self, ray_session):
        import ray.data
        ds = ray.data.from_items([
            {"i": 0, "x": 1.0}, {"i": 1, "x": math.inf},
            {"i": 2, "x": math.nan}, {"i": 3, "x": None},
            {"i": 4, "x": -2.5},
        ])
        out = U.is_finite_column(ds, "x").to_pandas().sort_values("i")
        assert out["is_finite"].tolist() == [True, False, False, False, True]

    def test_is_finite_column_integer(self, ray_session):
        import ray.data
        ds = ray.data.from_items([{"i": 0, "x": 7}, {"i": 1, "x": None},
                                  {"i": 2, "x": -1}])
        out = U.is_finite_column(ds, "x").to_pandas().sort_values("i")
        assert out["is_finite"].tolist() == [True, False, True]


@pytest.fixture
def keyed_graph():
    return Graph.from_edge_list(
        [("a", "b"), ("b", "c")],
        node_props={"score": {"a": 1.5, "b": math.nan, "c": 3.0},
                    "rank": {"a": 7, "b": 8, "c": 9}})


class TestAsNode:
    def test_as_node_returns_row(self, keyed_graph):
        row = U.as_node(keyed_graph, "b")
        assert row["key"] == "b" and row["vid"] == 1
        assert row["rank"] == 8

    def test_as_node_missing_is_none(self, keyed_graph):
        assert U.as_node(keyed_graph, "zz") is None
        assert U.as_node(keyed_graph, 99) is None
        assert U.as_node(keyed_graph, -1) is None

    def test_as_nodes_filters_missing(self, keyed_graph):
        rows = U.as_nodes(keyed_graph, ["a", "zz", "c"])
        assert [r["key"] for r in rows] == ["a", "c"]

    def test_vid_lookup_on_keyless_graph(self):
        g = Graph.from_edges([0, 1], [1, 2], node_props={"p": np.arange(3.0)})
        assert U.as_node(g, 2) == {"vid": 2, "p": 2.0}


class TestNodeProperty:
    def test_long_property_returns_double(self, keyed_graph):
        v = U.node_property(keyed_graph, "a", "rank")
        assert isinstance(v, float) and v == 7.0

    def test_long_missing_sentinel_is_nan(self):
        g = Graph.from_edges([0], [1], node_props={
            "r": np.array([np.iinfo(np.int64).min, 5], dtype=np.int64)})
        assert math.isnan(U.node_property(g, 0, "r"))
        assert U.node_property(g, 1, "r") == 5.0

    def test_nan_double_is_none(self, keyed_graph):
        assert U.node_property(keyed_graph, "b", "score") is None
        assert U.node_property(keyed_graph, "c", "score") == 3.0

    def test_array_property_null_is_empty(self):
        g = Graph.from_edges([0], [1], node_props={
            "emb": np.array([None, np.array([1.0, 2.0])], dtype=object)})
        assert U.node_property(g, 0, "emb").shape == (0,)
        np.testing.assert_array_equal(U.node_property(g, 1, "emb"),
                                      [1.0, 2.0])

    def test_unknown_key_raises_listing_keys(self, keyed_graph):
        with pytest.raises(ValueError, match="Available keys.*rank.*score"):
            U.node_property(keyed_graph, "a", "nope")

    def test_unknown_node_raises(self, keyed_graph):
        with pytest.raises(ValueError, match="does not exist"):
            U.node_property(keyed_graph, "zz", "score")

    def test_through_catalog(self, keyed_graph, tmp_path):
        from graph_data_science_ray.state.catalog import GraphCatalog
        cat = GraphCatalog(str(tmp_path))
        cat.create("g", keyed_graph)
        assert U.node_property(cat, "a", "rank", graph_name="g") == 7.0


def test_version_matches_package():
    import graph_data_science_ray as gdsr
    assert U.version() == gdsr.__version__
