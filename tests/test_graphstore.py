"""Multi-type GraphStore: type-filtered views, union composition, orientation
matrix — mirrors the reference's union-graph WCC matrix (WccTest.java:121-151)
and GraphStore.java:33-120 semantics."""

import numpy as np
import pytest

from graph_data_science_ray import wcc
from graph_data_science_ray.state.store import GraphStore

# the reference's union fixture: 5 chains a->b<-c with alternating types A/B
# (WccTest.java orientationAndGraphs)
NODES = list("abcdefghijklmno")
TYPE_A = [("a", "b"), ("d", "e"), ("g", "h"), ("j", "k"), ("m", "n")]
TYPE_B = [("c", "b"), ("f", "e"), ("i", "h"), ("l", "k"), ("o", "n")]
SEEDS = {n: i // 3 for i, n in enumerate(NODES[:12])}  # m,n,o unseeded


@pytest.fixture
def union_store():
    return GraphStore.from_typed_edge_lists(
        {"A": TYPE_A, "B": TYPE_B}, nodes=NODES, name="union")


@pytest.mark.parametrize("orientation", ["natural", "reverse", "undirected"])
def test_union_wcc_orientation_matrix(union_store, orientation):
    """WCC ignores direction: all three orientations of the union view give the
    5 three-node components (WccTest.shouldComputeComponents)."""
    g = union_store.graph(orientation=orientation)
    res = wcc(g, execution="local")
    comp = res.table.column("component").to_numpy(zero_copy_only=False)
    expect = np.repeat(np.arange(5) * 3, 3)  # min-vid of each {3i,3i+1,3i+2}
    assert np.array_equal(comp, expect)


def test_type_filtered_view(union_store):
    """Running on type A only: each a->b pair is a 2-component, c isolated."""
    g = union_store.graph(["A"])
    assert g.num_edges == 5
    res = wcc(g, execution="local")
    comp = res.table.column("component").to_numpy(zero_copy_only=False)
    # a,b together; c alone (its edge is type B)
    assert comp[0] == comp[1] and comp[2] == 2


def test_union_equals_concat(union_store):
    ga = union_store.graph(["A"])
    gu = union_store.graph(["A", "B"])
    assert gu.num_edges == ga.num_edges + union_store.relationship_count("B")
    assert union_store.relationship_count() == 10


def test_unknown_type_raises(union_store):
    with pytest.raises(KeyError):
        union_store.graph(["C"])


def test_delete_relationships(union_store):
    n = union_store.delete_relationships("B")
    assert n == 5
    assert union_store.relationship_types() == ["A"]


def test_weighted_union_mixed_types():
    """A weighted + an unweighted type union: missing weights default to 1.0
    (DefaultValue semantics)."""
    store = GraphStore.from_typed_edge_lists(
        {"W": [("a", "b", 2.5)], "U": [("b", "c")]})
    g = store.graph()
    assert g.is_weighted
    assert sorted(g.weight.tolist()) == [1.0, 2.5]


def test_save_load_roundtrip(tmp_path, union_store):
    union_store.save(str(tmp_path / "store"))
    st2 = GraphStore.load(str(tmp_path / "store"))
    assert st2.relationship_types() == ["A", "B"]
    g1 = union_store.graph(orientation="undirected")
    g2 = st2.graph(orientation="undirected")
    assert np.array_equal(g1.src, g2.src) and np.array_equal(g1.dst, g2.dst)
    assert np.array_equal(np.asarray(st2.keys, dtype=object),
                          np.asarray(union_store.keys, dtype=object))


def test_seeded_wcc_on_union(union_store):
    """Seeded WCC over the union view (WccTest.seededWccOnUnionGraphs):
    components adopt their root's seed; unseeded chains get fresh ids."""
    store = GraphStore.from_typed_edge_lists(
        {"A": TYPE_A, "B": TYPE_B}, nodes=NODES, node_props={"seed": SEEDS})
    g = store.graph(orientation="undirected")
    res = wcc(g, seed_property="seed", execution="local")
    comp = res.table.column("component").to_numpy(zero_copy_only=False)
    assert comp[0] == comp[1] == comp[2] == 0
    assert comp[3] == comp[4] == comp[5] == 1
    assert comp[12] == comp[13] == comp[14] > 3  # fresh id above max seed


class TestModelCatalog:
    def test_store_list_exists_drop(self):
        from graph_data_science_ray.pipelines.graphsage import GraphSageModel
        from graph_data_science_ray.state.models import ModelCatalog
        import numpy as np
        cat = ModelCatalog()
        m = GraphSageModel(weights=[np.ones((4, 8)), np.ones((4, 8))])
        cat.store("m1", m)
        assert cat.exists("m1") and not cat.exists("m2")
        assert cat.list() == [{"modelName": "m1", "modelType": "graphSage"}]
        import pytest
        with pytest.raises(ValueError):
            cat.store("m1", m)
        cat.store("m1", m, overwrite=True)
        assert cat.drop("m1") and not cat.drop("m1")
        assert cat.list() == []

    def test_save_load_roundtrip_and_inference_equality(self, tmp_path):
        import numpy as np
        from graph_data_science_ray import (Graph, graphsage_embeddings,
                                            graphsage_train)
        from graph_data_science_ray.state.models import ModelCatalog
        rng = np.random.default_rng(3)
        src = rng.integers(0, 30, 120)
        dst = rng.integers(0, 30, 120)
        keep = src != dst
        g = Graph.from_edges(src[keep], dst[keep], n=30)
        feats = rng.random((30, 6))
        model = graphsage_train(g, feats, embedding_dimension=8,
                                epochs=1, seed=5)
        cat = ModelCatalog(str(tmp_path))
        cat.store("sage", model)
        cat.save("sage")
        cat2 = ModelCatalog(str(tmp_path))
        loaded = cat2.load("sage")
        e1 = graphsage_embeddings(g, feats, model)
        e2 = graphsage_embeddings(g, feats, loaded)
        np.testing.assert_array_equal(
            np.asarray(e1.column("embedding").to_pylist()),
            np.asarray(e2.column("embedding").to_pylist()))


class TestResumablePartitionedSink:
    def _ds(self, n=200):
        import pandas as pd
        import numpy as np
        import ray.data
        return ray.data.from_pandas(pd.DataFrame({
            "k": np.arange(n, dtype=np.int64),
            "v": np.arange(n, dtype=np.int64) * 2.5})).repartition(4)

    def test_roundtrip_and_manifest(self, tmp_path):
        import pandas as pd
        from graph_data_science_ray.sources.sink import (
            read_partitioned_parquet, write_partitioned_parquet)
        out = str(tmp_path / "sink1")
        man = write_partitioned_parquet(self._ds(), out, "k", P=8)
        assert man.num_rows == 8
        assert not any(man.column("skipped").to_pylist())
        assert sum(man.column("rows").to_pylist()) == 200
        back = read_partitioned_parquet(out).to_pandas() \
            .sort_values("k").reset_index(drop=True)
        assert back["k"].tolist() == list(range(200))
        assert back["v"].tolist() == [i * 2.5 for i in range(200)]

    def test_resume_skips_finished_parts(self, tmp_path):
        import os
        from graph_data_science_ray.sources.sink import (
            read_partitioned_parquet, write_partitioned_parquet)
        out = str(tmp_path / "sink2")
        write_partitioned_parquet(self._ds(), out, "k", P=6)
        parts = sorted(os.listdir(out))
        assert len(parts) == 6 and not any(".tmp" in p for p in parts)
        victim = os.path.join(out, parts[2])
        os.remove(victim)  # simulate a crash that lost one part
        mtimes = {p: os.path.getmtime(os.path.join(out, p))
                  for p in parts if p != parts[2]}
        man2 = write_partitioned_parquet(self._ds(), out, "k", P=6) \
            .to_pandas().set_index("part")
        assert man2["skipped"].sum() == 5  # only the victim was rewritten
        assert os.path.exists(victim)
        for p, m in mtimes.items():  # untouched parts not rewritten
            assert os.path.getmtime(os.path.join(out, p)) == m
        back = read_partitioned_parquet(out).to_pandas()
        assert sorted(back["k"].tolist()) == list(range(200))

    def test_range_bounds_layout(self, tmp_path):
        import numpy as np
        import pyarrow.parquet as pq
        import os
        from graph_data_science_ray.sources.sink import write_partitioned_parquet
        out = str(tmp_path / "sink3")
        man = write_partitioned_parquet(
            self._ds(100), out, "k",
            bounds=np.asarray([0, 25, 50, 100], dtype=np.int64))
        assert man.column("rows").to_pylist() == [25, 25, 50]
        # range layout: part files hold disjoint ascending key ranges
        t0 = pq.read_table(os.path.join(out, "part=00000.parquet"))
        assert max(t0.column("k").to_pylist()) < 25
