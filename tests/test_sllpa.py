"""SLLPA (gds.alpha.sllpa) — overlapping communities.

Fixture parity: alpha/alpha-proc/src/test/java/org/neo4j/gds/pregel/
SpeakerListenerLPATest.java, reproduced bit-exactly via java_compat=True
(java.util.Random(42) + AsyncQueueMessenger visibility at concurrency 1).
"""

import numpy as np
import pyarrow as pa
import pytest

from graph_data_science_ray.state.graph import Graph
from graph_data_science_ray.pipelines.sllpa import (
    JavaRandom, _majority, _prune, _sllpa_sharded, _sllpa_sync, sllpa,
    sllpa_exploded)

# the GDL fixture (SpeakerListenerLPATest.java:45-57): x,a..i = vids 0..9
FIXTURE_PAIRS = [("a", "b"), ("a", "c"), ("b", "e"), ("b", "d"), ("b", "c"),
                 ("e", "f"), ("f", "g"), ("f", "h"), ("f", "i"), ("h", "i"),
                 ("g", "i")]
FIXTURE_NODES = ["x", "a", "b", "c", "d", "e", "f", "g", "h", "i"]


def _fixture_graph():
    vid = {k: i for i, k in enumerate(FIXTURE_NODES)}
    src = [vid[a] for a, b in FIXTURE_PAIRS]
    dst = [vid[b] for a, b in FIXTURE_PAIRS]
    return Graph.from_edges(src, dst, n=10)


def _communities(table: pa.Table) -> dict:
    comms: dict = {}
    for v, lst in zip(table.column("vid").to_pylist(),
                      table.column("community_ids").to_pylist()):
        for c in lst:
            comms.setdefault(c, set()).add(v)
    return comms


class TestJavaRandom:
    def test_known_stream(self):
        # java.util.Random(42).nextInt(10) reference stream (public LCG spec)
        r = JavaRandom(42)
        assert [r.next_int(10) for _ in range(5)] == [0, 3, 8, 4, 0]

    def test_power_of_two_path(self):
        r = JavaRandom(42)
        vals = [r.next_int(8) for _ in range(100)]
        assert min(vals) >= 0 and max(vals) < 8

    def test_bound_one(self):
        assert JavaRandom(1).next_int(1) == 0


class TestReferenceFixtures:
    def test_without_pruning(self):
        """SpeakerListenerLPATest.testWithoutPruning — exact communities."""
        t = sllpa(_fixture_graph(), max_iterations=10,
                  min_association_strength=0.0, seed=42, java_compat=True)
        assert _communities(t) == {
            0: {0}, 1: {1, 2, 3, 4, 5, 6, 7, 8, 9}, 2: {2, 4, 5, 6, 7, 8, 9},
            3: {3}, 4: {4}, 5: {5, 6, 7, 8, 9}, 6: {6, 7, 8, 9}, 7: {7},
            8: {8}, 9: {9}}

    def test_prunes_away_after_many_iterations(self):
        """SpeakerListenerLPATest.prunesAwayAfterManyIterations — exact."""
        t = sllpa(_fixture_graph(), max_iterations=30, seed=42,
                  java_compat=True)
        assert _communities(t) == {
            0: {0}, 1: {1, 2, 3, 4, 5, 6, 7, 8, 9}, 2: {8, 9}}


class TestKernels:
    def test_majority_tie_to_smaller(self):
        d = np.array([1, 1, 1, 1], dtype=np.int64)
        l = np.array([7, 3, 7, 3], dtype=np.int64)
        dv, lv = _majority(d, l)
        assert dv.tolist() == [1] and lv.tolist() == [3]

    def test_majority_frequency_wins(self):
        d = np.array([2, 2, 2], dtype=np.int64)
        l = np.array([9, 9, 1], dtype=np.int64)
        _, lv = _majority(d, l)
        assert lv.tolist() == [9]

    def test_prune_strictly_greater(self):
        labels = np.array([[5, 5, 7, 8]], dtype=np.int64)  # freqs .5/.25/.25
        off, kept = _prune(labels, 0.25)  # 0.25 NOT > 0.25 → only label 5
        assert kept.tolist() == [5]
        off, kept = _prune(labels, 0.2)
        assert kept.tolist() == [5, 7, 8]

    def test_no_messages_keeps_own_id(self):
        # two isolated nodes plus one edge: targets never hear from 2
        g = Graph.from_edges([0], [1], n=3)
        t = sllpa(g, max_iterations=4, min_association_strength=0.0, seed=1)
        comms = _communities(t)
        assert comms[2] == {2}

    def test_sync_deterministic(self):
        g = _fixture_graph()
        a = _sllpa_sync(g, 10, 0.2, 42)
        b = _sllpa_sync(g, 10, 0.2, 42)
        assert a.equals(b)

    def test_exploded_shape(self):
        g = _fixture_graph()
        t = sllpa_exploded(g, max_iterations=2,
                           min_association_strength=0.0, seed=42)
        assert t.column_names == ["vid", "community_id"]
        # every node keeps at least its own id
        assert set(t.column("vid").to_pylist()) == set(range(10))

    def test_max_iterations_two_is_deterministic_and_rng_free(self):
        """T=2 ⇒ no speak step ⇒ no randomness: java_compat == counter kernel."""
        g = _fixture_graph()
        a = sllpa(g, max_iterations=2, min_association_strength=0.0,
                  seed=1, java_compat=True)
        b = sllpa(g, max_iterations=2, min_association_strength=0.0,
                  seed=99, execution="local")
        assert a.equals(b)

    def test_edgeless_graph(self):
        g = Graph.from_edges([], [], n=3)
        t = sllpa(g, max_iterations=5, min_association_strength=0.0, seed=1)
        assert _communities(t) == {0: {0}, 1: {1}, 2: {2}}

    def test_validation(self):
        g = _fixture_graph()
        with pytest.raises(ValueError):
            sllpa(g, max_iterations=1)
        with pytest.raises(ValueError):
            sllpa(g, java_compat=True, execution="ray")


@pytest.mark.usefixtures("ray_session")
class TestShardedPath:
    def test_bit_equal_to_local(self):
        rng = np.random.default_rng(7)
        n, m = 500, 4000
        src = rng.integers(0, n, m)
        dst = rng.integers(0, n, m)
        keep = src != dst
        g = Graph.from_edges(src[keep], dst[keep], n=n, aggregation="single")
        loc = _sllpa_sync(g, 10, 0.2, 42)
        for P in (2, 3):
            sh = _sllpa_sharded(g, 10, 0.2, 42, P, False)
            assert loc.equals(sh), f"P={P} diverged from local kernel"

    def test_as_dataset(self):
        rng = np.random.default_rng(3)
        src = rng.integers(0, 200, 1500)
        dst = rng.integers(0, 200, 1500)
        keep = src != dst
        g = Graph.from_edges(src[keep], dst[keep], n=200, aggregation="single")
        ds = sllpa(g, execution="ray", num_partitions=2, as_dataset=True)
        assert ds.count() == 200

    def test_dispatcher(self):
        from graph_data_science_ray.pipelines.modes import run
        g = _fixture_graph()
        res = run("sllpa", g, mode="stream", max_iterations=10, seed=42,
                  java_compat=True)
        assert res.num_rows == 10
