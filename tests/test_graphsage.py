"""GraphSage (pipelines/graphsage.py): layer math, training descent,
inductive determinism, distributed inference equality."""

import numpy as np
import pytest

from graph_data_science_ray import Graph
from graph_data_science_ray.pipelines.graphsage import (GraphSageModel,
                                                        _forward,
                                                        graphsage_embeddings,
                                                        graphsage_train)


def _graph_and_features(n=40, m=200, d=6, seed=9):
    rng = np.random.default_rng(seed)
    g = Graph.from_edges(rng.integers(0, n, m), rng.integers(0, n, m),
                         n=n, orientation="undirected", aggregation="single")
    feats = rng.random((n, d))
    return g, feats


class TestForward:
    def test_mean_layer_exact(self):
        """One layer, identity-ish weights, full sampling: h(v) must equal
        act(W · mean({x_v} ∪ {x_u})) computed by hand."""
        g = Graph.from_edges([0, 0, 1], [1, 2, 2], n=3,
                             orientation="undirected", aggregation="single")
        feats = np.array([[1.0, 0.0], [0.0, 1.0], [2.0, 2.0]])
        W = np.array([[1.0, 0.5], [-0.5, 1.0], [0.25, 0.25]])
        model = GraphSageModel([W], activation="relu", sample_sizes=(10,))
        sh = g.shards(1, "natural")[0]
        emb, _ = _forward(feats, sh.indptr, sh.indices.astype(np.int64),
                          np.array([0]), model, np.random.default_rng(0))
        mean0 = feats[[0, 1, 2]].mean(axis=0)
        exp = np.maximum(W @ mean0, 0.0)
        exp = exp / np.linalg.norm(exp)
        np.testing.assert_allclose(emb[0], exp, atol=1e-12)

    def test_unit_norm_output(self):
        g, feats = _graph_and_features()
        model = graphsage_train(g, feats, embedding_dimension=8,
                                sample_sizes=(5, 5), epochs=1, seed=1)
        t = graphsage_embeddings(g, feats, model)
        e = np.asarray(t.column("embedding").to_pylist())
        norms = np.linalg.norm(e, axis=1)
        np.testing.assert_allclose(norms[norms > 0], 1.0, atol=1e-9)


class TestTraining:
    def test_loss_decreases(self):
        g, feats = _graph_and_features(n=60, m=400)
        model = graphsage_train(g, feats, embedding_dimension=8,
                                sample_sizes=(5,), epochs=5, batch_size=30,
                                learning_rate=0.5, seed=2)
        assert model.losses[-1] < model.losses[0]

    def test_deterministic(self):
        g, feats = _graph_and_features()
        m1 = graphsage_train(g, feats, embedding_dimension=8,
                             sample_sizes=(5,), epochs=2, seed=3)
        m2 = graphsage_train(g, feats, embedding_dimension=8,
                             sample_sizes=(5,), epochs=2, seed=3)
        for a, b in zip(m1.weights, m2.weights):
            np.testing.assert_array_equal(a, b)

    def test_feature_shape_validation(self):
        g, feats = _graph_and_features()
        with pytest.raises(ValueError):
            graphsage_train(g, feats[:-1], sample_sizes=(5,))


class TestInference:
    def test_ray_matches_local(self):
        g, feats = _graph_and_features(n=80, m=400)
        model = graphsage_train(g, feats, embedding_dimension=8,
                                sample_sizes=(5, 5), epochs=1, seed=4)
        tl = graphsage_embeddings(g, feats, model, batch_size=16,
                                  execution="local")
        tr = graphsage_embeddings(g, feats, model, batch_size=16,
                                  execution="ray")
        np.testing.assert_allclose(
            np.asarray(tl.column("embedding").to_pylist()),
            np.asarray(tr.column("embedding").to_pylist()), atol=1e-12)

    def test_inductive_new_features(self):
        """Inductive: the SAME model applied to a different feature matrix
        yields different but valid embeddings (no retraining)."""
        g, feats = _graph_and_features()
        model = graphsage_train(g, feats, embedding_dimension=8,
                                sample_sizes=(5,), epochs=1, seed=5)
        t2 = graphsage_embeddings(g, feats * 2.0 + 0.1, model)
        e2 = np.asarray(t2.column("embedding").to_pylist())
        assert np.isfinite(e2).all() and e2.shape == (g.n, 8)
