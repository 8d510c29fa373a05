"""as_dataset=True for the centrality family: per-shard (vid, centrality)
tables published by the shard actors' finalize tasks — value-equal to the
table-returning form on both the local and the sharded (execution="ray")
paths."""

import numpy as np
import pytest

from graph_data_science_ray.pipelines.betweenness import betweenness_centrality
from graph_data_science_ray.pipelines.centrality import (closeness_centrality,
                                                         harmonic_centrality)
from graph_data_science_ray.state.graph import Graph


def _rand_graph(seed=7, n=300, m=1500, orientation="natural"):
    rng = np.random.default_rng(seed)
    src = rng.integers(0, n, m)
    dst = rng.integers(0, n, m)
    keep = src != dst
    return Graph.from_edges(src[keep], dst[keep], n=n, orientation=orientation,
                            aggregation="single")


def _as_df(ds):
    df = ds.to_pandas().sort_values("vid").reset_index(drop=True)
    assert df.columns.tolist() == ["vid", "centrality"]
    return df


@pytest.mark.usefixtures("ray_session")
class TestCentralityAsDataset:
    @pytest.mark.parametrize("execution", ["local", "ray"])
    def test_closeness(self, execution):
        g = _rand_graph()
        tab = closeness_centrality(g, execution=execution).to_pandas()
        df = _as_df(closeness_centrality(g, execution=execution,
                                         as_dataset=True))
        assert len(df) == g.n and df["vid"].tolist() == list(range(g.n))
        np.testing.assert_allclose(df["centrality"], tab["centrality"],
                                   atol=1e-12)

    def test_closeness_wasserman_faust(self):
        g = _rand_graph(seed=8)
        tab = closeness_centrality(g, wasserman_faust=True,
                                   execution="ray").to_pandas()
        df = _as_df(closeness_centrality(g, wasserman_faust=True,
                                         execution="ray", as_dataset=True))
        np.testing.assert_allclose(df["centrality"], tab["centrality"],
                                   atol=1e-12)

    @pytest.mark.parametrize("execution", ["local", "ray"])
    def test_harmonic(self, execution):
        g = _rand_graph(seed=9)
        tab = harmonic_centrality(g, execution=execution).to_pandas()
        df = _as_df(harmonic_centrality(g, execution=execution,
                                        as_dataset=True))
        np.testing.assert_allclose(df["centrality"], tab["centrality"],
                                   atol=1e-12)

    @pytest.mark.parametrize("execution", ["local", "ray"])
    def test_betweenness(self, execution):
        g = _rand_graph(seed=10, n=120, m=700)
        tab = betweenness_centrality(g, execution=execution).to_pandas()
        df = _as_df(betweenness_centrality(g, execution=execution,
                                           as_dataset=True))
        np.testing.assert_allclose(df["centrality"], tab["centrality"],
                                   atol=1e-9)

    def test_betweenness_undirected_divisor(self):
        g = _rand_graph(seed=11, n=120, m=700, orientation="undirected")
        tab = betweenness_centrality(g, undirected=True,
                                     execution="ray").to_pandas()
        df = _as_df(betweenness_centrality(g, undirected=True,
                                           execution="ray", as_dataset=True))
        np.testing.assert_allclose(df["centrality"], tab["centrality"],
                                   atol=1e-9)

    def test_tiny_graph_collapsed_bounds(self):
        # nparts < 2 → local fallback arrays wrapped into one table
        g = Graph.from_edges([0, 1], [1, 2], n=3)
        df = _as_df(closeness_centrality(g, execution="ray", as_dataset=True))
        tab = closeness_centrality(g).to_pandas()
        np.testing.assert_allclose(df["centrality"], tab["centrality"],
                                   atol=1e-12)
