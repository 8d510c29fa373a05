"""Opt-in shard-actor pool cache (GDS_ACTOR_POOL_CACHE=1, pregel.py): a
long-lived engine keeps its BSP shard actors warm across algorithm runs on the
same graph (the GDS graph-catalog usage shape) — fork + imports + CSR build
are paid once; later runs pay only reset + init.  Must be bit-identical to the
uncached path, reuse the SAME actors for a same-(orientation, P) rerun,
respawn on a key change, and release cleanly."""

import os

import numpy as np
import pytest

from graph_data_science_ray import run_pregel
from graph_data_science_ray.pipelines.pagerank import PageRankComputation
from graph_data_science_ray.pipelines.pregel import release_actor_pool
from graph_data_science_ray.pipelines.wcc import WccComputation
from graph_data_science_ray.sources.generator import random_graph


@pytest.fixture
def cache_env(monkeypatch):
    monkeypatch.setenv("GDS_ACTOR_POOL_CACHE", "1")


def _vals(res, col):
    return res.table.column(col).to_numpy(zero_copy_only=False)


def test_cached_rerun_is_bit_identical_and_reuses_actors(cache_env):
    g = random_graph(3000, 6, weighted=False, seed=11)
    r1 = run_pregel(g, PageRankComputation(0.85, 1e-9, [], False), max_iterations=12,
                    execution="ray", num_partitions=3)
    pool1 = getattr(g, "_actor_pool", None)
    assert pool1 is not None and len(pool1[1]) == 3
    ids1 = [w._actor_id for w in pool1[1]]
    r2 = run_pregel(g, PageRankComputation(0.85, 1e-9, [], False), max_iterations=12,
                    execution="ray", num_partitions=3)
    pool2 = g._actor_pool
    assert [w._actor_id for w in pool2[1]] == ids1  # SAME live actors
    assert np.array_equal(_vals(r1, "score"), _vals(r2, "score"))
    assert r1.ran_iterations == r2.ran_iterations

    # uncached reference run (fresh graph handle => fresh actors)
    release_actor_pool(g)
    os.environ.pop("GDS_ACTOR_POOL_CACHE", None)
    r3 = run_pregel(g, PageRankComputation(0.85, 1e-9, [], False), max_iterations=12,
                    execution="ray", num_partitions=3)
    assert np.array_equal(_vals(r1, "score"), _vals(r3, "score"))
    assert getattr(g, "_actor_pool", None) is None


def test_key_change_respawns_pool(cache_env):
    g = random_graph(2000, 5, weighted=False, seed=12)
    run_pregel(g, PageRankComputation(0.85, 1e-9, [], False), max_iterations=5,
               execution="ray", num_partitions=2)
    ids_pr = [w._actor_id for w in g._actor_pool[1]]
    # WCC runs undirected — different (orientation, nparts) key
    rw = run_pregel(g, WccComputation(), max_iterations=50,
                    execution="ray", num_partitions=2)
    ids_wcc = [w._actor_id for w in g._actor_pool[1]]
    assert ids_wcc != ids_pr  # old pool killed, new pool for the new key
    # correctness of the respawned run vs the local kernel
    rl = run_pregel(g, WccComputation(), max_iterations=50, execution="local")
    assert np.array_equal(_vals(rw, "component"), _vals(rl, "component"))
    release_actor_pool(g)


def test_release_is_idempotent_and_next_run_respawns(cache_env):
    import ray
    g = random_graph(1500, 4, weighted=False, seed=13)
    r1 = run_pregel(g, PageRankComputation(0.85, 1e-9, [], False), max_iterations=6,
                    execution="ray", num_partitions=2)
    pool = g._actor_pool[1]
    release_actor_pool(g)
    release_actor_pool(g)  # no-op second time
    assert g._actor_pool is None
    # killed actors must not be reused: a fresh run spawns and still matches
    r2 = run_pregel(g, PageRankComputation(0.85, 1e-9, [], False), max_iterations=6,
                    execution="ray", num_partitions=2)
    assert np.array_equal(_vals(r1, "score"), _vals(r2, "score"))
    # the killed pool is actually dead
    with pytest.raises(Exception):
        ray.get(pool[0].reset.remote(PageRankComputation(0.85, 1e-9, [], False)))
    release_actor_pool(g)
