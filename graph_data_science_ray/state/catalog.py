"""Graph catalog — named graph management (the ``gds.graph.*`` procedure family).

Reference: core/loading/GraphStoreCatalog.java (user → name → store map),
proc/catalog/GraphListProc.java, GraphDropProc.java, GraphStoreExportProc.java.
Here a catalog entry is a directory in the canonical parquet layout
(Graph.save/load) under a base path, so "catalog ops" are manifest/filesystem
operations and the stored graphs are exactly the engine's canonical tables —
list/exists/drop/export/import all operate on the same layout."""

from __future__ import annotations

import json
import os
import shutil
import time
from typing import Optional

import numpy as np

from .graph import Graph


class GraphCatalog:
    def __init__(self, base_dir: str):
        self.base = base_dir
        os.makedirs(base_dir, exist_ok=True)
        self._cache: dict = {}

    def _dir(self, name: str) -> str:
        if "/" in name or name.startswith("."):
            raise ValueError(f"invalid graph name {name!r}")
        return os.path.join(self.base, name)

    def create(self, name: str, graph: Graph, *, num_partitions: int = 8,
               overwrite: bool = False) -> dict:
        d = self._dir(name)
        if os.path.exists(d):
            if not overwrite:
                raise ValueError(f"graph {name!r} already exists "
                                 "(ref GraphCreateProc name check)")
            shutil.rmtree(d)
        graph.save(d, num_partitions=num_partitions)
        with open(os.path.join(d, "catalog.json"), "w") as f:
            json.dump({"name": name, "created_at": time.time(),
                       "node_count": graph.n, "relationship_count": graph.num_edges,
                       "weighted": graph.is_weighted}, f)
        self._cache[name] = graph
        return self.info(name)

    def exists(self, name: str) -> bool:
        return os.path.exists(os.path.join(self._dir(name), "manifest.json"))

    def get(self, name: str) -> Graph:
        if name in self._cache:
            return self._cache[name]
        if not self.exists(name):
            raise KeyError(f"graph {name!r} not in catalog")
        g = Graph.load(self._dir(name))
        self._cache[name] = g
        return g

    def info(self, name: str) -> dict:
        with open(os.path.join(self._dir(name), "catalog.json")) as f:
            return json.load(f)

    def list(self) -> list:
        out = []
        for name in sorted(os.listdir(self.base)):
            if self.exists(name):
                out.append(self.info(name))
        return out

    def drop(self, name: str) -> bool:
        d = self._dir(name)
        if not os.path.exists(d):
            return False
        shutil.rmtree(d)
        self._cache.pop(name, None)
        return True

    def set_node_property(self, name: str, prop: str, values: np.ndarray) -> None:
        """``mutate`` mode: attach a result column to the stored graph
        (GraphWriteNodePropertiesProc analogue — persisted to vertices.parquet)."""
        g = self.get(name)
        g.node_props[prop] = np.asarray(values)
        g.save_vertices(self._dir(name))  # mutate touches vertices only — the
        # edge layout (and its partition count) stays exactly as created
        with open(os.path.join(self._dir(name), "catalog.json"), "w") as f:
            json.dump({"name": name, "created_at": time.time(),
                       "node_count": g.n, "relationship_count": g.num_edges,
                       "weighted": g.is_weighted}, f)


    def remove_node_property(self, name: str, prop: str) -> bool:
        """``gds.graph.removeNodeProperties`` analogue: drop a stored node
        property column and persist the slimmer vertex table.  Returns False
        when the property is absent (the reference raises; a boolean keeps the
        surface idempotent for retried jobs)."""
        g = self.get(name)
        if prop not in g.node_props:
            return False
        del g.node_props[prop]
        g.save_vertices(self._dir(name))
        return True


def degree_distribution(graph: Graph) -> dict:
    """Degree histogram percentiles — the ``gds.graph.list`` degreeDistribution
    (proc/catalog/.../GraphInfoWithHistogram.java, HdrHistogram percentiles).
    Exact percentiles via the degree array (our scales); a t-digest merge per
    partition is the >memory path."""
    deg = graph.out_degrees()
    pct = {f"p{p}".replace(".", ""): float(np.percentile(deg, p))
           for p in (1, 5, 10, 25, 50, 75, 90, 95, 99, 99.9)}
    return {"min": int(deg.min(initial=0)), "max": int(deg.max(initial=0)),
            "mean": float(deg.mean()) if deg.shape[0] else 0.0, **pct}


def filter_subgraph(graph: Graph, *, node_mask: Optional[np.ndarray] = None,
                    node_pred=None, edge_pred=None) -> tuple:
    """Subgraph filtering with id re-densification — the
    ``gds.beta.graph.create.subgraph`` analogue (subgraph-filtering/.../
    GraphStoreFilter.java: filter nodes → filter rels on both endpoints →
    rebuild IdMap).  Returns (subgraph, old_vids) where old_vids[i] is the
    original vid of new vid i (ids stay ascending — IdMap invariant)."""
    if node_mask is None:
        node_mask = np.ones(graph.n, dtype=bool)
        if node_pred is not None:
            node_mask = np.asarray(node_pred(graph), dtype=bool)
    keep_vids = np.nonzero(node_mask)[0]
    new_id = np.full(graph.n, -1, dtype=np.int64)
    new_id[keep_vids] = np.arange(keep_vids.shape[0])
    ekeep = node_mask[graph.src] & node_mask[graph.dst]
    if edge_pred is not None and graph.weight is not None:
        ekeep &= np.asarray(edge_pred(graph.weight), dtype=bool)
    src = new_id[graph.src[ekeep]]
    dst = new_id[graph.dst[ekeep]]
    w = graph.weight[ekeep] if graph.weight is not None else None
    keys = (np.asarray(graph.keys, dtype=object)[keep_vids]
            if graph.keys is not None else None)
    props = {k: np.asarray(v)[keep_vids] for k, v in graph.node_props.items()}
    sub = Graph(keep_vids.shape[0], src, dst, w, keys=keys, node_props=props,
                name=f"{graph.name}_sub" if graph.name else None)
    return sub, keep_vids
