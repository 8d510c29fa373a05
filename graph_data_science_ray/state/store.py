"""GraphStore — one node set + N named relationship types, with type-filtered
graph views (the ``gds.graph.*`` multi-type model).

Reference: core/src/main/java/org/neo4j/gds/api/GraphStore.java:33-120 (the
store holds relationship types separately; ``getGraph(types, orientation)``
returns a filtered view) and core/huge/UnionGraph.java (the union of several
typed adjacencies served as one graph).  Here a typed view is materialized by
concatenating the selected types' edge tables and canonicalizing with the
requested orientation/aggregation — the Dataset-level analogue of UnionGraph's
composite cursor, with the same observable topology.
"""

from __future__ import annotations

import json
import os
from typing import Optional

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from .graph import Graph


class GraphStore:
    def __init__(self, n: int, *, keys=None, node_props=None, name=None):
        self.n = int(n)
        self.keys = keys
        self.node_props = dict(node_props or {})
        self.name = name
        self._rels: dict = {}  # type -> (src, dst, weight|None)

    # -- relationship-type management (GraphStore.java:76-120) -------------------

    def add_relationship_type(self, rel_type: str, src, dst, weight=None) -> None:
        # the name becomes a filename component in save() (rel_{t}.parquet) —
        # reject path separators / dot-prefixes like GraphCatalog._dir does
        if not rel_type or "/" in rel_type or "\\" in rel_type \
                or rel_type.startswith("."):
            raise ValueError(f"invalid relationship type name {rel_type!r}")
        if rel_type in self._rels:
            raise ValueError(f"relationship type {rel_type!r} already exists")
        src = np.asarray(src, dtype=np.int64)
        dst = np.asarray(dst, dtype=np.int64)
        w = None if weight is None else np.asarray(weight, dtype=np.float64)
        self._rels[rel_type] = (src, dst, w)

    def relationship_types(self) -> list:
        return sorted(self._rels)

    def delete_relationships(self, rel_type: str) -> int:
        """gds.graph.deleteRelationships — drops one type, returns deleted count."""
        src, _, _ = self._rels.pop(rel_type)
        return int(src.shape[0])

    @property
    def node_count(self) -> int:
        return self.n

    def relationship_count(self, rel_type: Optional[str] = None) -> int:
        if rel_type is not None:
            return int(self._rels[rel_type][0].shape[0])
        return int(sum(s.shape[0] for s, _, _ in self._rels.values()))

    # -- typed views --------------------------------------------------------------

    def graph(self, relationship_types=None, *, orientation: str = "natural",
              aggregation: str = "none") -> Graph:
        """Type-filtered view: union of the selected types' edges under the
        requested orientation/aggregation (UnionGraph semantics — parallel
        edges across types are preserved unless aggregated)."""
        types = (self.relationship_types() if relationship_types is None
                 else list(relationship_types))
        missing = [t for t in types if t not in self._rels]
        if missing:
            raise KeyError(f"unknown relationship types {missing}; "
                           f"have {self.relationship_types()}")
        srcs, dsts, ws = [], [], []
        any_weighted = any(self._rels[t][2] is not None for t in types)
        for t in types:
            s, d, w = self._rels[t]
            srcs.append(s)
            dsts.append(d)
            if any_weighted:
                ws.append(w if w is not None else np.ones(s.shape[0]))
        src = np.concatenate(srcs) if srcs else np.empty(0, dtype=np.int64)
        dst = np.concatenate(dsts) if dsts else np.empty(0, dtype=np.int64)
        w = np.concatenate(ws) if (ws and any_weighted) else None
        name = f"{self.name}[{','.join(types)}]" if self.name else None
        return Graph.from_edges(src, dst, w, n=self.n, orientation=orientation,
                                aggregation=aggregation, keys=self.keys,
                                node_props=self.node_props, name=name)

    # -- persistence --------------------------------------------------------------

    def save(self, path: str) -> str:
        os.makedirs(path, exist_ok=True)
        manifest = {"n": self.n, "name": self.name,
                    "relationship_types": {}}
        for t, (s, d, w) in self._rels.items():
            cols = {"src": s, "dst": d}
            if w is not None:
                cols["weight"] = w
            fp = os.path.join(path, f"rel_{t}.parquet")
            pq.write_table(pa.table(cols), fp)
            manifest["relationship_types"][t] = {
                "rows": int(s.shape[0]), "weighted": w is not None}
        vcols = {"vid": np.arange(self.n, dtype=np.int64)}
        if self.keys is not None:
            vcols["key"] = pa.array([str(k) for k in self.keys])
        for pn, pv in self.node_props.items():
            vcols[pn] = pv
        pq.write_table(pa.table(vcols), os.path.join(path, "vertices.parquet"))
        with open(os.path.join(path, "store_manifest.json"), "w") as f:
            json.dump(manifest, f, indent=2)
        return path

    @classmethod
    def load(cls, path: str) -> "GraphStore":
        with open(os.path.join(path, "store_manifest.json")) as f:
            manifest = json.load(f)
        vt = pq.read_table(os.path.join(path, "vertices.parquet"))
        keys = (np.asarray(vt.column("key").to_pylist(), dtype=object)
                if "key" in vt.column_names else None)
        props = {c: vt.column(c).to_numpy(zero_copy_only=False)
                 for c in vt.column_names if c not in ("vid", "key")}
        store = cls(manifest["n"], keys=keys, node_props=props,
                    name=manifest.get("name"))
        for t, meta in manifest["relationship_types"].items():
            rt = pq.read_table(os.path.join(path, f"rel_{t}.parquet"))
            store.add_relationship_type(
                t, rt.column("src").to_numpy(zero_copy_only=False),
                rt.column("dst").to_numpy(zero_copy_only=False),
                rt.column("weight").to_numpy(zero_copy_only=False)
                if meta["weighted"] else None)
        return store

    @classmethod
    def from_typed_edge_lists(cls, typed_edges: dict, nodes=None, *,
                              node_props=None, name=None) -> "GraphStore":
        """Fixture helper: {type: [(a, b[, w]), ...]} with string node keys."""
        if nodes is None:
            ks = set()
            for pairs in typed_edges.values():
                for p in pairs:
                    ks.add(p[0])
                    ks.add(p[1])
            nodes = sorted(ks)
        vid = {k: i for i, k in enumerate(nodes)}
        props = None
        if node_props:
            props = {pname: np.asarray([vals.get(k, np.nan) for k in nodes])
                     for pname, vals in node_props.items()}
        store = cls(len(nodes), keys=np.asarray(nodes, dtype=object),
                    node_props=props, name=name)
        for t, pairs in typed_edges.items():
            src = [vid[p[0]] for p in pairs]
            dst = [vid[p[1]] for p in pairs]
            w = ([float(p[2]) for p in pairs]
                 if pairs and len(pairs[0]) > 2 else None)
            store.add_relationship_type(t, src, dst, w)
        return store
