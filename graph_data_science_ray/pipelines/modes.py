"""Uniform execution-mode surface: every algorithm × stream | stats | mutate | write.

Reference: proc/common/src/main/java/org/neo4j/gds/{StreamProc,MutateProc,
WriteProc}.java — the same result consumed four ways (SURVEY.md §2.7):

  * ``stream`` — per-vertex rows (vid [, key], value);
  * ``stats``  — summary only: count + community/score histogram percentiles
                 (AbstractCommunityResultBuilder.java:70-100 semantics);
  * ``mutate`` — attach the result as a node property on the catalog graph;
  * ``write``  — persist the result table as parquet.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

_ALGOS = {}


def _algo(name):
    def reg(fn):
        _ALGOS[name] = fn
        return fn
    return reg


class _TableResult:
    """Adapter for algorithms that return a bare table (hits, delta
    stepping): gives the dispatcher the ``.table`` surface it consumes."""

    def __init__(self, table):
        self.table = table


def _resolve(algo: str):
    if not _ALGOS:
        from . import (hits as hits_mod, labelprop, louvain, pagerank, paths,
                       paths_local, sllpa as sllpa_mod, triangles, wcc)
        _ALGOS.update({
            "pagerank": lambda g, **kw: pagerank.pagerank(g, **kw),
            "articlerank": lambda g, **kw: pagerank.article_rank(g, **kw),
            "eigenvector": lambda g, **kw: pagerank.eigenvector(g, **kw),
            "wcc": lambda g, **kw: wcc.wcc(g, **kw),
            "labelpropagation": lambda g, **kw: labelprop.label_propagation(g, **kw),
            "trianglecount": lambda g, **kw: triangles.triangle_count(g, **kw),
            "louvain": lambda g, **kw: louvain.louvain(g, **kw),
            "sssp": lambda g, **kw: paths.shortest_paths(g, **kw),
            "hits": lambda g, **kw: _TableResult(hits_mod.hits(g, **kw)),
            "deltastepping": lambda g, **kw: _TableResult(
                paths_local.delta_stepping(g, **kw)),
            "sllpa": lambda g, **kw: _TableResult(sllpa_mod.sllpa(g, **kw)),
        })
    if algo not in _ALGOS:
        raise ValueError(f"unknown algorithm {algo!r}; have {sorted(_ALGOS)}")
    return _ALGOS[algo]


def community_stats(values: np.ndarray) -> dict:
    """Community-size statistics — AbstractCommunityResultBuilder.build:
    distinct community count + size-histogram percentiles (HdrHistogram p1..p999
    in the reference; exact percentiles here)."""
    uq, counts = np.unique(values, return_counts=True)
    pct = {f"p{str(p).replace('.', '')}": float(np.percentile(counts, p))
           for p in (1, 5, 10, 25, 50, 75, 90, 95, 99, 99.9)}
    return {"communityCount": int(uq.shape[0]),
            "min": int(counts.min()), "max": int(counts.max()),
            "mean": float(counts.mean()), **pct}


def score_stats(values: np.ndarray) -> dict:
    pct = {f"p{str(p).replace('.', '')}": float(np.percentile(values, p))
           for p in (1, 5, 10, 25, 50, 75, 90, 95, 99, 99.9)}
    return {"min": float(values.min()), "max": float(values.max()),
            "mean": float(values.mean()), **pct}


def stream_relationship_properties(graph) -> pa.Table:
    """gds.graph.streamRelationshipProperties analogue: the edge table with its
    property column(s) as rows (src, dst, weight)."""
    cols = {"src": graph.src, "dst": graph.dst}
    if graph.weight is not None:
        cols["weight"] = graph.weight
    return pa.table(cols)


def write_relationships(rel_table, path: str, *, src_col: str = "src",
                        dst_col: str = "dst") -> dict:
    """gds.graph.writeRelationship analogue: persist a relationship set (e.g. a
    similarity result (node1, node2, similarity)) as a canonical edge parquet.
    Accepts a pyarrow Table or a Ray Dataset (written in parallel per block)."""
    import os
    if hasattr(rel_table, "write_parquet"):  # Ray Dataset: parallel block write
        os.makedirs(path, exist_ok=True)
        rel_table.write_parquet(path)
        rows = rel_table.count()
    else:
        t = rel_table
        names = list(t.column_names)
        rename = {src_col: "src", dst_col: "dst"}
        t = t.rename_columns([rename.get(c, c) for c in names])
        pq.write_table(t, path)
        rows = t.num_rows
    return {"writePath": path, "relationshipsWritten": int(rows)}


def export_csv(graph, out_dir: str) -> dict:
    """gds.graph.export CSV analogue (csv/.../GraphStoreToFileExporter.java):
    vertices.csv + edges.csv + a tiny schema sidecar."""
    import json
    import os

    from pyarrow import csv as pacsv
    os.makedirs(out_dir, exist_ok=True)
    vcols = {"vid": np.arange(graph.n, dtype=np.int64)}
    if graph.keys is not None:
        vcols["key"] = pa.array([str(k) for k in np.asarray(graph.keys,
                                                            dtype=object)])
    for pn, pv in graph.node_props.items():
        vcols[pn] = pv
    pacsv.write_csv(pa.table(vcols), os.path.join(out_dir, "vertices.csv"))
    ecols = {"src": graph.src, "dst": graph.dst}
    if graph.weight is not None:
        ecols["weight"] = graph.weight
    pacsv.write_csv(pa.table(ecols), os.path.join(out_dir, "edges.csv"))
    schema = {"n": graph.n, "weighted": graph.weight is not None,
              "node_props": sorted(graph.node_props),
              "has_keys": graph.keys is not None}
    with open(os.path.join(out_dir, "schema.json"), "w") as f:
        json.dump(schema, f)
    return {"exportDir": out_dir, "nodeCount": graph.n,
            "relationshipCount": graph.num_edges}


def import_csv(in_dir: str):
    """CSV import (csv/.../CsvGraphStoreImporter.java analogue)."""
    import json
    import os

    from pyarrow import csv as pacsv

    from ..state.graph import Graph
    with open(os.path.join(in_dir, "schema.json")) as f:
        schema = json.load(f)
    vt = pacsv.read_csv(os.path.join(in_dir, "vertices.csv"))
    et = pacsv.read_csv(os.path.join(in_dir, "edges.csv"))
    keys = (np.asarray([str(x) for x in vt.column("key").to_pylist()],
                       dtype=object) if schema["has_keys"] else None)
    props = {c: vt.column(c).to_numpy(zero_copy_only=False)
             for c in vt.column_names if c not in ("vid", "key")}
    return Graph(schema["n"],
                 et.column("src").to_numpy(zero_copy_only=False),
                 et.column("dst").to_numpy(zero_copy_only=False),
                 et.column("weight").to_numpy(zero_copy_only=False)
                 if schema["weighted"] else None,
                 keys=keys, node_props=props)


def run(algo: str, graph, mode: str = "stream", *, catalog=None,
        graph_name: Optional[str] = None, mutate_property: Optional[str] = None,
        write_path: Optional[str] = None, **config):
    """Run ``algo`` on ``graph`` and consume the result per ``mode``."""
    fn = _resolve(algo.lower().replace("_", ""))
    res = fn(graph, **config)
    table = res.table
    value_col = [c for c in table.column_names if c != "vid"][0]
    values = table.column(value_col).to_numpy(zero_copy_only=False)
    meta = {"ranIterations": getattr(res, "ran_iterations", None),
            "didConverge": getattr(res, "did_converge", None)}
    if hasattr(res, "global_count"):
        meta["globalTriangleCount"] = res.global_count
    if mode == "stream":
        if graph.keys is not None:
            table = table.append_column("key", pa.array(
                [str(k) for k in np.asarray(graph.keys, dtype=object)]))
        return table
    if mode == "stats":
        if values.dtype.kind in "iu":
            return {**meta, **community_stats(values)}
        return {**meta, **score_stats(values)}
    if mode == "mutate":
        if catalog is None or graph_name is None or mutate_property is None:
            raise ValueError("mutate mode needs catalog, graph_name, mutate_property")
        catalog.set_node_property(graph_name, mutate_property, values)
        return {**meta, "mutateProperty": mutate_property, "nodeCount": graph.n}
    if mode == "write":
        if write_path is None:
            raise ValueError("write mode needs write_path")
        pq.write_table(table, write_path)
        return {**meta, "writePath": write_path, "rowsWritten": table.num_rows}
    raise ValueError(f"unknown mode {mode!r}")
