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


def _resolve(algo: str):
    if not _ALGOS:
        from . import labelprop, louvain, pagerank, paths, triangles, wcc
        _ALGOS.update({
            "pagerank": lambda g, **kw: pagerank.pagerank(g, **kw),
            "articlerank": lambda g, **kw: pagerank.article_rank(g, **kw),
            "eigenvector": lambda g, **kw: pagerank.eigenvector(g, **kw),
            "wcc": lambda g, **kw: wcc.wcc(g, **kw),
            "labelpropagation": lambda g, **kw: labelprop.label_propagation(g, **kw),
            "trianglecount": lambda g, **kw: triangles.triangle_count(g, **kw),
            "louvain": lambda g, **kw: louvain.louvain(g, **kw),
            "sssp": lambda g, **kw: paths.shortest_paths(g, **kw),
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
