"""Utility user functions (gds.util.* / gds.version).

Reference: proc/common/src/main/java/org/neo4j/gds/functions/IsFiniteFunc.java
(isFinite/isInfinite/infinity/NaN null-and-NaN semantics),
AsNodeFunc.java (asNode returns null for a missing id; asNodes FILTERS
missing ids instead of inserting nulls), NodePropertyFunc.java (long
properties surface as float64, the long-missing sentinel surfaces as NaN,
a NaN double surfaces as null, null arrays surface as empty arrays, unknown
property keys raise listing the available keys), and
proc/sysinfo/src/main/java/org/neo4j/gds/functions/VersionFunc.java.

The Neo4j entity context is replaced by the engine's own state objects: a
node "entity" is a plain dict of the canonical vertex row (vid, key, and
the graph's node_props values at that vid), and ``node_property`` resolves
against a Graph or a catalog name via GraphCatalog.get.  Scalar forms
mirror the Cypher signatures; ``is_finite_column`` is the vectorized
Dataset form (Arrow ``pc.is_finite`` with null→False, one kernel call per
batch).
"""

from __future__ import annotations

import math
from typing import Optional

import numpy as np
import pyarrow as pa

def version() -> str:
    """gds.version() — the library version string (VersionFunc.java).
    Imported lazily: the package __init__ defines __version__ after the
    function-module imports run."""
    from .. import __version__
    return __version__


def is_finite(value) -> bool:
    """gds.util.isFinite — True iff value is a finite number; null/NaN/±inf
    are all non-finite (IsFiniteFunc.java:isFinite)."""
    return value is not None and math.isfinite(float(value))


def is_infinite(value) -> bool:
    """gds.util.isInfinite — the exact complement, including null → True."""
    return value is None or not math.isfinite(float(value))


def infinity() -> float:
    """gds.util.infinity()"""
    return math.inf


def nan() -> float:
    """gds.util.NaN()"""
    return math.nan


def as_node(graph, node_id) -> Optional[dict]:
    """gds.util.asNode — the vertex row for ``node_id`` (an original key when
    the graph carries keys, else a dense vid) as a dict, or None when no such
    node exists (AsNodeFunc.java returns null, never throws)."""
    vid = _resolve_vid(graph, node_id)
    if vid is None:
        return None
    row = {"vid": int(vid)}
    if graph.keys is not None:
        row["key"] = graph.keys[vid]
    for pname, vals in graph.node_props.items():
        row[pname] = vals[vid]
    return row


def as_nodes(graph, node_ids) -> list:
    """gds.util.asNodes — rows for the ids that exist; missing ids are
    DROPPED, not emitted as None (AsNodeFunc.java:asNodes filter)."""
    out = []
    for i in node_ids:
        row = as_node(graph, i)
        if row is not None:
            out.append(row)
    return out


def node_property(graph_or_catalog, node_id, property_key: str, *,
                  graph_name: Optional[str] = None):
    """gds.util.nodeProperty — one property value from a stored graph.

    ``graph_or_catalog``: a Graph, or a GraphCatalog plus ``graph_name``
    (the reference resolves through GraphStoreCatalog.get).  Value
    conversion mirrors NodePropertyFunc.java exactly:

      * integer property  → float64 (the reference returns double for LONG);
        the long-missing sentinel (int64 min) → NaN;
      * float property    → the value, except NaN → None;
      * array property    → the array, except null → empty array;
      * unknown key       → ValueError listing available keys;
      * unknown node id   → ValueError.
    """
    g = graph_or_catalog
    if graph_name is not None:
        g = graph_or_catalog.get(graph_name)
    if property_key not in g.node_props:
        raise ValueError(
            f"Node projection does not have property key '{property_key}'. "
            f"Available keys: {sorted(g.node_props)}.")
    vid = _resolve_vid(g, node_id)
    if vid is None:
        raise ValueError(f"Node id {node_id!r} does not exist.")
    vals = np.asarray(g.node_props[property_key])
    v = vals[vid]
    if vals.dtype == object or vals.ndim > 1:
        # array-valued property: null → empty (NodePropertyFunc DOUBLE_ARRAY)
        return np.asarray([]) if v is None else np.asarray(v)
    if np.issubdtype(vals.dtype, np.integer):
        iv = int(v)
        return math.nan if iv == np.iinfo(np.int64).min else float(iv)
    fv = float(v)
    return None if math.isnan(fv) else fv


def _resolve_vid(graph, node_id) -> Optional[int]:
    """Original key → dense vid (keys are vid-ascending == key-sorted, so a
    searchsorted probe suffices); integer ids on keyless graphs are vids."""
    if graph.keys is not None and isinstance(node_id, str):
        keys = np.asarray(graph.keys, dtype=object)
        pos = int(np.searchsorted(keys, node_id))
        if pos < len(keys) and keys[pos] == node_id:
            return pos
        return None
    try:
        vid = int(node_id)
    except (TypeError, ValueError):
        return None
    return vid if 0 <= vid < graph.n else None


def is_finite_column(ds, column: str, *, out: str = "is_finite"):
    """Vectorized Dataset form of gds.util.isFinite over a numeric column:
    one Arrow kernel per batch, null → False (matching the scalar form)."""
    import pyarrow.compute as pc

    def _fin(t: pa.Table) -> pa.Table:
        col = t.column(column)
        if pa.types.is_integer(col.type):
            fin = pc.is_valid(col)  # a valid integer is always finite
        else:
            fin = pc.is_finite(col)
        return t.append_column(out, pc.coalesce(fin, pa.scalar(False)))

    return ds.map_batches(_fin, batch_format="pyarrow")
