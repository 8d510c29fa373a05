"""Resumable partitioned Parquet sink.

The 100 TB output shape the build contract asks for: one directory per key
partition (never one giant file), each part written by the task that owns its
rows via tmp-file + atomic ``os.replace`` — a part file either exists complete
or not at all — so a re-run of a failed job SKIPS finished partitions and
rewrites only the missing ones.  The skip test is pure filesystem state (no
driver bookkeeping to lose with the driver).

Partitioning is the repo's known-partitioner exchange (stages/exchange.py):
rows route by ``hash_parts`` on the key (or caller-provided range bounds),
and the per-partition combine both writes the file and returns a 1-row stats
table, so the driver ends the run holding only the P-row manifest.
"""
from __future__ import annotations

import os
from typing import Optional

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _write_part(out_dir: str, p: int, t: pa.Table) -> pa.Table:
    path = os.path.join(out_dir, f"part={p:05d}.parquet")
    skipped = os.path.exists(path)
    if not skipped:
        tmp = path + f".tmp.{os.getpid()}"
        pq.write_table(t, tmp)
        os.replace(tmp, path)  # atomic: the part exists complete or not
    return pa.table({"part": pa.array([p], pa.int64()),
                     "rows": pa.array([t.num_rows], pa.int64()),
                     "skipped": pa.array([skipped], pa.bool_())})


def write_partitioned_parquet(ds, out_dir: str, key_col: str, *,
                              P: Optional[int] = None,
                              bounds: Optional[np.ndarray] = None):
    """Write ``ds`` as ``out_dir/part=NNNNN.parquet`` partitioned by
    ``key_col`` (hash partitioning by default; pass ``bounds`` for
    range-partitioned, pruning-friendly layout).  Returns the run manifest as
    a pyarrow Table (part, rows, skipped) — ``skipped=True`` rows were
    already complete from a previous run and were NOT rewritten.

    Resumability contract: a part file appears only via atomic rename, so
    after any crash the directory holds a subset of complete parts; re-running
    the same write skips exactly those.  Rows-to-part assignment is a pure
    function of the key (hash or fixed bounds), so a resume routes every row
    to the same part it would have reached in the first run.
    """
    import ray
    import ray.data as _rd

    from ..stages.bucketing import adaptive_bucket_count, rows_if_cheap
    from ..stages.exchange import exchange_refs, hash_parts, range_parts
    from ..stages.blocks import nonempty_arrow_refs

    os.makedirs(out_dir, exist_ok=True)
    if bounds is not None:
        part_of = range_parts(key_col, np.asarray(bounds, dtype=np.int64))
        P = len(bounds) - 1
    else:
        if P is None:
            P = adaptive_bucket_count(rows_if_cheap(ds))
        part_of = hash_parts(key_col, P=P)

    mat = ds.materialize()
    refs, counts = nonempty_arrow_refs(mat)
    if not refs:
        return pa.table({"part": pa.array([], pa.int64()),
                         "rows": pa.array([], pa.int64()),
                         "skipped": pa.array([], pa.bool_())})

    def _combine(p: int, t: pa.Table) -> pa.Table:
        return _write_part(out_dir, p, t)

    out = exchange_refs(refs, part_of, P, combine=_combine,
                        total_rows=sum(counts))
    stats = [s for s in ray.get(out) if s.num_rows]
    return pa.concat_tables(stats).sort_by("part")


def read_partitioned_parquet(in_dir: str, **kw):
    """Read a directory written by ``write_partitioned_parquet`` (schema
    metadata stripped, same as every other reader in the repo)."""
    from .io import read_parquet_clean
    return read_parquet_clean(in_dir, **kw)
