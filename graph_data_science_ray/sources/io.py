"""Parquet read helper: strip file-embedded schema metadata at the read.

pandas-written parquet carries a ``b"pandas"`` schema-metadata blob; under
pyarrow >= 16 a ``pa.Schema`` WITH metadata is unhashable ("unhashable type:
'dict'"), which defeats Ray Data's block-schema deduplication cache — every
read task logs "Failed to hash the schemas (for deduplication)" and every
downstream sort/reduce re-ships full schemas instead of cached hashes
(round-3 VERDICT Wrong #5: the spam source was the READ, not a pandas
stage).  Passing an explicitly stripped ``schema=`` to ``read_parquet``
makes every block carry the clean (hashable) schema from the start.
"""

from __future__ import annotations

import glob
import os
from typing import Optional, Sequence

import pyarrow as pa
import pyarrow.parquet as pq


def _parquet_files(path) -> list:
    """Expand ``path`` (file / directory / list) to concrete parquet files."""
    paths = list(path) if isinstance(path, (list, tuple)) else [path]
    out = []
    for p in paths:
        if os.path.isdir(p):
            out.extend(sorted(glob.glob(os.path.join(p, "**", "*.parquet"),
                                        recursive=True)))
        else:
            out.append(p)
    return out


def clean_schema(path: str,
                 columns: Optional[Sequence[str]] = None,
                 *, probe: int = 8) -> Optional[pa.Schema]:
    """The files' schema, metadata-stripped and projected to ``columns``.
    ``path`` may be a file, a directory, or a list of files.  Probes up to
    ``probe`` files (first and last, then a few more): if the probed
    schemas DISAGREE after projection (schema evolution across files),
    returns None so the caller falls back to plain ``read_parquet`` schema
    unification.  Raises FileNotFoundError on an empty directory."""
    files = _parquet_files(path)
    if not files:
        raise FileNotFoundError(f"no parquet files under {path!r}")
    sample = files if len(files) <= probe else \
        [files[0], files[-1]] + files[1:-1][:probe - 2]
    schemas = []
    for f in sample:
        s = pq.read_schema(f).remove_metadata()
        if columns is not None:
            try:
                s = pa.schema([s.field(c) for c in columns])
            except KeyError:
                return None  # a file lacks a projected column: let Ray unify
        schemas.append(s)
    if any(not s.equals(schemas[0]) for s in schemas[1:]):
        return None
    return schemas[0]


def read_parquet_clean(path, *, columns: Optional[Sequence[str]] = None,
                       **kwargs):
    """``ray.data.read_parquet`` with a metadata-stripped schema (see module
    docstring).  Accepts every read_parquet kwarg.  Falls back to a bare
    ``read_parquet`` (Ray's own schema unification) when the per-file
    schemas disagree — clean_schema returns None in that case."""
    import ray.data

    schema = clean_schema(path, columns)
    if schema is None:
        return ray.data.read_parquet(path, columns=list(columns) if columns
                                     else None, **kwargs)
    return ray.data.read_parquet(path, columns=list(columns) if columns
                                 else None, schema=schema, **kwargs)
