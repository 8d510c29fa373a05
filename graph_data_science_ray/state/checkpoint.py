"""Per-iteration checkpointing with per-partition lineage.

The reference has no checkpointing (single in-memory run); this is the north-rule
requirement: after superstep K the full BSP state is written to
``<dir>/iter=K/part-*.parquet`` plus a ``manifest.json`` carrying the iteration,
a config fingerprint, per-partition row counts + content sha256 (lineage), and the
superstep metrics.  Writes are atomic (write to ``.tmp-iter=K``, then rename), so a
killed run leaves only complete checkpoints; resume picks the latest complete
iteration whose config fingerprint matches.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import time

import pyarrow as pa
import pyarrow.parquet as pq


def _fingerprint(comp) -> str:
    import numpy as np
    items = []
    for k in sorted(vars(comp)):
        v = vars(comp)[k]
        if isinstance(v, (int, float, str, bool, type(None), tuple)):
            items.append(f"{k}={v!r}")
        elif isinstance(v, np.ndarray):
            # array-valued config (personalized-PR sources, LPA seeds/weights)
            # must differentiate fingerprints or resume silently continues from
            # a run with different parameters
            h = hashlib.sha256(np.ascontiguousarray(v).tobytes()).hexdigest()[:16]
            items.append(f"{k}=ndarray[{v.dtype}:{v.shape}:{h}]")
    blob = type(comp).__name__ + "|" + "|".join(items)
    return hashlib.sha256(blob.encode()).hexdigest()[:16]


def _sha256_file(path: str) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


class CheckpointManager:
    def __init__(self, base_dir: str, comp):
        self.base = base_dir
        self.fp = _fingerprint(comp)
        os.makedirs(base_dir, exist_ok=True)

    def part_dir(self, iteration: int) -> str:
        return os.path.join(self.base, f"iter={iteration}")

    def latest(self):
        """Latest complete checkpoint iteration with a matching config fingerprint."""
        best = None
        for name in os.listdir(self.base):
            if not name.startswith("iter="):
                continue
            mpath = os.path.join(self.base, name, "manifest.json")
            if not os.path.exists(mpath):
                continue
            with open(mpath) as f:
                m = json.load(f)
            if m.get("fingerprint") != self.fp or not m.get("complete"):
                continue
            it = int(name.split("=", 1)[1])
            if best is None or it > best:
                best = it
        return best

    def _finalize(self, tmp: str, final: str, iteration: int, metrics: dict):
        files = sorted(f for f in os.listdir(tmp) if f.endswith(".parquet"))
        lineage = []
        for f in files:
            fp = os.path.join(tmp, f)
            lineage.append({"file": f, "rows": pq.ParquetFile(fp).metadata.num_rows,
                            "sha256": _sha256_file(fp)})
        manifest = {"iteration": iteration, "fingerprint": self.fp,
                    "written_at": time.time(), "partitions": lineage,
                    "metrics": metrics, "complete": True}
        with open(os.path.join(tmp, "manifest.json"), "w") as f:
            json.dump(manifest, f, indent=2)
        if os.path.exists(final):
            shutil.rmtree(final)
        os.rename(tmp, final)
        # per-superstep lineage log (SURVEY §3.2 Ray analogue): one JSON line
        # per checkpointed iteration, appended AFTER the atomic rename so a
        # line implies its checkpoint exists; resumed runs keep appending
        with open(os.path.join(self.base, "metrics.jsonl"), "a") as f:
            f.write(json.dumps({"iteration": iteration,
                                "fingerprint": self.fp,
                                "written_at": manifest["written_at"],
                                "rows": sum(e["rows"] for e in lineage),
                                **metrics}) + "\n")

    def write_local(self, iteration: int, part_tables: list, metrics: dict):
        tmp = os.path.join(self.base, f".tmp-iter={iteration}")
        if os.path.exists(tmp):
            shutil.rmtree(tmp)
        os.makedirs(tmp)
        for p, t in enumerate(part_tables):
            pq.write_table(t, os.path.join(tmp, f"part-{p:05d}.parquet"))
        self._finalize(tmp, self.part_dir(iteration), iteration, metrics)

    def write_ray(self, iteration: int, state_ds, metrics: dict):
        tmp = os.path.join(self.base, f".tmp-iter={iteration}")
        if os.path.exists(tmp):
            shutil.rmtree(tmp)
        os.makedirs(tmp)
        state_ds.write_parquet(tmp)
        self._finalize(tmp, self.part_dir(iteration), iteration, metrics)

    def part_files(self, iteration: int) -> list:
        """Sorted absolute paths of the part parquet files of one checkpoint
        (excluding manifest.json — required by ray.data.read_parquet resume)."""
        d = self.part_dir(iteration)
        return [os.path.join(d, f) for f in sorted(os.listdir(d))
                if f.endswith(".parquet")]

    def read_part(self, iteration: int, p: int) -> pa.Table:
        d = self.part_dir(iteration)
        files = sorted(f for f in os.listdir(d) if f.endswith(".parquet"))
        return pq.read_table(os.path.join(d, files[p]))

    def read_all(self, iteration: int) -> pa.Table:
        d = self.part_dir(iteration)
        files = sorted(f for f in os.listdir(d) if f.endswith(".parquet"))
        return pa.concat_tables([pq.read_table(os.path.join(d, f)) for f in files])
