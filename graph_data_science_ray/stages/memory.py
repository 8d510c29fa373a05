"""Worker-memory hygiene for allocation-heavy batch stages.

Round-5 root-cause finding (NOTES_r05 §14): this sandbox VM's intermittent
"burst" pathology is CONCURRENT FIRST-TOUCH PROVISIONING of new guest
memory.  Measured with a 32-process probe (each first-touching one fresh
100 MB numpy buffer):

    1 proc   0.03-1.2 s      8 procs  ~1.6 s      32 procs  16-47 s/task

while the SAME stores into already-faulted (warm) pages run at full speed
at any concurrency (0.125 s/task at 32 procs), and pure-CPU work scales
cleanly (0.4 s -> 0.8 s at 32 procs).  The host (kernel 6.18-fc, virtio_mem)
provisions never-touched guest pages through a slow, serialized path; pages
the guest has faulted before are cheap to reuse.

Engine response, in order of leverage:

1. **Keep worker pages warm.**  glibc releases every large (>128 KB)
   buffer back to the OS with ``munmap`` — so a persistent Ray worker
   re-faults its whole scratch space on every task.  Setting
   ``MALLOC_MMAP_MAX_=0`` (large allocations come from the brk heap) and
   ``MALLOC_TRIM_THRESHOLD_`` high (the heap is never trimmed) makes a
   worker's arena grow to its task high-water mark ONCE and stay
   host-backed for every later task.  ``configure_worker_memory()`` sets
   these in ``os.environ`` — call it BEFORE ``ray.init`` so raylet-spawned
   workers inherit them (bench.py and tests/conftest.py do).
2. **Allocate less per task** — pack narrow columns, reuse views, avoid
   intermediate copies (the wedge exchange packs (key, a) instead of
   (a, b, c) for exactly this reason).
3. **Measure it** — ``provisioning_probe()`` quantifies the host's
   concurrent-fault penalty so a scaling artifact can carry the host's
   state alongside the engine's numbers (bench.py --scaling records it).

On a healthy Linux host these env vars are a mild RSS-for-latency trade
(workers hold their peak arena); on this VM they are the difference
between warm-page reuse and a 10-100x provisioning storm per stage.
"""

from __future__ import annotations

import os

_MALLOC_ENV = {
    # large allocations from the (reusable, never-unmapped) brk heap
    "MALLOC_MMAP_MAX_": "0",
    # never trim the heap back to the OS (16 GiB threshold = effectively off)
    "MALLOC_TRIM_THRESHOLD_": "17179869184",
    # one arena per worker process is plenty (map_batches tasks are
    # single-threaded); fewer arenas = better page reuse
    "MALLOC_ARENA_MAX": "2",
}


def configure_worker_memory(env: dict | None = None) -> dict:
    """Set glibc malloc tuning in ``os.environ`` so Ray workers spawned
    after this call keep their scratch pages warm across tasks.  Must run
    BEFORE ``ray.init`` (worker processes inherit the driver/raylet
    environment in local mode).  Returns the vars it set.  No-op for any
    var the user already set explicitly."""
    target = os.environ if env is None else env
    applied = {}
    for k, v in _MALLOC_ENV.items():
        if k not in target:
            target[k] = v
            applied[k] = v
    return applied


def provisioning_probe(nprocs: int = 32, mb_per_proc: int = 50,
                       timeout_sec: float = 120.0) -> float:
    """Host-state probe: seconds for ``nprocs`` forked processes to each
    first-touch one fresh ``mb_per_proc``-MB buffer, run to completion.
    Sub-second on a healthy host at 32 procs; tens of seconds inside this
    VM's provisioning storms.  Complements the single-process _vm_canary:
    the single-process canary can read healthy while the CONCURRENT path is
    degraded (it's the concurrency that triggers the slow path).  Returns
    ``timeout_sec`` if the probe doesn't finish in time (storm so bad the
    probe itself would stall the caller)."""
    import multiprocessing as mp
    import time

    t0 = time.perf_counter()
    ctx = mp.get_context("fork")
    with ctx.Pool(nprocs) as p:
        res = p.map_async(_probe_touch, [mb_per_proc] * nprocs)
        try:
            res.get(timeout=timeout_sec)
        except mp.TimeoutError:
            p.terminate()
            return float(timeout_sec)
    return round(time.perf_counter() - t0, 3)


def _probe_touch(mb: int) -> float:
    import numpy as np
    a = np.empty(mb * 131_072)  # 1 MB = 131072 float64
    a[:] = 1.0
    return float(a[0])


def cpu_scaling_control(levels=(8, 32)) -> dict:
    """Host-ceiling control: throughput efficiency of a PURE-CPU workload (no
    fresh memory, no object store) between the two concurrency levels — the
    best 4x-parallelism efficiency ANY workload can reach on this host at
    measurement time.  Virtualized hosts with CPU steal/overcommit cap this
    well below 1.0 regardless of engine design; recording it alongside the
    suite efficiency separates the host ceiling from engine overhead."""
    import multiprocessing as mp
    import time

    ctx = mp.get_context("fork")
    out = {}
    for n in levels:
        with ctx.Pool(n) as p:
            t0 = time.perf_counter()
            p.map(_burn_cpu, range(n))
            wall = time.perf_counter() - t0
        out[str(n)] = {"wall_sec": round(wall, 3),
                       "tasks_per_sec": round(n / wall, 2)}
    lo, hi = (str(levels[0]), str(levels[-1]))
    ratio = out[hi]["tasks_per_sec"] / out[lo]["tasks_per_sec"]
    out["efficiency"] = round(ratio / (levels[-1] / levels[0]), 3)
    return out


def _burn_cpu(_):
    x = 0
    for i in range(20_000_000):
        x += i
    return x
