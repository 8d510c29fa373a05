"""Multi-source BFS over raw message queues — the public face of the queue
messengers (``reducer=None``).

Reference semantics: Pregel's QUEUE message mode keeps every delivered payload
(`pregel/src/main/java/org/neo4j/gds/beta/pregel/SyncQueueMessenger.java` —
double-buffered, messages visible NEXT superstep) and its async sibling
(`AsyncQueueMessenger.java` — one shared pool, messages scattered earlier in
the same superstep are visible to later-processed vertices).  Here the min
over the queue is taken in user code, so the SAME computation runs under both
messengers and must converge to identical distances; the async sweep merely
converges in far fewer supersteps on sweep-aligned topologies (a vid-ascending
chain collapses to ~2 sweeps instead of one superstep per hop).
"""

from __future__ import annotations

import numpy as np

from .pregel import Computation, run_pregel


class MultiSourceQueueBfs(Computation):
    """Unweighted BFS hop distances from a source set (inf = unreached)."""

    reducer = None
    state_spec = [("dist", np.float64)]
    output_cols = {"distance": "dist"}

    def __init__(self, sources, asynchronous: bool = False):
        self.sources = np.asarray(sources, dtype=np.int64)
        self.asynchronous = asynchronous

    def init_part(self, vids, shard, st):
        is_src = np.isin(vids, self.sources)
        st["dist"][:] = np.where(is_src, 0.0, np.inf)
        st["sending"][:] = is_src.astype(np.uint8)
        st["send"][:] = 0.0

    def apply_part(self, vids, st, msg, superstep, shard):
        best = np.full(vids.shape[0], np.inf)
        if msg.local.shape[0]:
            np.minimum.at(best, msg.local, msg.vals)
        cand = best + 1.0
        better = cand < st["dist"]
        st["dist"][:] = np.where(better, cand, st["dist"])
        st["sending"][:] = better.astype(np.uint8)
        st["send"][:] = np.where(better, st["dist"], 0.0)
        st["changed"][:] = better.astype(np.uint8)


def queue_bfs(graph, sources, *, asynchronous: bool = False,
              execution: str = "local", num_partitions: int = 8,
              max_iterations: int = 100_000):
    """Run queue-mode BFS; ``asynchronous=True`` uses the shared-pool
    messenger (shared-memory only, like the reference)."""
    return run_pregel(graph, MultiSourceQueueBfs(sources, asynchronous),
                      max_iterations=max_iterations, execution=execution,
                      num_partitions=num_partitions)
