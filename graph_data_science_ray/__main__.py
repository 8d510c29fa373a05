"""Job entrypoint — the ``ray job submit`` surface of the engine.

Usage (on a cluster, via the Ray job API; locally it just runs):

    ray job submit --working-dir . -- \\
        python -m graph_data_science_ray run \\
            --algo pagerank --graph /data/graphs/corpus \\
            --out /data/results/pr.parquet \\
            --checkpoint-dir /data/ckpt/pr --resume \\
            --tolerance 1e-6 --max-iterations 50

    python -m graph_data_science_ray build \\
        --corpus /data/corpus --out /data/graphs/corpus

The process owns its Ray session (``ray.init(address="local")`` here; on a real
cluster the job driver connects to the cluster it was submitted to via
RAY_ADDRESS).  Checkpoint + resume make a resubmitted job continue from the last
complete iteration (state/checkpoint.py lineage).
"""

from __future__ import annotations

import argparse
import json
import sys


def _build_parser():
    p = argparse.ArgumentParser(prog="graph_data_science_ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build", help="corpus parquet -> canonical graph")
    b.add_argument("--corpus", required=True)
    b.add_argument("--out", required=True)
    b.add_argument("--num-partitions", type=int, default=8)

    r = sub.add_parser("run", help="run an algorithm on a saved graph")
    r.add_argument("--algo", required=True,
                   choices=["pagerank", "articlerank", "eigenvector", "wcc",
                            "labelpropagation", "trianglecount", "louvain",
                            "sssp", "hits", "delta_stepping", "sllpa"])
    r.add_argument("--graph", required=True, help="canonical graph dir (Graph.save)")
    r.add_argument("--out", required=True, help="result parquet path")
    r.add_argument("--mode", default="write", choices=["write", "stats"])
    r.add_argument("--checkpoint-dir")
    r.add_argument("--resume", action="store_true")
    r.add_argument("--execution", default="auto")
    r.add_argument("--num-partitions", type=int)
    r.add_argument("--max-iterations", type=int)
    r.add_argument("--tolerance", type=float)
    r.add_argument("--damping", type=float)
    r.add_argument("--weighted", action="store_true")
    r.add_argument("--hits-iterations", type=int, help="hits only")
    r.add_argument("--source", type=int, help="sssp / delta_stepping source vid")
    r.add_argument("--delta", type=float, help="delta_stepping bucket width")
    r.add_argument("--seed", type=int, help="sllpa random seed")
    r.add_argument("--min-association-strength", type=float, help="sllpa prune")
    return p


def main(argv=None) -> dict:
    args = _build_parser().parse_args(argv)
    import ray
    owns_session = not ray.is_initialized()
    if owns_session:
        ray.init(address="local", include_dashboard=False, logging_level="ERROR")
    try:
        if args.cmd == "build":
            from .pipelines.graph_build import build_graph_from_corpus
            g = build_graph_from_corpus(args.corpus, save_dir=args.out,
                                        num_partitions=args.num_partitions)
            out = {"graph": args.out, "nodes": g.n, "edges": g.num_edges}
        else:
            from .pipelines.modes import run
            from .state.graph import Graph
            g = Graph.load(args.graph)
            config = {}
            for k in ("max_iterations", "tolerance", "damping", "weighted",
                      "hits_iterations", "source", "delta", "seed",
                      "min_association_strength"):
                v = getattr(args, k)
                if v is not None and v is not False:  # NOT `in (None, False)`
                    config[k] = v  # — 0 == False would drop --source 0
            if args.execution != "auto":
                config["execution"] = args.execution
            if args.num_partitions:
                config["num_partitions"] = args.num_partitions
            if args.checkpoint_dir:
                config["checkpoint_dir"] = args.checkpoint_dir
                config["resume"] = args.resume
            if args.mode == "stats":
                out = run(args.algo, g, mode="stats", **config)
            else:
                out = run(args.algo, g, mode="write", write_path=args.out, **config)
        print(json.dumps(out))
        return out
    finally:
        if owns_session:
            ray.shutdown()


if __name__ == "__main__":
    main(sys.argv[1:])
