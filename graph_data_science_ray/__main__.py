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

    d = sub.add_parser(
        "data", help="documents parquet -> training-data pipeline -> "
                     "resumable partitioned parquet")
    d.add_argument("--input", required=True,
                   help="documents parquet (doc_id, text)")
    d.add_argument("--out", required=True, help="output partition directory")
    d.add_argument("--ops", default="dedup,repetition,redact",
                   help="comma-ORDERED stages: sample:<frac> | dedup | "
                        "substring:<max_frac>[:<k>[:<stride>]] (drop docs "
                        "whose corpus-wide duplicated-window fraction "
                        "exceeds max_frac; empty docs drop too) | "
                        "repetition | redact | chunk:<max>[:<overlap>] | "
                        "shuffle:<shards> (deterministic global shuffle; "
                        "must be last — output parts become the shards)")
    d.add_argument("--num-partitions", type=int, default=16)
    return p


def _run_data_pipeline(args) -> dict:
    """Compose the requested training-data stages left-to-right over the
    (doc_id, text) projection and land them in the resumable sink — a failed
    job resubmitted with the same args skips finished output partitions."""
    from .sources.io import read_parquet_clean
    from .sources.sink import write_partitioned_parquet

    import pyarrow as pa

    ds = read_parquet_clean(args.input, columns=["doc_id", "text"])
    doc_schema = pa.schema([("doc_id", pa.int64()), ("text", pa.string())])
    applied = []
    shuffle_shards = None
    chunked = False  # chunk changes the schema; later joins can't assume it
    for op in args.ops.split(","):
        op = op.strip()
        if not op:
            continue
        if shuffle_shards is not None:
            raise SystemExit(f"data op {op!r} after shuffle: shuffle assigns "
                             "the final (shard, pos) layout and must be last")
        name, *params = op.split(":")
        try:
            if name == "sample":
                float(params[0])
            elif name == "chunk":
                int(params[0])
                if len(params) > 1:
                    int(params[1])
            elif name == "shuffle":
                int(params[0])
            elif name == "substring":
                float(params[0])
                if len(params) > 1:
                    int(params[1])
                if len(params) > 2:
                    int(params[2])
        except (IndexError, ValueError):
            raise SystemExit(f"malformed data op {op!r}: expected "
                             "sample:<frac> | "
                             "substring:<max_frac>[:<k>[:<stride>]] | "
                             "chunk:<max>[:<overlap>] | shuffle:<shards>")
        if name == "sample":
            from .functions.sampling import hash_sample
            ds = hash_sample(ds, "doc_id", float(params[0]))
        elif name == "dedup":
            from .functions.dedup import exact_dedup
            from .functions.joins import hash_join
            winners = exact_dedup(ds).select_columns(["doc_id"])
            ds = hash_join(ds, winners, "doc_id",
                           left_schema=None if chunked else doc_schema,
                           right_schema=pa.schema([("doc_id", pa.int64())]))
        elif name == "substring":
            # ExactSubstr contamination gate: keep docs whose corpus-wide
            # duplicated-window fraction is <= max_frac (stats stay
            # distributed; the keeper-id side of the join is doc ids only)
            from .functions.dedup import substring_dup_stats
            from .functions.joins import hash_join
            max_frac = float(params[0])
            kk = int(params[1]) if len(params) > 1 else 16
            st = int(params[2]) if len(params) > 2 else 8
            stats = substring_dup_stats(ds, k=kk, stride=st)

            def _keep(t: pa.Table) -> pa.Table:
                f = t.column("dup_fraction")
                return t.filter(pa.compute.less_equal(
                    f, pa.scalar(max_frac))).select(["doc_id"])

            keepers = stats.map_batches(_keep, batch_format="pyarrow")
            ds = hash_join(ds, keepers, "doc_id",
                           left_schema=None if chunked else doc_schema,
                           right_schema=pa.schema([("doc_id", pa.int64())]))
        elif name == "repetition":
            from .functions.text import repetition_filter
            ds = repetition_filter(ds)
        elif name == "redact":
            from .functions.text import redact_pii
            ds = redact_pii(ds)
        elif name == "chunk":
            from .functions.text import chunk_documents
            mx = int(params[0])
            ov = int(params[1]) if len(params) > 1 else 0
            ds = chunk_documents(ds, mx, overlap=ov)
            chunked = True
        elif name == "shuffle":
            import numpy as np

            from .functions.sampling import shard_shuffle
            nsh = int(params[0])

            def _k(t: pa.Table) -> pa.Table:
                ids = t.column("doc_id").to_numpy(zero_copy_only=False)
                cid = (t.column("chunk_id").to_numpy(zero_copy_only=False)
                       if "chunk_id" in t.column_names
                       else np.zeros(len(ids), dtype=np.int64))
                return t.append_column(
                    "skey", pa.array((ids * 1_000_000 + cid).astype(np.int64)))

            ds = shard_shuffle(ds.map_batches(_k, batch_format="pyarrow"),
                               "skey", nsh, salt="cli")
            shuffle_shards = nsh
        else:
            raise SystemExit(f"unknown data op {name!r}")
        applied.append(op)
    if shuffle_shards is not None:
        # rows already carry their shard: range-partition on the shard id so
        # part NNNNN IS shard NNNNN (pruning-friendly, resumable)
        import numpy as np
        man = write_partitioned_parquet(
            ds, args.out, "shard",
            bounds=np.arange(shuffle_shards + 1, dtype=np.int64))
    else:
        man = write_partitioned_parquet(ds, args.out, "doc_id",
                                        P=args.num_partitions)
    return {"out": args.out, "ops": applied, "parts": man.num_rows,
            "rows": int(sum(man.column("rows").to_pylist())),
            "skipped_parts": int(sum(man.column("skipped").to_pylist()))}


def main(argv=None) -> dict:
    args = _build_parser().parse_args(argv)
    import ray
    owns_session = not ray.is_initialized()
    if owns_session:
        ray.init(address="local", include_dashboard=False, logging_level="ERROR")
    try:
        if args.cmd == "data":
            out = _run_data_pipeline(args)
        elif args.cmd == "build":
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
