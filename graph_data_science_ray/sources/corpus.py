"""Deterministic synthetic source-code corpus (the engine's input table).

Schema per BASELINE.json input_hint:

    corpus(repo: string, path: string, commit: string, lang: string, content: string)

Contents embed deterministic ``import <repo>`` dependency tokens so that edge
extraction (pipelines/graph_build.py) is a pure function of the row.  Generation is
a seeded Ray Data pipeline (``ray.data.range -> map_batches``), so the corpus can be
produced at any scale without external data; the per-row invariant carried through
the engine is ``sha256(content)`` equality (north-rule requirement).

The repo→repo dependency structure follows a power-law-ish preferential mix (a
deterministic analogue of the reference's POWER_LAW RandomGraphGenerator,
core/src/main/java/org/neo4j/gds/beta/generator/RandomGraphGenerator.java:57+,
RelationshipDistribution.java:35-59) so hub skew is present by construction.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

_LANGS = np.array(["py", "java", "go", "rs", "js"])
_EXT = {"py": "py", "java": "java", "go": "go", "rs": "rs", "js": "js"}


def _repo_name(i: int) -> str:
    return f"org{i % 97:02d}/repo{i:06d}"


def gen_corpus_batch(file_ids: np.ndarray, num_repos: int, files_per_repo: int,
                     seed: int = 42) -> pa.Table:
    """Pure, deterministic batch generator: file id -> corpus row."""
    rows_repo, rows_path, rows_commit, rows_lang, rows_content = [], [], [], [], []
    for fid in file_ids:
        fid = int(fid)
        rng = np.random.default_rng(seed * 1_000_003 + fid)
        repo_i = fid // files_per_repo
        repo = _repo_name(repo_i)
        lang = _LANGS[rng.integers(0, len(_LANGS))]
        path = f"src/module_{fid % files_per_repo}.{_EXT[lang]}"
        commit = hashlib.sha1(f"{seed}:{fid}".encode()).hexdigest()[:12]
        # dependencies: power-law-ish target choice — mix of uniform and rank-biased
        n_deps = int(rng.integers(0, 6))
        deps = []
        for _ in range(n_deps):
            if rng.random() < 0.5:
                # preferential: low repo ids are hubs (zipf-like via pareto)
                t = int(min(num_repos - 1, rng.pareto(1.1)))
            else:
                t = int(rng.integers(0, num_repos))
            if t != repo_i:
                deps.append(_repo_name(t))
        body = [f"// {repo} {path} @ {commit}"]
        body += [f"import {d}" for d in deps]
        body += [f"fn work_{i}() {{ return {int(rng.integers(0, 1 << 30))}; }}"
                 for i in range(int(rng.integers(1, 4)))]
        rows_repo.append(repo)
        rows_path.append(path)
        rows_commit.append(commit)
        rows_lang.append(str(lang))
        rows_content.append("\n".join(body))
    return pa.table({"repo": rows_repo, "path": rows_path, "commit": rows_commit,
                     "lang": rows_lang, "content": rows_content})


def generate_corpus(out_dir: str, *, num_repos: int = 500, files_per_repo: int = 20,
                    seed: int = 42, use_ray: bool = True) -> str:
    """Write the corpus as partitioned Parquet (one file per block — resumable layout)."""
    n_files = num_repos * files_per_repo

    def _batch(batch: pa.Table) -> pa.Table:
        ids = batch.column("id").to_numpy(zero_copy_only=False)
        return gen_corpus_batch(ids, num_repos, files_per_repo, seed)

    if use_ray:
        import ray.data
        ds = ray.data.range(n_files)
        ds = ds.map_batches(_batch, batch_format="pyarrow", batch_size=4096)
        ds.write_parquet(out_dir)
    else:
        import os
        import pyarrow.parquet as pq
        os.makedirs(out_dir, exist_ok=True)
        step = 4096
        for i, a in enumerate(range(0, n_files, step)):
            t = gen_corpus_batch(np.arange(a, min(a + step, n_files)),
                                 num_repos, files_per_repo, seed)
            pq.write_table(t, os.path.join(out_dir, f"part-{i:05d}.parquet"))
    return out_dir
