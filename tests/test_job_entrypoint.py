"""The ray-job-submit entrypoint: build a graph, run an algo with checkpoints,
kill-free resume path (in-process main(); the session fixture owns Ray)."""

import json

import numpy as np
import pytest
import pyarrow.parquet as pq

from graph_data_science_ray.__main__ import main
from graph_data_science_ray.sources.corpus import generate_corpus


def test_build_then_run_with_resume(tmp_path):
    corpus = tmp_path / "corpus"
    generate_corpus(str(corpus), num_repos=40, files_per_repo=4, seed=42)
    out = main(["build", "--corpus", str(corpus), "--out", str(tmp_path / "g")])
    assert out["nodes"] > 0 and out["edges"] > 0

    res = main(["run", "--algo", "pagerank", "--graph", str(tmp_path / "g"),
                "--out", str(tmp_path / "pr.parquet"),
                "--checkpoint-dir", str(tmp_path / "ck"),
                "--tolerance", "0", "--max-iterations", "4", "--weighted"])
    assert res["rowsWritten"] == out["nodes"]

    # resubmission resumes from the checkpoint and continues to 8 iterations
    res2 = main(["run", "--algo", "pagerank", "--graph", str(tmp_path / "g"),
                 "--out", str(tmp_path / "pr2.parquet"),
                 "--checkpoint-dir", str(tmp_path / "ck"), "--resume",
                 "--tolerance", "0", "--max-iterations", "8", "--weighted"])
    full = main(["run", "--algo", "pagerank", "--graph", str(tmp_path / "g"),
                 "--out", str(tmp_path / "pr_full.parquet"),
                 "--tolerance", "0", "--max-iterations", "8", "--weighted"])
    a = pq.read_table(tmp_path / "pr2.parquet").column("score").to_numpy()
    b = pq.read_table(tmp_path / "pr_full.parquet").column("score").to_numpy()
    np.testing.assert_allclose(a, b, atol=1e-9)


def test_stats_mode(tmp_path):
    corpus = tmp_path / "corpus"
    generate_corpus(str(corpus), num_repos=30, files_per_repo=3, seed=1)
    main(["build", "--corpus", str(corpus), "--out", str(tmp_path / "g")])
    s = main(["run", "--algo", "wcc", "--graph", str(tmp_path / "g"),
              "--out", "unused", "--mode", "stats"])
    assert "communityCount" in s


def test_public_surface_exports_resolve():
    """Every name in __all__ must be importable from the package root — the
    public surface a reference user switches to (graph algorithms AND the
    training-data pipeline operators)."""
    import graph_data_science_ray as g
    missing = [n for n in g.__all__ if not hasattr(g, n)]
    assert missing == []
    for n in ("exact_dedup", "minhash_near_dups", "ivf_topk", "cosine_topk",
              "tumbling_window", "LanguageId"):
        assert n in g.__all__


def test_driver_contract_key_consistency():
    """Every oracle_sql() key must have a queries() entry (an orphaned
    oracle is dead weight the driver would never run), and both maps must be
    non-trivially sized after each round's additions."""
    import sys
    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as e
    qs = set(e.queries().keys())
    sqls = set(e.oracle_sql().keys())
    assert sqls <= qs, sorted(sqls - qs)
    assert len(qs) >= 105
    assert len(sqls) >= 96


def test_cli_new_algos(tmp_path):
    """hits / delta_stepping / sssp through the ray-job CLI surface."""
    import pyarrow.parquet as pq
    from graph_data_science_ray.__main__ import main
    from graph_data_science_ray.sources.corpus import generate_corpus
    corpus = tmp_path / "c"
    generate_corpus(str(corpus), num_repos=25, files_per_repo=3, seed=2)
    main(["build", "--corpus", str(corpus), "--out", str(tmp_path / "g")])
    out = main(["run", "--algo", "hits", "--graph", str(tmp_path / "g"),
                "--out", str(tmp_path / "hits.parquet"),
                "--hits-iterations", "5"])
    t = pq.read_table(str(tmp_path / "hits.parquet"))
    assert {"vid", "auth", "hub"} <= set(t.column_names)
    assert out["rowsWritten"] == t.num_rows > 0
    out = main(["run", "--algo", "delta_stepping",
                "--graph", str(tmp_path / "g"),
                "--out", str(tmp_path / "ds.parquet"),
                "--source", "0", "--delta", "2.0"])
    t = pq.read_table(str(tmp_path / "ds.parquet"))
    assert {"vid", "distance"} <= set(t.column_names)
    out = main(["run", "--algo", "sllpa", "--graph", str(tmp_path / "g"),
                "--out", str(tmp_path / "sllpa.parquet"),
                "--max-iterations", "6", "--seed", "7",
                "--min-association-strength", "0.1"])
    t = pq.read_table(str(tmp_path / "sllpa.parquet"))
    assert {"vid", "community_ids"} <= set(t.column_names)
    assert out["rowsWritten"] == t.num_rows > 0


def test_data_pipeline_subcommand(tmp_path):
    import pandas as pd
    import pyarrow as pa

    # 30 docs: 5 exact-dup pairs, one PII doc, diverse enough n-grams to
    # pass the Gopher repetition thresholds (every word distinct per doc)
    base = [" ".join(f"word{i}x{j}" for j in range(40)) for i in range(25)]
    base[3] = base[3] + " contact me at someone@example.com please"
    texts = base + base[:5]  # 5 duplicate texts (higher doc_id loses)
    df = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    src = tmp_path / "docs.parquet"
    pa.parquet.write_table(pa.Table.from_pandas(df, preserve_index=False),
                           str(src))

    out_dir = tmp_path / "clean"
    res = main(["data", "--input", str(src), "--out", str(out_dir),
                "--ops", "dedup,repetition,redact", "--num-partitions", "4"])
    assert res["parts"] == 4 and res["skipped_parts"] == 0
    assert res["rows"] == 25  # the 5 dup copies are gone
    back = pq.read_table(str(out_dir)).to_pandas()
    assert sorted(back.doc_id.tolist()) == list(range(25))
    assert "@" not in " ".join(back.text)  # PII scrubbed
    # resubmission skips every finished partition
    res2 = main(["data", "--input", str(src), "--out", str(out_dir),
                 "--ops", "dedup,repetition,redact", "--num-partitions", "4"])
    assert res2["skipped_parts"] == 4


def test_data_pipeline_chunk_and_sample(tmp_path):
    import pandas as pd
    import pyarrow as pa

    df = pd.DataFrame({"doc_id": range(20),
                       "text": [" ".join(f"w{j}" for j in range(10))] * 20})
    src = tmp_path / "d.parquet"
    pa.parquet.write_table(pa.Table.from_pandas(df, preserve_index=False),
                           str(src))
    res = main(["data", "--input", str(src), "--out",
                str(tmp_path / "chunks"), "--ops", "chunk:4:1",
                "--num-partitions", "2"])
    # 10 tokens, stride 3 -> starts 0,3,6,9 = 4 chunks per doc
    assert res["rows"] == 80
    back = pq.read_table(str(tmp_path / "chunks")).to_pandas()
    assert set(back.columns) >= {"doc_id", "chunk_id", "chunk_text"}


def test_data_pipeline_shuffle_sharding(tmp_path):
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    df = pd.DataFrame({"doc_id": range(40),
                       "text": [" ".join(f"w{i}x{j}" for j in range(12))
                                for i in range(40)]})
    src = tmp_path / "d.parquet"
    pa.parquet.write_table(pa.Table.from_pandas(df, preserve_index=False),
                           str(src))
    out = tmp_path / "sharded"
    res = main(["data", "--input", str(src), "--out", str(out),
                "--ops", "chunk:8:2,shuffle:4"])
    assert res["parts"] == 4
    back = pq.read_table(str(out)).to_pandas()
    assert res["rows"] == len(back)
    # each output part IS one shard (range layout), pos dense per shard
    for s, g in back.groupby("shard"):
        assert sorted(g.pos.tolist()) == list(range(len(g)))
    # deterministic: re-run into a second dir yields identical layout
    out2 = tmp_path / "sharded2"
    main(["data", "--input", str(src), "--out", str(out2),
          "--ops", "chunk:8:2,shuffle:4"])
    b2 = pq.read_table(str(out2)).to_pandas()
    cols = sorted(back.columns)
    assert back[cols].sort_values(cols).reset_index(drop=True).equals(
        b2[cols].sort_values(cols).reset_index(drop=True))


def test_data_pipeline_op_validation(tmp_path):
    import pandas as pd
    import pyarrow as pa
    import pytest

    df = pd.DataFrame({"doc_id": [0], "text": ["hello world"]})
    src = tmp_path / "one.parquet"
    pa.parquet.write_table(pa.Table.from_pandas(df, preserve_index=False),
                           str(src))
    for bad in ["chunk", "sample:abc", "shuffle:2,sample:0.5", "bogus"]:
        with pytest.raises(SystemExit):
            main(["data", "--input", str(src), "--out",
                  str(tmp_path / "x"), "--ops", bad])


def test_data_pipeline_substring_gate(tmp_path):
    import pandas as pd
    import pyarrow as pa

    # 12 clean docs with fully distinct vocab + 4 docs built from one shared
    # template (every 4-token window duplicated corpus-wide) + 1 empty doc
    clean = [" ".join(f"u{i}w{j}" for j in range(30)) for i in range(12)]
    tmpl = " ".join(f"shared{j}" for j in range(30))
    texts = clean + [tmpl] * 4 + [""]
    df = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    src = tmp_path / "docs.parquet"
    pa.parquet.write_table(pa.Table.from_pandas(df, preserve_index=False),
                           str(src))

    out_dir = tmp_path / "gated"
    res = main(["data", "--input", str(src), "--out", str(out_dir),
                "--ops", "substring:0.5:4:2", "--num-partitions", "3"])
    back = pq.read_table(str(out_dir)).to_pandas()
    # template docs (dup_fraction 1.0) and the empty doc are gone
    assert sorted(back.doc_id.tolist()) == list(range(12))
    assert res["rows"] == 12

    with pytest.raises(SystemExit, match="malformed"):
        main(["data", "--input", str(src), "--out", str(out_dir),
              "--ops", "substring:notafloat"])
