"""End-to-end training-corpus cleaning pipeline.

The five-stage composition a 100 TB pre-training corpus runs before
tokenization, each stage one of the engine's public operators:

  1. quality gate        — length filter (compose with repetition_filter /
                           quality scores upstream as needed); streaming.
  2. fuzzy cluster dedup — banded MinHash-LSH verified pairs → connected
                           components (WCC over just the pair members) →
                           min-id representative; the corpus side joins the
                           keeper set through the partitioned hash join.
  3. stratified mixture  — per-language md5-cut sampling (deterministic,
                           layout-independent).
  4. context chunking    — fixed token windows with overlap; rows fan out,
                           never shuffle.
  5. shard + shuffle     — deterministic md5 global shuffle into P output
                           shards (compose with the resumable partitioned
                           sink to land one file per shard).

``pair_family="blake2b"`` is the production hash family (faster signatures);
``"md5"`` keeps every stage reproducible in ANSI SQL end-to-end — the driver
query `corpus_clean_pipeline` hash-checks THE WHOLE COMPOSITION against one
chained DuckDB oracle (recursive-CTE closure included).

Reference analogue: this is the data-pipeline counterpart of the reference's
multi-stage graph procedures (project → algorithm → write); there is no Java
counterpart to copy — the composition exists because the operators share the
deterministic md5 family and the known-partitioner exchange.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def clean_corpus(docs_ds, *, min_chars: int = 150,
                 mixture: dict | None = None, default_frac: float = 1.0,
                 chunk_tokens: int = 32, chunk_overlap: int = 8,
                 num_shards: int = 4, pair_family: str = "blake2b",
                 minhash_kwargs: dict | None = None,
                 mix_salt: str = "mix", shard_salt: str = "out"):
    """Run the 5-stage cleaner over a (doc_id, text, lang, n_chars) Dataset;
    returns the sharded chunk Dataset (doc_id, chunk_id, n_chunk_tokens,
    chunk_text, shard, pos)."""
    from ..functions.dedup import (cluster_dedup, minhash_md5_near_dups,
                                   minhash_near_dups)
    from ..functions.joins import hash_join
    from ..functions.sampling import shard_shuffle, stratified_sample
    from ..functions.text import chunk_documents

    def _gate(t: pa.Table) -> pa.Table:
        return t.filter(pc.greater_equal(t.column("n_chars"), min_chars)) \
            .drop_columns(["n_chars"])

    gated = docs_ds.map_batches(_gate, batch_format="pyarrow")

    mk = dict(minhash_kwargs or {})
    pair_docs = gated.select_columns(["doc_id", "text"])
    if pair_family == "md5":
        pairs = minhash_md5_near_dups(
            pair_docs, **{"num_perms": 16, "num_bands": 4,
                          "threshold": 0.5, **mk})
    else:
        pairs = minhash_near_dups(
            pair_docs, **{"num_perms": 64, "num_bands": 16,
                          "threshold": 0.5, **mk})
    assign = cluster_dedup(gated.select_columns(["doc_id"]), pairs)

    def _keepers(t: pa.Table) -> pa.Table:
        return t.filter(t.column("kept")).select(["doc_id"])

    keepers = assign.map_batches(_keepers, batch_format="pyarrow")
    kept = hash_join(
        gated, keepers, "doc_id", num_buckets=16,
        left_schema=pa.schema([("doc_id", pa.int64()), ("text", pa.string()),
                               ("lang", pa.string())]),
        right_schema=pa.schema([("doc_id", pa.int64())]))

    samp = kept if mixture is None else stratified_sample(
        kept, "doc_id", "lang", mixture, default=default_frac, salt=mix_salt)
    chunks = chunk_documents(samp.select_columns(["doc_id", "text"]),
                             chunk_tokens, overlap=chunk_overlap)

    def _skey(t: pa.Table) -> pa.Table:
        sk = t.column("doc_id").to_numpy(zero_copy_only=False) * 1_000_000 + \
            t.column("chunk_id").to_numpy(zero_copy_only=False)
        return t.drop_columns(["start_tok"]).append_column(
            "skey", pa.array(sk.astype(np.int64)))

    sharded = shard_shuffle(chunks.map_batches(_skey, batch_format="pyarrow"),
                            "skey", num_shards, salt=shard_salt)
    return sharded.map_batches(lambda t: t.drop_columns(["skey"]),
                               batch_format="pyarrow")
