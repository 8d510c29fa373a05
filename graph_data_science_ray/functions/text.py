"""Text-analysis operators for document corpora (training-data pipeline stages).

These are the per-record transforms a 100 TB text pipeline needs: token counting,
quality features, language id, fingerprinting.  Every operator is a vectorized
``map_batches`` stage over the ``documents`` table; stateful pieces (compiled
regexes, stopword tables) live in callable-class ``__init__`` (once per actor).
Where an operator has an exact ANSI-SQL equivalent the semantics are kept
DuckDB-matchable (see __ray_entry__.oracle_sql)."""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pyarrow as pa

# tiny per-language stopword tables for the n-gram/stopword language heuristic
_STOPWORDS = {
    "en": {"the", "and", "of", "a", "to", "in", "is", "it", "that", "for"},
    "de": {"der", "die", "das", "und", "ist", "ein", "zu", "mit", "von", "nicht"},
    "fr": {"le", "la", "les", "et", "est", "un", "une", "de", "pour", "dans"},
    "es": {"el", "la", "los", "y", "es", "un", "una", "de", "por", "para"},
}


class TokenCounter:
    """n_tokens = len(split(trim(text), r'\\s+')) — matches DuckDB
    ``len(regexp_split_to_array(trim(text), '\\s+'))`` exactly (empty text → 1)."""

    def __init__(self):
        self.ws = re.compile(r"\s+")
        self.__name__ = "token_count"

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        n = np.fromiter((len(self.ws.split(t.strip())) for t in texts),
                        dtype=np.int64, count=len(texts))
        return pa.table({"doc_id": batch.column("doc_id"), "n_tokens": n})


class TextStats:
    """Quality features with exact SQL equivalents: n_chars, punctuation count,
    digit count (used by quality filters at corpus scale)."""

    def __init__(self):
        self.punct = re.compile(r"[^.!?,;]")
        self.digit = re.compile(r"[^0-9]")
        self.__name__ = "text_stats"

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        n_chars = np.fromiter((len(t) for t in texts), dtype=np.int64, count=len(texts))
        n_punct = np.fromiter((len(self.punct.sub("", t)) for t in texts),
                              dtype=np.int64, count=len(texts))
        n_digit = np.fromiter((len(self.digit.sub("", t)) for t in texts),
                              dtype=np.int64, count=len(texts))
        return pa.table({"doc_id": batch.column("doc_id"), "n_chars": n_chars,
                         "n_punct": n_punct, "n_digits": n_digit})


class QualityScorer:
    """Heuristic quality score: mean token length, stopword ratio, alpha ratio.
    Composite score in [0,1].  Every arithmetic step is IEEE-deterministic and
    left-associated, and the 6dp rounding is SQL half-away (compat.py), so the
    score is bit-equal to the ANSI-SQL formulation in the oracle query."""

    def __init__(self):
        self.word = re.compile(r"[A-Za-z]+")
        self.stop = _STOPWORDS["en"]
        self.__name__ = "quality_score"

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        nrows = len(texts)
        stop_ratio = np.zeros(nrows)
        mean_len = np.zeros(nrows)
        alpha = np.zeros(nrows)
        for i, t in enumerate(texts):
            ws = self.word.findall(t.lower())
            if ws:
                stop_ratio[i] = sum(w in self.stop for w in ws) / len(ws)
                lens = np.fromiter(map(len, ws), dtype=np.int64, count=len(ws))
                mean_len[i] = lens.mean()
                alpha[i] = lens.sum() / max(len(t), 1)
        score = (0.4 * alpha
                 + 0.3 * np.clip(1 - np.abs(mean_len - 5) / 10, 0, 1)
                 + 0.3 * np.clip(stop_ratio * 4, 0, 1))
        from .compat import round_half_away
        return pa.table({"doc_id": batch.column("doc_id"),
                         "quality_score": round_half_away(score, 6)})


class LanguageId:
    """Stopword-vote language heuristic (en/de/fr/es, 'und' = undetermined).
    Stateful stage: the stopword tables are built once per actor."""

    def __init__(self):
        self.word = re.compile(r"[a-zA-Z]+")
        self.tables = {lang: frozenset(ws) for lang, ws in _STOPWORDS.items()}
        self.__name__ = "lang_id"

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        langs = []
        for t in texts:
            ws = self.word.findall(t.lower())
            votes = {lang: sum(w in tbl for w in ws) for lang, tbl in self.tables.items()}
            best = max(votes, key=lambda k: (votes[k], -ord(k[0])))
            langs.append(best if votes[best] > 0 else "und")
        return pa.table({"doc_id": batch.column("doc_id"),
                         "lang_pred": pa.array(langs)})


class Sha256:
    """Per-row ``sha256(text)`` hex digest — the north-rule per-row content
    conformance invariant, applied to an arbitrary document table (the corpus
    variant is pipelines/graph_build.compute_sha_table).  Exact SQL equivalent
    ``sha256(text)`` (DuckDB >= 0.10 lowercase hex)."""

    def __init__(self, text_col: str = "text", id_col: str = "doc_id"):
        self.text_col = text_col
        self.id_col = id_col
        self.__name__ = "sha256"

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.text_col).to_pylist()
        shas = [hashlib.sha256(t.encode()).hexdigest() for t in texts]
        return pa.table({self.id_col: batch.column(self.id_col),
                         "sha256": pa.array(shas)})


def vocab_top_terms(docs_ds, k: int = 100, *, text_col: str = "text",
                    num_buckets: int = 0):
    """Corpus vocabulary: the k most frequent space-separated lowercase terms
    with counts, ties broken by term ascending.  Exact SQL equivalent:
    ``unnest(string_split(lower(text), ' '))`` group-count order by
    (count desc, term) limit k.

    Shape: per-batch partial term counts (Arrow ``utf8_lower`` +
    ``split_pattern`` + ``value_counts`` — all C kernels), a term-hash
    exchange of the PARTIALS (each term lives in exactly one partition, so
    per-partition top-k is globally correct), and a driver-side merge of
    only partitions × k rows."""
    import pyarrow.compute as pc

    def _partial(batch: pa.Table) -> pa.Table:
        toks = pc.list_flatten(
            pc.split_pattern(pc.utf8_lower(batch.column(text_col)), " "))
        toks = toks.filter(pc.not_equal(toks, ""))
        vc = pc.value_counts(toks.combine_chunks()
                             if isinstance(toks, pa.ChunkedArray) else toks)
        return pa.table({"term": vc.field("values"),
                         "cnt": vc.field("counts").cast(pa.int64())})

    partial = docs_ds.map_batches(_partial, batch_format="pyarrow")
    if num_buckets <= 0:
        from ..stages.bucketing import adaptive_bucket_count, rows_if_cheap
        num_buckets = adaptive_bucket_count(rows_if_cheap(docs_ds))

    from zlib import crc32

    def _tag(t: pa.Table) -> pa.Table:
        b = np.asarray([crc32(x.encode()) % num_buckets
                        for x in t.column("term").to_pylist()],
                       dtype=np.int64)
        return t.append_column("bucket", pa.array(b))

    empty = pa.table({"term": pa.array([], pa.string()),
                      "cnt": pa.array([], pa.int64())})

    def _combine(g: pa.Table) -> pa.Table:
        g = g.drop_columns(["bucket"])
        summed = g.group_by(["term"]).aggregate([("cnt", "sum")]) \
            .rename_columns(["term", "cnt"])
        order = pc.sort_indices(summed, sort_keys=[("cnt", "descending"),
                                                   ("term", "ascending")])
        return summed.take(order.slice(0, k))

    from ..stages.exchange import grouped_exchange
    from ..stages.blocks import nonempty_arrow_refs
    import ray

    out = grouped_exchange(partial, "bucket", num_buckets, _combine,
                           map_fn=_tag, empty_result=empty).materialize()
    refs, _ = nonempty_arrow_refs(out)
    tops = [t for t in ray.get(refs) if t.num_rows]
    merged = pa.concat_tables(tops) if tops else empty
    order = pc.sort_indices(merged, sort_keys=[("cnt", "descending"),
                                               ("term", "ascending")])
    return merged.take(order.slice(0, k))


class Fingerprint:
    """Document fingerprint: md5 of lower(trim(text)) — exact SQL equivalent
    ``md5(lower(trim(text)))``; used as the exact-dedup key."""

    def __init__(self):
        self.__name__ = "fingerprint"

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        fps = [hashlib.md5(t.strip().lower().encode()).hexdigest() for t in texts]
        return pa.table({"doc_id": batch.column("doc_id"), "fp": pa.array(fps)})


class RepetitionStats:
    """Gopher-style repetition quality signals (Rae et al. 2021, "Scaling
    Language Models: ... Gopher", Table A1) — the standard pre-training
    corpus filters for boilerplate/spam:

      * ``top2_char_frac`` / ``top3_char_frac`` — fraction of token
        characters covered by the most-covering 2-/3-gram (count × gram
        char length, spaces excluded, max over grams — the max-of-product
        form needs no tie-break).
      * ``dup5_char_frac`` — fraction of token characters inside word
        5-grams that occur more than once (counting every occurrence).
      * ``dup_line_frac`` — fraction of line characters inside duplicated
        lines; ``dup_line_cnt_frac`` — fraction of lines that are
        duplicates.

    Tokens are the non-empty ``lower(text).split(' ')`` terms (the same
    family as vocab_top_terms), lines are ``split('\\n')`` — both exactly
    SQL-expressible, so the whole operator is DuckDB-oracle-checkable
    (see __ray_entry__.oracle_sql()["repetition_stats"]).  Per-document
    dict work runs as a plain map_batches task stage (inherently
    per-document, like the other text kernels); nothing shuffles.
    """

    def __init__(self):
        self.__name__ = "repetition_stats"

    @staticmethod
    def _gram_stats(toks, n, dup):
        """max (dup=False) or duplicated-sum (dup=True) of cnt × charlen
        over word n-grams; charlen = sum of token lengths (no spaces)."""
        if len(toks) < n:
            return 0
        counts: dict = {}
        lens = [len(t) for t in toks]
        for i in range(len(toks) - n + 1):
            g = " ".join(toks[i:i + n])
            e = counts.get(g)
            if e is None:
                counts[g] = [1, sum(lens[i:i + n])]
            else:
                e[0] += 1
        if dup:
            return sum(c * l for c, l in counts.values() if c > 1)
        return max(c * l for c, l in counts.values())

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        n = len(texts)
        out = {k: np.zeros(n, dtype=np.float64)
               for k in ("top2_char_frac", "top3_char_frac", "dup5_char_frac",
                         "dup_line_frac", "dup_line_cnt_frac")}
        for i, text in enumerate(texts):
            toks = [w for w in text.lower().split(" ") if w]
            tot = sum(len(w) for w in toks)
            if tot:
                out["top2_char_frac"][i] = self._gram_stats(toks, 2, False) / tot
                out["top3_char_frac"][i] = self._gram_stats(toks, 3, False) / tot
                out["dup5_char_frac"][i] = self._gram_stats(toks, 5, True) / tot
            lines = text.split("\n")
            lcnt: dict = {}
            for l in lines:
                lcnt[l] = lcnt.get(l, 0) + 1
            lchars = sum(len(l) * c for l, c in lcnt.items())
            if lchars:
                out["dup_line_frac"][i] = sum(
                    len(l) * c for l, c in lcnt.items() if c > 1) / lchars
            out["dup_line_cnt_frac"][i] = sum(
                c for c in lcnt.values() if c > 1) / len(lines)
        cols = {"doc_id": batch.column("doc_id")}
        cols.update({k: pa.array(v) for k, v in out.items()})
        return pa.table(cols)


def repetition_filter(docs_ds, *, max_top2=0.20, max_top3=0.18,
                      max_dup5=0.15, max_dup_line=0.30):
    """Keep documents passing the Gopher repetition thresholds (defaults are
    the published cut-offs for top-2/3-gram and dup-line fractions; dup5
    uses the 5-gram bound).  Returns the surviving (doc_id, text) rows —
    one streaming stage, join-free: stats and filter run in the same task."""
    stats = RepetitionStats()

    def _keep(batch: pa.Table) -> pa.Table:
        s = stats(batch)
        mask = (
            (np.asarray(s.column("top2_char_frac")) <= max_top2)
            & (np.asarray(s.column("top3_char_frac")) <= max_top3)
            & (np.asarray(s.column("dup5_char_frac")) <= max_dup5)
            & (np.asarray(s.column("dup_line_frac")) <= max_dup_line))
        return batch.filter(pa.array(mask))

    return docs_ds.map_batches(_keep, batch_format="pyarrow")


def tfidf_top_terms(docs_ds, k: int = 5, *, text_col: str = "text",
                    id_col: str = "doc_id", n_docs: int | None = None,
                    num_buckets: int = 0):
    """Per-document TF-IDF top-k terms with ``idf = ln(N / df)``
    (raw document frequency — the arithmetic mirrors the SQL oracle
    step-for-step; numpy's log and DuckDB's ln agree to the last ulp, and
    the oracle compares at 6dp).

    Shape (all exact, nothing all-pairs):
      1. per-batch TF — Arrow C kernels (``utf8_lower`` → ``split_pattern``
         → flatten with parent indices) + one Arrow ``group_by`` per batch;
         a document's text is one row, so its TF is final after this stage;
      2. TERM-hash exchange of the (doc, term, tf) partials — a term's df is
         countable inside exactly one partition, where scores are computed;
      3. per-DOC top-k via ``top_k_per_group`` (grouped partial top-k, then a
         doc-hash exchange of O(docs·k) rows; ties break by term ascending).

    The shuffle payload is the distinct (doc, term) pairs — the corpus
    vocabulary footprint, never the text.  Terms are the non-empty
    ``lower(text).split(' ')`` family shared with vocab_top_terms.
    """
    import pyarrow.compute as pc

    if n_docs is None:
        n_docs = docs_ds.count()
    if num_buckets <= 0:
        from ..stages.bucketing import adaptive_bucket_count, rows_if_cheap
        num_buckets = adaptive_bucket_count(rows_if_cheap(docs_ds))

    def _tf(batch: pa.Table) -> pa.Table:
        lists = pc.split_pattern(pc.utf8_lower(batch.column(text_col)), " ")
        parents = pc.list_parent_indices(lists)
        terms = pc.list_flatten(lists)
        if isinstance(terms, pa.ChunkedArray):
            terms = terms.combine_chunks()
            parents = parents.combine_chunks()
        mask = pc.not_equal(terms, "")
        tt = pa.table({id_col: batch.column(id_col).take(parents.filter(mask)),
                       "term": terms.filter(mask)})
        g = tt.group_by([id_col, "term"]).aggregate([([], "count_all")])
        return g.rename_columns([id_col, "term", "tf"])

    partial = docs_ds.map_batches(_tf, batch_format="pyarrow")

    from zlib import crc32

    def _tag(t: pa.Table) -> pa.Table:
        b = np.asarray([crc32(x.encode()) % num_buckets
                        for x in t.column("term").to_pylist()],
                       dtype=np.int64)
        return t.append_column("bucket", pa.array(b))

    empty = pa.table({id_col: pa.array([], pa.int64()),
                      "term": pa.array([], pa.string()),
                      "score": pa.array([], pa.float64())})

    def _score(g: pa.Table) -> pa.Table:
        g = g.drop_columns(["bucket"])
        terms = np.asarray(g.column("term").to_pylist(), dtype=object)
        _, inv, df = np.unique(terms, return_inverse=True, return_counts=True)
        # ln(N / df) with the division first — identical to SQL ln(N*1.0/df)
        idf = np.log(np.float64(n_docs) / df.astype(np.float64))
        tf = g.column("tf").to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table({id_col: g.column(id_col), "term": g.column("term"),
                         "score": pa.array(tf * idf[inv])})

    from ..stages.exchange import grouped_exchange
    scored = grouped_exchange(partial, "bucket", num_buckets, _score,
                              map_fn=_tag, empty_result=empty)

    from .relational import top_k_per_group
    return top_k_per_group(scored, id_col, "score", k, largest=True,
                           tiebreak="term", num_buckets=num_buckets,
                           schema=empty.schema)


_JSON_NUM = r'"{key}"\s*:\s*(?P<v>-?\d+(?:\.\d+)?(?:[eE][-+]?\d+)?)'
_JSON_STR = r'"{key}"\s*:\s*"(?P<v>[^"\\]*)"'


def json_extract_scalar(ds, col: str, key: str, *, out_col: str | None = None,
                        dtype: str = "int64"):
    """Vectorized flat-JSON scalar extraction: appends ``out_col`` holding the
    first ``"key": <scalar>`` occurrence in the JSON-string column ``col``
    (null when the key is absent).  Runs entirely in Arrow's RE2
    ``extract_regex`` C kernel — no per-row parse, no Python loop — and the
    same RE2 pattern reproduces in DuckDB ``regexp_extract`` for the oracle.

    Scope (documented): unnested scalar fields of flat metadata columns
    (``events.props``-style sidecars); ``dtype`` one of int64/float64/string
    (string values must be escape-free).  Nested paths or escaped strings
    need a real parser — that variant belongs in an actor-pool stage with a
    JSON library in ``__init__``, same integration shape as the multimodal
    decode stub."""
    import pyarrow.compute as pc

    if dtype not in ("int64", "float64", "string"):
        raise ValueError(f"unsupported dtype {dtype!r}")
    pat = (_JSON_STR if dtype == "string" else _JSON_NUM).format(key=key)
    name = out_col or key
    typ = {"int64": pa.int64(), "float64": pa.float64(),
           "string": pa.string()}[dtype]

    def _extract(batch: pa.Table) -> pa.Table:
        s = batch.column(col)
        if isinstance(s, pa.ChunkedArray):
            s = s.combine_chunks()
        st = pc.extract_regex(s, pat)
        vals = pc.struct_field(st, "v")
        if dtype != "string":
            vals = vals.cast(pa.float64()).cast(typ) if dtype == "int64" \
                else vals.cast(typ)
        return batch.append_column(name, vals)

    return ds.map_batches(_extract, batch_format="pyarrow")


# PII patterns, fixed application order; RE2 syntax shared verbatim with the
# DuckDB regexp_replace oracle (both engines are RE2 — exact parity)
PII_PATTERNS = (
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    (r"\+\d{7,15}\b", "<PHONE>"),
    (r"\b\d{3}-\d{3,4}-\d{4}\b", "<PHONE>"),
)


def redact_pii(ds, text_col: str = "text"):
    """Scrub emails / IPv4 addresses / phone-shaped numbers from a text
    column, in place — the standard pre-training privacy pass.  Each pattern
    is one Arrow RE2 ``replace_substring_regex`` C-kernel sweep (4 sweeps,
    zero Python loops); patterns apply in PII_PATTERNS order so earlier
    rewrites (emails) are not re-matched by later ones."""
    import pyarrow.compute as pc

    def _scrub(batch: pa.Table) -> pa.Table:
        s = batch.column(text_col)
        if isinstance(s, pa.ChunkedArray):
            s = s.combine_chunks()
        for pat, repl in PII_PATTERNS:
            s = pc.replace_substring_regex(s, pat, repl)
        i = batch.schema.get_field_index(text_col)
        return batch.set_column(i, text_col, s)

    return ds.map_batches(_scrub, batch_format="pyarrow")


def chunk_documents(docs_ds, max_tokens: int, *, overlap: int = 0,
                    text_col: str = "text", id_col: str = "doc_id"):
    """Split documents into fixed-size whitespace-token windows with overlap —
    the context-window chunking step of RAG / long-document training
    pipelines.  Chunk starts are ``range(0, n_tokens, stride)`` with
    ``stride = max_tokens - overlap`` (every start is emitted, including a
    trailing partial window — the deterministic naive-stride semantics, so
    the result is exactly reproducible as SQL ``unnest(range(...))`` + list
    slicing).  Emits (id_col, chunk_id, start_tok, n_chunk_tokens,
    chunk_text); chunk_id = start_tok // stride.  Tokenization is the
    DuckDB-equal whitespace family (``regexp_split_to_array(trim(text),
    '\\s+')``); empty texts produce no chunks.  Per-document splitting is an
    inherently per-row text kernel (same convention as the shingle stages);
    rows only fan out, never shuffle.
    """
    if max_tokens <= 0:
        raise ValueError("max_tokens must be positive")
    if not 0 <= overlap < max_tokens:
        raise ValueError("overlap must satisfy 0 <= overlap < max_tokens")
    stride = max_tokens - overlap

    def _chunk(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        texts = batch.column(text_col).to_pylist()
        out_id, out_cid, out_start, out_n, out_text = [], [], [], [], []
        for i, t in zip(ids, texts):
            toks = t.split()
            n = len(toks)
            for s in range(0, n, stride):
                piece = toks[s:s + max_tokens]
                out_id.append(int(i))
                out_cid.append(s // stride)
                out_start.append(s)
                out_n.append(len(piece))
                out_text.append(" ".join(piece))
        return pa.table({
            id_col: pa.array(np.asarray(out_id, dtype=np.int64)),
            "chunk_id": pa.array(np.asarray(out_cid, dtype=np.int64)),
            "start_tok": pa.array(np.asarray(out_start, dtype=np.int64)),
            "n_chunk_tokens": pa.array(np.asarray(out_n, dtype=np.int64)),
            "chunk_text": pa.array(out_text, pa.string())})

    return docs_ds.map_batches(_chunk, batch_format="pyarrow")


def corpus_term_counts(docs_ds, *, text_col: str = "text",
                       num_buckets: int = 0):
    """Global term → count over the corpus (the ``vocab_top_terms`` family
    without the top-k cut): per-batch Arrow ``value_counts`` partials, a
    term-hash exchange so each term's total lands in exactly one partition,
    per-partition sum.  Returns the counts as a Dataset (term, cnt)."""
    import pyarrow.compute as pc

    from ..stages.exchange import exchange

    def _partial(batch: pa.Table) -> pa.Table:
        toks = pc.list_flatten(
            pc.split_pattern(pc.utf8_lower(batch.column(text_col)), " "))
        toks = toks.filter(pc.not_equal(toks, ""))
        vc = pc.value_counts(toks.combine_chunks()
                             if isinstance(toks, pa.ChunkedArray) else toks)
        return pa.table({"term": vc.field("values"),
                         "cnt": vc.field("counts").cast(pa.int64())})

    partial = docs_ds.map_batches(_partial, batch_format="pyarrow")
    if num_buckets <= 0:
        from ..stages.bucketing import adaptive_bucket_count, rows_if_cheap
        num_buckets = adaptive_bucket_count(rows_if_cheap(docs_ds))

    from zlib import crc32

    def _part(t: pa.Table) -> np.ndarray:
        return np.asarray([crc32(x.encode()) % num_buckets
                           for x in t.column("term").to_pylist()],
                          dtype=np.int64)

    def _sum(p: int, g: pa.Table) -> pa.Table:
        return g.group_by(["term"]).aggregate([("cnt", "sum")]) \
            .rename_columns(["term", "cnt"])

    return exchange(partial, _part, num_buckets, combine=_sum)


def unigram_lm_scores(docs_ds, *, text_col: str = "text",
                      id_col: str = "doc_id", counts=None,
                      pseudo_count: float = 0.5):
    """Unigram language-model quality signal — the library-free analogue of
    the perplexity filter (CCNet-style): per document, the mean negative
    log-probability of its tokens under the corpus unigram distribution.
    High score = tokens rare in the corpus = "surprising" text.

    Returns (id_col, n_tokens, avg_neg_logprob); documents with no tokens
    are dropped (no distribution to score under).  ``counts`` may be a
    precomputed (term, cnt) table/Dataset (e.g. pruned, or from a reference
    corpus — OOV terms then score ``ln(pseudo_count / N)``); by default the
    model is trained on ``docs_ds`` itself in one distributed counting pass.

    Scale shape: counting is the term-hash-exchange family (shuffle carries
    distinct (term, cnt) partials, never text); the trained model broadcasts
    ONCE via ``ray.put`` as two sorted arrays and scoring streams with no
    shuffle.  At web scale prune the vocab (min count) before broadcast —
    the pseudo-count floor keeps semantics defined.  Deterministic and
    SQL-exact: numpy log == DuckDB ln at the compare precision."""
    import ray

    if counts is None:
        counts = corpus_term_counts(docs_ds, text_col=text_col)
    if hasattr(counts, "to_arrow_refs"):
        from ..stages.blocks import nonempty_arrow_refs
        refs, _ = nonempty_arrow_refs(counts)
        tabs = [t for t in ray.get(list(refs)) if t.num_rows]
        counts = pa.concat_tables(tabs) if tabs else pa.table(
            {"term": pa.array([], pa.string()),
             "cnt": pa.array([], pa.int64())})
    terms = np.asarray(counts.column("term").to_pylist(), dtype=object)
    cnts = counts.column("cnt").to_numpy(zero_copy_only=False) \
        .astype(np.float64)
    order = np.argsort(terms)
    terms, cnts = terms[order], cnts[order]
    total = float(cnts.sum())
    if total <= 0:
        raise ValueError("unigram_lm_scores: counts table is empty (or all "
                         "zero) — no distribution to score under")
    t_ref, c_ref = ray.put(terms), ray.put(cnts)

    class _Score:
        def __init__(self):
            self.terms = ray.get(t_ref)
            self.cnts = ray.get(c_ref)
            self.__name__ = "unigram_lm_scores"

        def __call__(self, batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc
            lists = pc.split_pattern(
                pc.utf8_lower(batch.column(text_col)), " ")
            flat = pc.list_flatten(lists)
            nonempty = pc.not_equal(flat, "")
            # per-doc token counts AFTER dropping empty strings
            lens = pc.list_value_length(lists).to_numpy(zero_copy_only=False)
            doc_idx = np.repeat(np.arange(lens.shape[0]), lens)
            keep = nonempty.to_numpy(zero_copy_only=False)
            doc_idx = doc_idx[keep]
            toks = np.asarray(flat.filter(nonempty).to_pylist(), dtype=object)
            if self.terms.shape[0]:
                pos = np.searchsorted(self.terms, toks)
                posc = np.minimum(pos, self.terms.shape[0] - 1)
                hit = self.terms[posc] == toks
                c = np.where(hit, self.cnts[posc], pseudo_count)
            else:
                c = np.full(toks.shape[0], pseudo_count)
            logp = np.log(c / total)
            n_docs = batch.num_rows
            sums = np.zeros(n_docs, dtype=np.float64)
            ntok = np.zeros(n_docs, dtype=np.int64)
            np.add.at(sums, doc_idx, logp)
            np.add.at(ntok, doc_idx, 1)
            has = ntok > 0
            score = np.zeros(n_docs, dtype=np.float64)
            score[has] = -sums[has] / ntok[has]
            ids = batch.column(id_col).to_numpy(zero_copy_only=False)
            return pa.table({
                id_col: ids[has],
                "n_tokens": pa.array(ntok[has]),
                "avg_neg_logprob": pa.array(np.round(score[has], 6))})

    return docs_ds.map_batches(_Score(), batch_format="pyarrow")


#: GPT-2-style pre-tokenizer pattern, RE2-compatible (no lookahead — RE2 has
#: none, so the trailing-space refinement of the original GPT-2 pattern is
#: omitted; contractions, letter runs, digit runs, punctuation runs and
#: whitespace runs are split identically).  Shared VERBATIM with the DuckDB
#: oracle — both Arrow and DuckDB execute RE2, so counts are engine-equal.
BPE_PRETOKEN_PATTERN = r"'(?:s|t|re|ve|m|ll|d)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+"


def bpe_token_counts(docs_ds, *, text_col: str = "text",
                     id_col: str = "doc_id",
                     pattern: str = BPE_PRETOKEN_PATTERN):
    """Per-document BPE-ish token count: the GPT-2 pre-tokenizer regex run
    as Arrow's ``count_substring_regex`` RE2 C kernel — one vectorized
    streaming pass, no Python loop, no shuffle.  A real BPE vocab merges
    pre-tokens downstream; the pre-token count is the standard
    budget-estimation signal (and an upper bound on merged-BPE tokens).
    SQL oracle: ``len(regexp_extract_all(text, <same pattern>))``."""
    import pyarrow.compute as pc

    def _count(batch: pa.Table) -> pa.Table:
        n = pc.count_substring_regex(batch.column(text_col), pattern)
        return pa.table({id_col: batch.column(id_col),
                         "n_bpe_tokens": n.cast(pa.int64())})

    return docs_ds.map_batches(_count, batch_format="pyarrow")
