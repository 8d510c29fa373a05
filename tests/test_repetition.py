"""Gopher-style repetition quality signals (functions/text.RepetitionStats)."""
from collections import Counter

import numpy as np
import pyarrow as pa
import pytest

from graph_data_science_ray.functions.text import (RepetitionStats,
                                                   repetition_filter)


def _brute(text):
    """Independent reference implementation (Counter-based, different code
    shape from the kernel's single-pass dict)."""
    toks = [w for w in text.lower().split(" ") if w]
    tot = sum(map(len, toks))

    def gram_cov(n, dup):
        grams = [" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)]
        if not grams:
            return 0
        c = Counter(grams)
        charlen = {g: len(g) - (n - 1) for g in c}
        if dup:
            return sum(k * charlen[g] for g, k in c.items() if k > 1)
        return max(k * charlen[g] for g, k in c.items())

    lines = text.split("\n")
    lc = Counter(lines)
    lchars = sum(len(l) * k for l, k in lc.items())
    return {
        "top2_char_frac": gram_cov(2, False) / tot if tot else 0.0,
        "top3_char_frac": gram_cov(3, False) / tot if tot else 0.0,
        "dup5_char_frac": gram_cov(5, True) / tot if tot else 0.0,
        "dup_line_frac": (sum(len(l) * k for l, k in lc.items() if k > 1)
                          / lchars if lchars else 0.0),
        "dup_line_cnt_frac": sum(k for k in lc.values() if k > 1) / len(lines),
    }


TEXTS = ["a b a b a b c", "x y z", "dup\ndup\nuniq", "", "   ", "one",
         "p q r s t p q r s t p q r s t zz", "a  b   a  b",
         "l1\n\n\nl1\nl2", "spam " * 40 + "tail", "Mixed CASE mixed case"]


def test_matches_brute_force():
    tab = pa.table({"doc_id": list(range(len(TEXTS))), "text": TEXTS})
    got = RepetitionStats()(tab).to_pandas().set_index("doc_id")
    for i, t in enumerate(TEXTS):
        for k, v in _brute(t).items():
            assert got.loc[i, k] == pytest.approx(v, abs=1e-12), (i, k)


def test_boilerplate_scores_high_clean_scores_low():
    rng = np.random.default_rng(7)
    words = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta"]
    clean = " ".join(rng.choice(words, 400))
    spammy = "buy now " * 200
    tab = pa.table({"doc_id": [0, 1], "text": [clean, spammy]})
    df = RepetitionStats()(tab).to_pandas()
    assert df.loc[1, "top2_char_frac"] > 0.9 > df.loc[0, "top2_char_frac"]
    assert df.loc[1, "dup5_char_frac"] > 0.9


def test_repetition_filter_drops_spam():
    import ray.data
    rng = np.random.default_rng(3)
    words = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta"]
    texts = [" ".join(rng.choice(words, 300)) for _ in range(20)]
    texts += ["click here click here " * 50 for _ in range(5)]
    tab = pa.table({"doc_id": list(range(25)), "text": texts})
    kept = repetition_filter(ray.data.from_arrow(tab).repartition(4))
    ids = sorted(r["doc_id"] for r in kept.take_all())
    assert ids == list(range(20))


def test_empty_batch():
    tab = pa.table({"doc_id": pa.array([], pa.int64()),
                    "text": pa.array([], pa.string())})
    out = RepetitionStats()(tab)
    assert out.num_rows == 0 and out.num_columns == 6
