"""BPE tokenizer training/encoding (datapipe/tokenizer.py)."""

import random

import pytest
from pyspark.sql import functions as F

from fast_causal_inference_spark.datapipe.tokenizer import (
    _learn_merges,
    bpe_encode,
    bpe_encode_word,
    bpe_token_count,
    train_bpe,
)


def _naive_merges(word_counts, n_merges):
    """Full-rescan reference implementation."""
    words = {i: (list(w) + ["</w>"], c)
             for i, (w, c) in enumerate(word_counts)}
    merges = []
    for _ in range(n_merges):
        pc = {}
        for syms, c in words.values():
            for a, b in zip(syms, syms[1:]):
                pc[(a, b)] = pc.get((a, b), 0) + c
        cands = [(p, c) for p, c in pc.items() if c >= 2]
        if not cands:
            break
        best = min(cands, key=lambda x: (-x[1], x[0]))[0]
        merges.append(best)
        m = best[0] + best[1]
        for i, (syms, c) in words.items():
            out, j = [], 0
            while j < len(syms):
                if j + 1 < len(syms) and (syms[j], syms[j + 1]) == best:
                    out.append(m)
                    j += 2
                else:
                    out.append(syms[j])
                    j += 1
            words[i] = (out, c)
    return merges


def test_incremental_matches_naive_reference():
    rng = random.Random(0)
    for _ in range(20):
        seen = {}
        for _ in range(30):
            w = "".join(rng.choice("abcde")
                        for _ in range(rng.randint(1, 8)))
            seen[w] = seen.get(w, 0) + rng.randint(1, 9)
        wc = sorted(seen.items())
        assert _learn_merges(list(wc), 25) == _naive_merges(list(wc), 25)


def test_classic_sennrich_example():
    wc = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]
    m = _learn_merges(wc, 6)
    assert m[:3] == [("e", "s"), ("es", "t"), ("est", "</w>")]
    ranks = {p: i for i, p in enumerate(m)}
    assert bpe_encode_word("lowest", ranks) == ["low", "est</w>"]


def test_encode_roundtrip_reconstructs_words():
    wc = [("hello", 4), ("help", 3), ("world", 5), ("word", 2)]
    ranks = {p: i for i, p in enumerate(_learn_merges(wc, 30))}
    for w in ("hello", "help", "world", "word", "unseen", "helper"):
        toks = bpe_encode_word(w, ranks)
        assert "".join(toks).replace("</w>", "") == w
        assert toks[-1].endswith("</w>")


def test_train_and_encode_on_spark(spark, documents):
    model = train_bpe(documents, vocab_size=200, max_words=5000)
    assert len(model["vocab"]) <= 200
    assert model["merges"]
    enc = bpe_encode(documents.limit(50), model).toPandas()
    assert enc.bpe_tokens.map(len).min() > 0
    # reconstruct one document from its tokens
    row = enc.iloc[0]
    rebuilt = "".join(row.bpe_tokens).replace("</w>", " ").strip()
    assert rebuilt == " ".join(row.text.lower().split())
    # token counts = len of encoding
    cnt = bpe_token_count(documents.limit(50), model).toPandas()
    assert (cnt.n_tokens_bpe.to_numpy()
            == enc.bpe_tokens.map(len).to_numpy()).all()


def test_training_deterministic(spark, documents):
    m1 = train_bpe(documents, vocab_size=150, max_words=2000)
    m2 = train_bpe(documents, vocab_size=150, max_words=2000)
    assert m1["merges"] == m2["merges"]


@pytest.fixture(scope="session")
def documents(spark):
    import tests.conftest as c

    return spark.read.parquet(f"{c.SF_DIR}/documents.parquet")


def test_quality_classifier(spark):
    import math

    import pandas as pd

    from fast_causal_inference_spark.datapipe.quality import (
        quality_classifier_filter,
        quality_classifier_score,
        train_quality_classifier,
    )

    train = pd.DataFrame({
        "doc_id": range(6),
        "text": ["good clean prose here", "well written text prose",
                 "clean good text", "spam spam buy now",
                 "buy cheap spam now", "now spam buy"],
        "label": [1, 1, 1, 0, 0, 0]})
    m = train_quality_classifier(spark.createDataFrame(train), "label")
    assert m["vocab_size"] == 11 and m["n_pos"] == m["n_neg"] == 11
    test = spark.createDataFrame(pd.DataFrame({
        "doc_id": [10, 11, 12],
        "text": ["clean prose", "buy spam now", ""]}))
    s = (quality_classifier_score(test, m).toPandas()
         .sort_values("doc_id").reset_index(drop=True))
    # manual NB oracle
    cnt = {r["w"]: (r["c_pos"], r["c_neg"]) for r in m["counts"].collect()}

    def nb(text):
        lp = math.log(m["d_pos"]) - math.log(m["d_neg"])
        for w in text.lower().split():
            cp, cn = cnt.get(w, (0, 0))
            lp += (math.log((cp + 1) / (m["n_pos"] + m["vocab_size"]))
                   - math.log((cn + 1) / (m["n_neg"] + m["vocab_size"])))
        return lp

    for i, t in enumerate(["clean prose", "buy spam now", ""]):
        assert s.quality_logodds.iloc[i] == pytest.approx(nb(t), abs=1e-9)
    assert s.quality_logodds.iloc[0] > 0 > s.quality_logodds.iloc[1]
    kept = quality_classifier_filter(test, m).toPandas()
    assert kept.doc_id.tolist() == [10]
