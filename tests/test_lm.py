"""Bigram-LM perplexity scoring (CCNet-style quality filtering)."""

import duckdb
import numpy as np
import pytest

from fast_causal_inference_spark.datapipe.lm import (
    perplexity_filter,
    score_perplexity,
    train_bigram_lm,
)
from tests.conftest import SF_DIR


def test_bigram_lm_hand_check(spark):
    trusted = spark.createDataFrame(
        [(0, "a b a b"), (1, "a b c")], "doc_id long, text string")
    lm = train_bigram_lm(trusted)
    # bigrams: (a,b)x3, (b,a)x1, (b,c)x1; unigrams a=3 b=3 c=1; V=3
    bg = {(r["w1"], r["w2"]): r["c12"] for r in lm["bigrams"].collect()}
    assert bg == {("a", "b"): 3, ("b", "a"): 1, ("b", "c"): 1}
    assert lm["vocab_size"] == 3

    target = spark.createDataFrame([(7, "a b z")], "doc_id long, text string")
    out = score_perplexity(target, lm, k=1.0).collect()[0]
    # p(b|a) = (3+1)/(3+3); p(z|b) = (0+1)/(3+3)
    lp = (np.log(4 / 6) + np.log(1 / 6)) / 2
    assert out["n_bigrams"] == 2
    assert np.isclose(out["logprob"], lp, rtol=1e-12)
    assert np.isclose(out["ppl"], np.exp(-lp), rtol=1e-12)


def test_short_doc_scores_null(spark):
    trusted = spark.createDataFrame([(0, "a b")], "doc_id long, text string")
    lm = train_bigram_lm(trusted)
    target = spark.createDataFrame(
        [(1, "solo"), (2, "")], "doc_id long, text string")
    rows = {r["doc_id"]: r for r in score_perplexity(target, lm).collect()}
    assert rows[1]["n_bigrams"] == 0 and rows[1]["ppl"] is None
    assert rows[2]["n_bigrams"] == 0 and rows[2]["ppl"] is None


def test_perplexity_matches_duckdb(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    trusted = docs.where("doc_id % 5 = 0")
    lm = train_bigram_lm(trusted)
    got = (score_perplexity(docs, lm, k=1.0)
           .orderBy("doc_id").toPandas())

    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"'{SF_DIR}/documents.parquet'")
    want = con.execute(r"""
WITH tok AS (
  SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS toks
  FROM documents
), tbg AS (
  SELECT t.doc_id, toks[i] AS w1, toks[i+1] AS w2
  FROM tok t, unnest(range(1, greatest(length(toks), 1))) AS r(i)
  WHERE toks[i] <> '' AND toks[i+1] <> ''
), trusted_bg AS (
  SELECT w1, w2, count(*) AS c12 FROM tbg WHERE doc_id % 5 = 0
  GROUP BY 1, 2
), trusted_uni AS (
  SELECT u.tk AS w1, count(*) AS c1
  FROM tok t, unnest(t.toks) AS u(tk)
  WHERE t.doc_id % 5 = 0 AND u.tk <> '' GROUP BY 1
), consts AS (SELECT count(*) AS v FROM trusted_uni),
scored AS (
  SELECT d.doc_id, count(*) AS n_bigrams,
         avg(ln((coalesce(b.c12, 0) + 1.0)
                / (coalesce(u.c1, 0) + 1.0 * consts.v))) AS logprob
  FROM tbg d LEFT JOIN trusted_bg b USING (w1, w2)
       LEFT JOIN trusted_uni u USING (w1) CROSS JOIN consts
  GROUP BY 1
)
SELECT t.doc_id, coalesce(s.n_bigrams, 0) AS n_bigrams, s.logprob,
       exp(-s.logprob) AS ppl
FROM (SELECT DISTINCT doc_id FROM documents) t
LEFT JOIN scored s USING (doc_id) ORDER BY doc_id
""").df()
    assert len(got) == len(want)
    assert (got["n_bigrams"].to_numpy() == want["n_bigrams"].to_numpy()).all()
    assert np.allclose(got["logprob"].astype(float),
                       want["logprob"].astype(float),
                       rtol=1e-12, equal_nan=True)


def test_perplexity_filter(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    lm = train_bigram_lm(docs.where("doc_id % 5 = 0"))
    scored = score_perplexity(docs, lm).toPandas()
    med = float(np.nanmedian(scored["ppl"].astype(float)))
    kept = perplexity_filter(docs, lm, max_ppl=med)
    n_kept = kept.count()
    n_scoreable = int((scored["ppl"].notna()).sum())
    assert 0 < n_kept <= n_scoreable
    assert abs(n_kept - n_scoreable / 2) <= n_scoreable * 0.1


def test_score_plan_no_cartesian(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    lm = train_bigram_lm(docs.limit(50))
    plan = score_perplexity(docs, lm, broadcast_lm=True)._jdf \
        .queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_trigram_lm_hand_oracle(spark):
    import math

    import pandas as pd

    from fast_causal_inference_spark.datapipe.lm import (
        score_trigram_perplexity,
        train_trigram_lm,
    )

    trusted = pd.DataFrame({"doc_id": [0, 1],
                            "text": ["the cat sat on the mat",
                                     "the cat ran on the hill"]})
    lm = train_trigram_lm(spark.createDataFrame(trusted))
    assert lm["n_tokens"] == 12 and lm["vocab_size"] == 7
    test = pd.DataFrame({"doc_id": [10, 11, 12],
                         "text": ["the cat sat", "zebra quark flux", "hi"]})
    out = (score_trigram_perplexity(spark.createDataFrame(test), lm)
           .toPandas().sort_values("doc_id").reset_index(drop=True))
    # (the cat sat): l3*c123/ctx + l2*c23/c2 + l1*c3/N
    p = 0.7 * 1 / 2 + 0.2 * 1 / 2 + 0.1 * 1 / 12
    assert out.logprob.iloc[0] == pytest.approx(math.log(p), abs=1e-12)
    # fully unseen trigram floors at 1/(N+V)
    assert out.logprob.iloc[1] == pytest.approx(
        math.log(1.0 / (12 + 7)), abs=1e-12)
    # <3 tokens: no evidence
    assert out.n_trigrams.iloc[2] == 0 and pd.isna(out.ppl.iloc[2])
    assert out.ppl.iloc[0] < out.ppl.iloc[1]
    with pytest.raises(ValueError, match="lambdas"):
        score_trigram_perplexity(spark.createDataFrame(test), lm,
                                 lambdas=(0.5, 0.2, 0.2))
