"""BM25/TF-IDF retrieval, stratified/reservoir sampling, SemDeDup."""

import duckdb
import numpy as np
import pytest
from pyspark.sql import functions as F

from fast_causal_inference_spark.datapipe.retrieval import (
    bm25_search,
    postings,
    tfidf_search,
)
from fast_causal_inference_spark.datapipe.similarity import (
    semantic_dedup,
    semantic_dedup_pairs,
)
from fast_causal_inference_spark.datapipe.training import (
    reservoir_sample,
    stratified_sample,
)
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


@pytest.fixture(scope="module")
def queries(spark):
    return spark.createDataFrame(
        [(0, "spark query join"), (1, "merge sort window")],
        "query_id int, query string")


def _duck_bm25(k1=1.2, b=0.75, k=5):
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"'{SF_DIR}/documents.parquet'")
    return con.execute(f"""
WITH queries(query_id, query) AS
  (VALUES (0, 'spark query join'), (1, 'merge sort window')),
post AS (
  SELECT doc_id AS id, t.term, count(*) AS tf
  FROM documents,
       unnest(string_split_regex(trim(lower(text)), '\\s+')) AS t(term)
  WHERE t.term <> '' GROUP BY 1, 2
), doclen AS (SELECT id, sum(tf) AS dl FROM post GROUP BY 1),
docfreq AS (SELECT term, count(*) AS df_t FROM post GROUP BY 1),
consts AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM doclen),
qt AS (
  SELECT query_id, t.term FROM queries,
    unnest(list_distinct(string_split_regex(trim(lower(query)), '\\s+')))
      AS t(term)
  WHERE t.term <> ''
), scored AS (
  SELECT qt.query_id, post.id,
         sum(ln(1.0 + (consts.n - docfreq.df_t + 0.5)/(docfreq.df_t + 0.5))
             * post.tf * ({k1} + 1.0)
             / (post.tf + {k1}*(1.0 - {b} + {b}*doclen.dl/consts.avgdl)))
           AS score,
         count(*) AS matched_terms
  FROM post JOIN qt USING (term) JOIN docfreq USING (term)
       JOIN doclen USING (id) CROSS JOIN consts
  GROUP BY 1, 2
), ranked AS (
  SELECT query_id, id, score, matched_terms,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY score DESC, id) AS rank
  FROM scored
)
SELECT query_id, id, score, matched_terms, rank
FROM ranked WHERE rank <= {k} ORDER BY query_id, rank
""").df()


def test_bm25_matches_duckdb(docs, queries):
    got = bm25_search(docs, queries, k=5).orderBy("query_id", "rank") \
        .toPandas()
    want = _duck_bm25()
    assert (got["id"].to_numpy() == want["id"].to_numpy()).all()
    assert (got["matched_terms"].to_numpy()
            == want["matched_terms"].to_numpy()).all()
    assert np.allclose(got["score"], want["score"], rtol=1e-12)


def test_bm25_is_broadcast_plus_window_limit(docs, queries):
    plan = bm25_search(docs, queries, k=5)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BroadcastHashJoin" in plan
    assert "WindowGroupLimit" in plan  # top-k pushed below the shuffle


def test_postings_shape(docs):
    post = postings(docs)
    row = post.agg(F.count(F.lit(1)), F.min("tf")).first()
    assert row[0] > 0 and row[1] >= 1
    # (id, term) unique
    assert post.groupBy("id", "term").count().where("count > 1") \
        .count() == 0


def test_tfidf_hand_check(spark):
    corpus = spark.createDataFrame(
        [(0, "red fish blue fish"), (1, "red car"), (2, "green tree")],
        "doc_id long, text string")
    q = spark.createDataFrame([(0, "red fish")], "query_id int, query string")
    got = tfidf_search(corpus, q, k=3).orderBy("rank").toPandas()
    # hand computation with idf = ln(1 + N/(1+df)), w = (1+ln tf)·idf
    N = 3
    idf = {t: np.log(1 + N / (1 + df))
           for t, df in {"red": 2, "fish": 1, "blue": 1, "car": 1,
                         "green": 1, "tree": 1}.items()}
    dvec = {0: {"red": 1, "fish": 2, "blue": 1}, 1: {"red": 1, "car": 1},
            2: {"green": 1, "tree": 1}}
    qvec = {"red": 1, "fish": 1}
    qw = {t: (1 + np.log(tf)) * idf[t] for t, tf in qvec.items()}
    qn = np.sqrt(sum(v * v for v in qw.values()))
    expect = {}
    for d, terms in dvec.items():
        w = {t: (1 + np.log(tf)) * idf[t] for t, tf in terms.items()}
        dot = sum(w[t] * qw[t] for t in w if t in qw)
        if dot:
            expect[d] = dot / (np.sqrt(sum(v * v for v in w.values())) * qn)
    want = sorted(expect.items(), key=lambda kv: -kv[1])
    assert list(got["id"]) == [d for d, _ in want]
    assert np.allclose(got["score"],
                       [s for _, s in want], rtol=1e-12)


def test_stratified_fraction_deterministic_and_layoutproof(docs):
    a = stratified_sample(docs, "lang", fractions=0.3, seed=9,
                          id_cols=["doc_id"])
    b = stratified_sample(docs.repartition(7), "lang", fractions=0.3,
                          seed=9, id_cols=["doc_id"])
    ids_a = sorted(r["doc_id"] for r in a.select("doc_id").collect())
    ids_b = sorted(r["doc_id"] for r in b.select("doc_id").collect())
    assert ids_a == ids_b and len(ids_a) > 0
    n = docs.count()
    assert 0.15 * n < len(ids_a) < 0.45 * n


def test_stratified_dict_fractions(docs):
    out = stratified_sample(docs, "lang",
                            fractions={"en": 1.0, "de": 0.0}, seed=1,
                            id_cols=["doc_id"])
    langs = {r["lang"] for r in out.select("lang").distinct().collect()}
    assert "de" not in langs
    n_en = docs.where("lang = 'en'").count()
    assert out.where("lang = 'en'").count() == n_en


def test_stratified_exact_n(docs):
    out = stratified_sample(docs, "lang", n_per_stratum=7, seed=3,
                            id_cols=["doc_id"])
    counts = {r["lang"]: r["count"] for r in
              out.groupBy("lang").count().collect()}
    full = {r["lang"]: r["count"] for r in
            docs.groupBy("lang").count().collect()}
    for lang, c in counts.items():
        assert c == min(7, full[lang])
    # deterministic under re-layout
    out2 = stratified_sample(docs.repartition(5), "lang", n_per_stratum=7,
                             seed=3, id_cols=["doc_id"])
    assert sorted(r["doc_id"] for r in out.collect()) == \
        sorted(r["doc_id"] for r in out2.collect())


def test_stratified_param_validation(docs):
    with pytest.raises(ValueError):
        stratified_sample(docs, "lang")
    with pytest.raises(ValueError):
        stratified_sample(docs, "lang", fractions=0.5, n_per_stratum=3)
    with pytest.raises(ValueError):
        stratified_sample(docs, ["lang", "source"], fractions={"en": 0.5})


def test_reservoir_exact_n_layoutproof(docs):
    a = reservoir_sample(docs, 40, seed=5, id_cols=["doc_id"])
    b = reservoir_sample(docs.repartition(9), 40, seed=5,
                         id_cols=["doc_id"])
    ids_a = sorted(r["doc_id"] for r in a.collect())
    ids_b = sorted(r["doc_id"] for r in b.collect())
    assert len(ids_a) == 40 and ids_a == ids_b
    assert a.columns == docs.columns


def test_reservoir_plan_is_take_ordered(docs):
    plan = reservoir_sample(docs, 10, id_cols=["doc_id"])._jdf \
        .queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


@pytest.fixture(scope="module")
def emb_with_copies(spark):
    e = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    copies = e.where(F.col("vec_id") < 10).select(
        (F.col("vec_id") + 50000).alias("vec_id"), "embedding", "label")
    return e.unionByName(copies)


def test_semantic_dedup_finds_planted_copies(emb_with_copies):
    pairs = semantic_dedup_pairs(emb_with_copies, threshold=0.999,
                                 n_lists=16, seed=4)
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    planted = {(i, i + 50000) for i in range(10)}
    # exact copies quantize to the same cell → recall 1.0 on them
    assert planted <= got
    out = semantic_dedup(emb_with_copies, threshold=0.999, n_lists=16,
                         seed=4)
    kept = {r["vec_id"] for r in out.select("vec_id").collect()}
    assert all(i in kept and i + 50000 not in kept for i in range(10))


def test_semantic_dedup_candidate_volume_bounded(emb_with_copies):
    # the self-join is equi on the cell id — no cartesian in the plan
    pairs = semantic_dedup_pairs(emb_with_copies, threshold=0.999,
                                 n_lists=16, seed=4)
    plan = pairs._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_bm25_empty_corpus_returns_empty(spark, queries):
    empty = spark.createDataFrame([], "doc_id long, text string")
    assert bm25_search(empty, queries, k=3).count() == 0
    blank = spark.createDataFrame([(0, "   ")], "doc_id long, text string")
    assert bm25_search(blank, queries, k=3).count() == 0


def test_tfidf_oov_query_term_still_weighs_query_norm(spark):
    corpus = spark.createDataFrame([(0, "red")], "doc_id long, text string")
    q = spark.createDataFrame([(0, "red zzz")], "query_id int, query string")
    got = tfidf_search(corpus, q, k=3).toPandas()
    # idf(red)=ln(1+1/2), idf(zzz|df=0)=ln(1+1/1); cosine must be < 1
    # because zzz carries weight in the query norm
    i_red, i_zzz = np.log(1.5), np.log(2.0)
    expect = i_red / np.sqrt(i_red ** 2 + i_zzz ** 2)
    assert np.isclose(got.iloc[0]["score"], expect, rtol=1e-12)


def test_semantic_dedup_null_embedding_skipped(spark, emb_with_copies):
    from pyspark.sql import functions as F2
    withnull = emb_with_copies.unionByName(
        spark.createDataFrame([(999999,)], "vec_id long")
        .withColumn("embedding",
                    F2.lit(None).cast("array<float>"))
        .withColumn("label", F2.lit(None).cast("long")))
    pairs = semantic_dedup_pairs(withnull, threshold=0.999, n_lists=16,
                                 seed=4)
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert {(i, i + 50000) for i in range(10)} <= got
