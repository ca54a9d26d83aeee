"""CausalDataFrame facade: relational verbs delegate to native Spark."""

import pytest
from pyspark.sql import functions as F

from fast_causal_inference_spark.dataframe import (
    CausalDataFrame,
    readCsv,
    readParquet,
    readSparkDf,
)

@pytest.fixture(scope="module")
def docs_for_facade(spark):
    from fast_causal_inference_spark.sources.tables import load_table

    return load_table(spark, "/root/testdata/sf0.001", "documents") \
        .select("doc_id", "text")



def test_relational_chaining(spark, ab_df):
    cdf = readSparkDf(ab_df)
    out = (cdf.filter("x1 > 0")
              .withColumn("z", F.col("x1") * 2)
              .select("z", "treatment", "y")
              .withColumnRenamed("z", "x2z"))
    assert isinstance(out, CausalDataFrame)
    assert set(out.columns) == {"x2z", "treatment", "y"}
    assert out.count() == ab_df.filter("x1 > 0").count()


def test_join_union_sample_split(spark, ab_df):
    cdf = readSparkDf(ab_df.select("treatment", "y", "x1"))
    dims = readSparkDf(
        spark.createDataFrame([(0, "control"), (1, "treat")], "treatment int, name string"))
    joined = cdf.join(dims.df, on="treatment", how="left")
    assert "name" in joined.columns
    semi = cdf.join(dims.df.filter("treatment = 1"), on="treatment", how="left_semi")
    assert semi.select("treatment").distinct().count() == 1
    u = cdf.unionByName(cdf.df)
    assert u.count() == 2 * cdf.count()
    s = cdf.sample(0.5, seed=1)
    assert 0 < s.count() < cdf.count()
    a, b = cdf.randomSplit([0.8, 0.2], seed=1)
    assert a.count() + b.count() == cdf.count()


def test_describe(spark, ab_df):
    d = readSparkDf(ab_df).describe(["y", "x1"])
    assert list(d.columns) == ["y", "x1"]
    assert d.loc["count", "y"] == ab_df.count()
    assert d.loc["25%", "y"] <= d.loc["50%", "y"] <= d.loc["75%", "y"]


def test_stat_verbs_through_facade(spark, ab_df):
    cdf = readSparkDf(ab_df)
    tt = cdf.ttest_2samp("avg(y)", "treatment").collect()[0]
    assert tt["p_value"] < 0.05                 # y has a true effect
    m = cdf.ols("y ~ x1 + x2")
    assert len(m.beta) == 3
    dm = cdf.delta_method("avg(numerator)/avg(denominator)")
    assert dm.collect()[0][0] > 0


def test_readers(spark, tmp_path, ab_pdf):
    p = str(tmp_path / "t.csv")
    ab_pdf.head(100).to_csv(p, index=False)
    cdf = readCsv(p, spark)
    assert cdf.count() == 100
    pq = str(tmp_path / "t.parquet")
    spark.createDataFrame(ab_pdf.head(50)).write.parquet(pq)
    assert readParquet(pq, spark).count() == 50


def test_test_result_wrapper(spark, ab_df):
    from fast_causal_inference_spark.operators.ttest import ttest_2samp
    from fast_causal_inference_spark.result import test_result

    r = test_result(ttest_2samp(ab_df, "avg(y)", "treatment"))
    assert r.estimate == r["estimate"]
    assert r.t_statistic == r.t_stat            # reference-style alias
    assert r.pvalue == r.p_value
    assert r.confidence_interval == (r.lower, r.upper)
    assert "estimate" in repr(r) and "p_value" in r.summary()


def test_reference_named_conveniences(spark, ab_df):
    cdf = readSparkDf(ab_df)
    a, b = cdf.split(0.25, seed=3)
    assert a.count() + b.count() == cdf.count()
    assert b.count() < a.count()
    name = cdf.materializedView("fcis_test_view")
    assert spark.table(name).count() == cdf.count()
    assert "LocalRelation" in cdf.getExecutedSql() or \
        "Relation" in cdf.getExecutedSql()
    mw = cdf.mann_whitney_utest("y", "treatment")
    assert mw.iloc[0].p_value < 0.05
    ks = cdf.kolmogorov_smirnov_test("y", "treatment")
    assert ks.iloc[0].d_statistic > 0
    bs = cdf.boot_strap("avg(y)", n_resamples=10, seed=1)
    assert bs.count() == 10


def test_facade_round2_methods(spark, ab_df):
    import fast_causal_inference_spark as fcis

    cdf = fcis.readSparkDf(ab_df)
    summ = cdf.boot_strap_ols("y ~ x1", n_resamples=10, seed=2)
    assert len(summ) == 2
    m = cdf.stochastic_linear_regression("y ~ x1 + x2", learning_rate=0.05,
                                         l1=0.0, epochs=5, batch_size=64,
                                         seed=1, standardize=True)
    assert abs(m.beta[1] - 0.5) < 0.4
    dens = cdf.matching_plot("treatment", "x1", bins=10)
    assert len(dens) == 10
    dd = cdf.did("y", "treatment", "x3 > 1")
    assert len(dd.beta) == 4
    lg = cdf.get_lift_gain("x1", "y", "treatment", k=5)
    assert len(lg) == 5


def test_groupby_chaining(spark, ab_df):
    import fast_causal_inference_spark as fcis
    from pyspark.sql import functions as F

    cdf = fcis.readSparkDf(ab_df.withColumn("seg", (F.col("x3") > 1)
                                            .cast("int")))
    out = cdf.groupBy("seg").ttest_2samp("avg(y)", "treatment")
    assert out.count() == 2
    mw = cdf.groupBy("seg").mann_whitney_utest("y", "treatment")
    assert mw.count() == 2
    # native grouped ops still reachable
    agg = cdf.groupBy("seg").count()
    assert agg.count() == 2


def test_facade_parity_methods(spark, ab_df):
    import fast_causal_inference_spark as fcis

    cdf = fcis.readSparkDf(ab_df)
    assert cdf.student_ttest("y", "treatment").count() == 1
    assert cdf.welch_ttest("y", "treatment").count() == 1
    assert cdf.mean_z_test("y", "treatment", 1.0, 1.0).count() == 1
    r = cdf.pearsonr("x1", "y")
    assert abs(r.iloc[0]["r"]) <= 1.0
    q = cdf.quantiles("y", 0.25, 0.5, 0.75, exact=True)
    assert q[0] <= q[1] <= q[2]
    m = cdf.matrix_multiplication("x1", "x2")
    assert m.shape == (2, 2) or m.shape == (3, 3)


def test_facade_aggregate_shorthands(spark, ab_df):
    import numpy as np

    import fast_causal_inference_spark as fcis

    cdf = fcis.readSparkDf(ab_df)
    pdf = ab_df.toPandas()
    assert cdf.stddevSamp("y") == pytest.approx(pdf.y.std(ddof=1), rel=1e-9)
    assert cdf.varPop("y") == pytest.approx(pdf.y.var(ddof=0), rel=1e-9)
    assert cdf.covarSamp("x1", "y") == pytest.approx(
        np.cov(pdf.x1, pdf.y, ddof=1)[0, 1], rel=1e-9)
    assert cdf.anyMin("y") == pytest.approx(pdf.y.min())
    assert cdf.anyMax("y") == pytest.approx(pdf.y.max())
    assert "rows=4000" in cdf.brief()


def test_facade_temporal_verbs(spark, events):
    import fast_causal_inference_spark as fcis
    from pyspark.sql import functions as F

    cdf = fcis.readSparkDf(events)
    views = events.select("user_id", "ts", "value").limit(500)
    aj = cdf.asof_join(views, on="user_id", left_ts="ts",
                       right_cols=["value"])
    assert aj.df.count() == events.count()
    ru = cdf.time_bucket_rollup(
        "ts", ["1 day"], [F.count(F.lit(1)).alias("n")], ["event_type"])
    assert ru.df.count() > 0
    ses = cdf.sessionize("user_id", "ts", gap="30 minutes")
    assert "duration_sec" in ses.df.columns
    tk = cdf.top_k_per_key("user_id", "value", k=2)
    assert tk.df.groupBy("user_id").count().agg(
        F.max("count")).collect()[0][0] <= 2


def test_read_json_orc_roundtrip(spark, events, tmp_path):
    import fast_causal_inference_spark.dataframe as fdf
    from pyspark.sql import functions as F

    jp, op = str(tmp_path / "ev_json"), str(tmp_path / "ev_orc")
    small = events.select("event_id", "user_id", "value").limit(100)
    small.write.mode("overwrite").json(jp)
    small.write.mode("overwrite").orc(op)
    assert fdf.readJson(jp, spark).df.count() == 100
    back = fdf.readOrc(op, spark)
    assert back.df.count() == 100
    # facade verbs work straight off the reader (scalar aggregate)
    assert back.varSamp("value") is not None


def test_facade_datapipe_verbs(spark, docs_for_facade):
    import fast_causal_inference_spark as fcis
    import pytest as _pytest

    cdf = fcis.readSparkDf(docs_for_facade)
    assert cdf.exact_dedup().df.count() <= docs_for_facade.count()
    pairs = cdf.near_dup_pairs(method="ngram", threshold=0.6)
    assert set(pairs.df.columns) == {"id_a", "id_b", "jaccard"}
    es = cdf.withColumn("arm", (cdf.df.doc_id % 2).cast("int")) \
        .withColumn("y", cdf.df.doc_id * 1.0)
    # wrong method name raises
    with _pytest.raises(ValueError, match="method"):
        cdf.near_dup_pairs(method="nope")


def test_facade_retrieval_sampling_verbs(spark, docs_for_facade):
    import fast_causal_inference_spark as fcis

    cdf = fcis.readSparkDf(docs_for_facade)
    q = spark.createDataFrame([(0, "spark join")],
                              "query_id bigint, query string")
    hits = cdf.bm25_search(q, k=3)
    assert hits.df.count() <= 3
    assert "score" in hits.df.columns
    assert cdf.tfidf_search(q, k=3).df.count() <= 3
    rs = cdf.reservoir_sample(12, id_cols=["doc_id"])
    assert rs.df.count() == 12
    from tests.conftest import SF_DIR

    emb = fcis.readSparkDf(
        spark.read.parquet(f"{SF_DIR}/embeddings.parquet"))
    kept = emb.semantic_dedup(threshold=0.9999, n_lists=8)
    assert kept.df.count() <= emb.df.count()
    chunks = cdf.chunk_documents(chunk_tokens=32)
    assert chunks.df.count() >= cdf.df.count()
    from fast_causal_inference_spark.datapipe.lm import train_bigram_lm
    lm = train_bigram_lm(cdf.df.limit(100))
    assert cdf.perplexity_filter(lm, max_ppl=1e9).df.count() > 0
    udf_ = spark.createDataFrame(
        [(0, "https://a.com/x"), (1, "https://www.a.com/x/")],
        "id long, url string")
    assert fcis.readSparkDf(udf_).url_dedup().df.count() == 1


def test_round5_facade_verbs(spark, events):
    from pyspark.sql import functions as F

    import fast_causal_inference_spark as fcis

    cdf = fcis.readSparkDf(
        events.limit(5000)
        .withColumn("treatment", (F.col("user_id") % 2).cast("int"))
        .withColumn("outcome", F.col("value"))
        .withColumn("revenue", F.abs(F.col("value")))
        .withColumn("cost", F.abs(F.col("value")) * 0.2 + 0.01)
        .withColumn("x", (F.col("event_id") % 7).cast("double")))
    assert "ate" in cdf.estimate_ate().columns
    assert float(cdf.estimate_roi().roi.iloc[0]) > 0
    aipw = cdf.aipw_estimator("outcome", "treatment", ["x"],
                              propensity="linear")
    assert {"ATE", "stderr"} <= set(aipw.columns)
    roc = cdf.roc_curve("treatment", "value", n_thresholds=20)
    assert {"fpr", "tpr"} <= set(roc.columns)


def test_facade_dml_and_prognostic(spark):
    import numpy as np
    import pandas as pd

    import fast_causal_inference_spark as fcis

    rng = np.random.default_rng(21)
    n = 2000
    pdf = pd.DataFrame({"x": rng.normal(0, 1, n)})
    pdf["t"] = pdf.x * 0.5 + rng.normal(0, 1, n)
    pdf["y"] = pdf.x + 1.5 * pdf.t + rng.normal(0, 1, n)
    cdf = fcis.readSparkDf(spark.createDataFrame(pdf))
    res = cdf.linear_dml("y", "t", "x", cv=2)
    assert abs(res.ate - 1.5) < 0.2
    npres = cdf.non_param_dml("y", "t", ["x"], cv=2)
    assert abs(npres.ate - 1.5) < 0.3
    arm = cdf.withColumn("arm", (F.col("t") > 0).cast("int"))
    m = arm.prognostic_score_matching("y", "arm", "x", caliper=1.0)
    assert "match_index" in m.toSparkDf().columns


def test_groupby_chaining_srm_and_qtb(spark, ab_df):
    """srm / quantile_test_bucket drill down through the grouped facade
    and agree with the solo operator on each segment."""
    import fast_causal_inference_spark as fcis
    from fast_causal_inference_spark.operators.srm import srm
    from pyspark.sql import functions as F

    seg_df = ab_df.withColumn("seg", (F.col("x3") > 1).cast("int")) \
                  .withColumn("uin", F.monotonically_increasing_id())
    cdf = fcis.readSparkDf(seg_df)
    g = cdf.groupBy("seg").srm("y", "treatment", ratio=[1.0, 1.0])
    assert set(g.seg) == {0, 1}
    solo = srm(seg_df.where("seg = 1"), "y", "treatment", [1.0, 1.0])
    got = g[g.seg == 1].iloc[0]
    assert got["chisquare"] == float(solo["chisquare"].iloc[0])
    q = cdf.groupBy("seg").quantile_test_bucket(
        "y", "treatment", "uin", percentiles=(0.5,), n_bootstrap=20)
    assert set(q.seg) == {0, 1} and len(q) == 4   # (segment x arm) rows


def test_describe_numeric_free_frame(spark):
    import fast_causal_inference_spark as fcis

    cdf = fcis.readSparkDf(
        spark.createDataFrame([("a",), ("b",)], "s string"))
    out = cdf.describe()
    assert out.empty and list(out.index)[0] == "count"


def test_facade_media_surface(spark):
    """media_probe / image_stats / audio_stats chain through the facade
    on real synthesized payloads (GIF + FLAC paths included)."""
    import fast_causal_inference_spark as fcis
    from fast_causal_inference_spark.datapipe.multimodal import (
        synthesize_audio_column,
        synthesize_image_column,
    )

    d = spark.createDataFrame([(i, f"doc {i}") for i in range(8)],
                              "doc_id int, text string")
    cdf = fcis.readSparkDf(synthesize_image_column(d, "text", fmt="gif"))
    st = cdf.image_stats().toPandas()
    assert (st.width.between(1, 16)).all()
    pr = cdf.media_probe().select("probe.container").toPandas()
    assert set(pr["container"]) == {"gif"}
    adf = fcis.readSparkDf(synthesize_audio_column(d, "text", fmt="flac"))
    au = adf.audio_stats().toPandas()
    assert (au.rms == au.rms.round()).all()
    af = adf.audio_features(n_mfcc=4).toPandas()
    assert all(len(v) == 4 for v in af.audio_features)


def test_groupby_nested_field_keeps_leaf_name(spark):
    """groupBy('struct.field') materializes under the leaf name
    ('field'), matching vanilla PySpark's output column naming."""
    import fast_causal_inference_spark as fcis

    cdf = fcis.readSparkDf(spark.createDataFrame(
        [((1, "a"),), ((2, "b"),), ((1, "c"),)], "s struct<k:int,v:string>"))
    out = cdf.groupBy("s.k").count()
    assert "k" in out.columns
    assert out.orderBy("k").count() == 2
