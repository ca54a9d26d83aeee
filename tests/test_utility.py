"""Data-prep utilities (utility.py) + murmur_hash3_64 parity."""

import numpy as np
import pandas as pd
import pytest

import fast_causal_inference_spark.utility as U
from fast_causal_inference_spark.functions import (
    _murmur3_x64_128,
    murmur_hash3_64,
)


def test_simulate_randomized_trial_moments(spark):
    df = U.simulate_randomized_trial(spark, n=20000, p=6,
                                     add_cost_benefit=True, seed=3)
    pdf = df.toPandas()
    assert set(pdf.columns) >= {"treatment", "outcome", "propensity",
                                "expected_outcome", "actual_cate",
                                "feature_6", "benefit", "cost"}
    ate = (pdf[pdf.treatment == 1].outcome.mean()
           - pdf[pdf.treatment == 0].outcome.mean())
    # diff-in-means recovers E[tau] under randomization
    assert ate == pytest.approx(pdf.actual_cate.mean(), abs=0.1)
    assert (pdf.loc[pdf.treatment == 0, "cost"] == 0).all()
    # benefit ~ Gamma(3,1): mean 3, var 3
    pos = pdf.benefit[pdf.benefit > 0]
    assert pos.mean() == pytest.approx(3.0, abs=0.15)
    assert pos.var() == pytest.approx(3.0, abs=0.4)
    # deterministic under seed
    again = U.simulate_randomized_trial(spark, n=20000, p=6,
                                        add_cost_benefit=True, seed=3)
    assert again.toPandas().outcome.equals(pdf.outcome)


def test_simulate_binary_outcome(spark):
    pdf = U.simulate_randomized_trial(spark, n=4000, p=5,
                                      binary_outcome=True).toPandas()
    assert set(pdf.outcome.unique()) <= {0.0, 1.0}
    assert pdf.actual_cate.between(-1, 1).all()


def test_get_num_cat_feat_and_na(spark):
    mixed = spark.createDataFrame(pd.DataFrame({
        "a": [1, 2, None], "b": ["x", None, "z"],
        "t": pd.to_datetime(["2020-01-01"] * 3), "y": [0.1, 0.2, 0.3]}))
    num, cat = U.get_num_cat_feat(mixed)
    assert set(num) == {"a", "y"} and cat == ["b"]
    num2, _ = U.get_num_cat_feat(mixed, exclude_list=["a"])
    assert "a" not in num2
    filled = U.preprocess_na(mixed).toPandas()
    assert not filled.b.isna().any() and not filled.a.isna().any()
    tr, te = U.data_split(mixed, 0.3)
    assert tr.count() + te.count() == 3


def test_get_num_smd_single_pass(spark):
    rng = np.random.default_rng(5)
    pdf = pd.DataFrame({"treatment": rng.integers(0, 2, 2000),
                        "x1": rng.normal(0, 1, 2000),
                        "x2": rng.normal(2, 3, 2000)})
    pdf.loc[pdf.treatment == 1, "x2"] += 1.0   # imbalance
    smd = U.get_num_smd(spark.createDataFrame(pdf), "treatment", ["x1", "x2"])
    assert list(smd.columns) == ["variable", "smd"]
    # reference formula on rounded moments
    g = pdf.groupby("treatment")
    m = g.x2.mean().round(4)
    v = g.x2.var().round(4)
    exp = round((m[1] - m[0]) / np.sqrt(0.5 * (v[1] + v[0])), 4)
    assert smd.set_index("variable").loc["x2", "smd"] == pytest.approx(exp, abs=2e-4)
    assert abs(smd.set_index("variable").loc["x1", "smd"]) < 0.1


def test_find_correlation_matrix(spark):
    rng = np.random.default_rng(2)
    pdf = pd.DataFrame({"a": rng.normal(0, 1, 3000)})
    pdf["b"] = pdf.a * 0.5 + rng.normal(0, 1, 3000)
    pdf["c"] = rng.normal(0, 1, 3000)
    m = U.find_correlation_matrix(spark.createDataFrame(pdf), ["a", "b", "c"])
    exp = np.corrcoef(np.vstack([pdf.a, pdf.b, pdf.c]))
    assert np.allclose(m, exp, atol=1e-6)


def test_feature_process_and_assemble(spark):
    df = spark.createDataFrame(pd.DataFrame({
        "y": [0, 1, 0, 1], "x1": [1.0, 2.0, None, 4.0],
        "c": ["a", "b", "a", None]}))
    out = U.feature_process(df, "y", one_hot_enc=True).toPandas()
    assert "features" in out.columns
    assert out.x1.min() >= 0.0 and out.x1.max() <= 1.0
    assert {"c_a", "c_b", "c_NA"} <= set(out.columns)
    # x1 + the three indicator columns
    assert all(len(v) == 4 for v in out.features)


def test_roc_curve_matches_manual_counts(spark):
    rng = np.random.default_rng(0)
    lbl = rng.integers(0, 2, 4000)
    sc = lbl * 0.8 + rng.normal(0, 1, 4000)
    rdf = spark.createDataFrame(pd.DataFrame({"label": lbl, "score": sc}))
    roc = U.roc_curve(rdf, "label", "score", n_thresholds=100)
    for idx in (5, 50, 90):
        thr = roc.threshold.iloc[idx]
        assert roc.tp.iloc[idx] == ((sc >= thr) & (lbl == 1)).sum()
        assert roc.fp.iloc[idx] == ((sc >= thr) & (lbl == 0)).sum()
    assert (roc.tpr.diff().dropna() <= 1e-12).all()    # monotone in threshold
    auc_trap = float(np.trapz(roc.tpr[::-1], roc.fpr[::-1]))
    assert 0.6 < auc_trap < 0.95


def test_hist_matches_numpy(spark):
    rng = np.random.default_rng(1)
    sc = rng.normal(0, 1, 5000)
    rdf = spark.createDataFrame(pd.DataFrame({"score": sc}))
    h = U.hist_data(rdf, "score", bins=20)
    np_counts, _ = np.histogram(sc, bins=20, range=(sc.min(), sc.max()))
    assert (h["count"].to_numpy() == np_counts).all()
    bx = U.box_stats(rdf, ["score"])
    assert bx.q1.iloc[0] < bx["median"].iloc[0] < bx.q3.iloc[0]


def test_regression_string():
    assert U.regression_string("y", ["x1", "x2"]) == "y~x1+x2"


def test_murmur3_public_vectors():
    h1, h2 = _murmur3_x64_128(b"foo")
    assert h1 | (h2 << 64) == 168394135621993849475852668931176482145
    assert _murmur3_x64_128(b"") == (0, 0)


def test_murmur_hash3_64_column(spark):
    pdf = pd.DataFrame({"s": ["foo", "bar", None, "a" * 40]})
    out = spark.createDataFrame(pdf).select(
        murmur_hash3_64("s").alias("h")).toPandas()
    h1, h2 = _murmur3_x64_128(b"foo")
    exp = h1 ^ h2
    exp = exp - (1 << 64) if exp >= (1 << 63) else exp
    assert out.h.iloc[0] == exp
    assert pd.isna(out.h.iloc[2])
    assert out.h.nunique(dropna=True) == 3


def test_bucket_by_edges_paths_agree(spark):
    """The ≤128-edge WHEN tree and the >128-edge searchsorted UDF must
    implement the same function — including NULL/NaN → NULL."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F

    from fast_causal_inference_spark.functions.features import (
        bucket_by_edges,
    )

    rng = np.random.default_rng(3)
    vals = rng.uniform(-10, 10, 500).tolist() + [None, float("nan")]
    df = spark.createDataFrame(pd.DataFrame({"v": vals}))
    small_edges = sorted(rng.uniform(-10, 10, 100).tolist())
    big_edges = sorted(small_edges + rng.uniform(20, 30, 50).tolist())
    out = df.select(
        bucket_by_edges("v", small_edges).alias("tree"),
        bucket_by_edges("v", big_edges).alias("udf"),
        F.col("v")).toPandas()
    # no probe value reaches the extra (20,30) edges, so both columns
    # must be the same count-of-edges-<=v — computed by different paths
    valid = out[out.v.notna()]
    assert (valid.tree.to_numpy() == valid.udf.to_numpy()).all()
    exp = [sum(1 for e in small_edges if x >= e) for x in valid.v]
    assert (valid.tree.to_numpy() == np.array(exp)).all()
    # NULL and NaN bucket to NULL on BOTH paths
    invalid = out[out.v.isna()]
    assert invalid.tree.isna().all() and invalid.udf.isna().all()
    assert len(invalid) == 2
