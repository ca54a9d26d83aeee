"""Causal tree / features / survival / longterm / functions surface."""

import math

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

import fast_causal_inference_spark.functions as fn
from fast_causal_inference_spark.functions.features import (
    bucketize,
    cut_bins,
    one_hot_encode,
)
from fast_causal_inference_spark.operators.longterm import long_term_effect
from fast_causal_inference_spark.operators.survival import (
    kaplan_meier,
    logrank_test,
)
from fast_causal_inference_spark.uplift.causal_tree import CausalTree


@pytest.fixture(scope="module")
def tree_pdf():
    """Sharp effect heterogeneity: τ = 3 when x1 > 0 else 0."""
    rng = np.random.default_rng(17)
    n = 12000
    x1 = rng.normal(0, 1, n)
    x2 = rng.normal(0, 1, n)
    t = rng.integers(0, 2, n).astype(float)
    tau = np.where(x1 > 0, 3.0, 0.0)
    y = 1.0 + 0.2 * x2 + tau * t + rng.normal(0, 1, n)
    return pd.DataFrame({"x1": x1, "x2": x2, "t": t, "y": y})


@pytest.fixture(scope="module")
def tree_df(spark, tree_pdf):
    return spark.createDataFrame(tree_pdf).repartition(4).cache()


def test_causal_tree_finds_the_split(spark, tree_df, tree_pdf):
    tree = CausalTree(["x1", "x2"], "y", "t", max_depth=2,
                      min_node_size=200).fit(tree_df)
    root = tree.nodes_[0]
    assert root.feature == "x1"
    assert abs(root.threshold) < 0.25          # true boundary at 0
    leaves = tree.leaves()
    assert len(leaves) >= 2
    # leaf effects bracket the true taus {0, 3}
    assert leaves.tau.min() < 0.6
    assert leaves.tau.max() > 2.4
    # honest: leaf p-values distinguish effect vs no-effect regions
    big = leaves[leaves.tau > 2.4].iloc[0]
    assert big.p_value < 1e-6


def test_causal_tree_predict(spark, tree_df):
    tree = CausalTree(["x1", "x2"], "y", "t", max_depth=2,
                      min_node_size=200).fit(tree_df)
    scored = tree.predict(tree_df).select("x1", "ite").toPandas()
    hi = scored[scored.x1 > 0.5].ite.mean()
    lo = scored[scored.x1 < -0.5].ite.mean()
    assert hi > 2.0 and lo < 1.0
    assert len(tree.rules()) == len(tree.leaves())


def test_causal_tree_dishonest_mode(spark, tree_df):
    tree = CausalTree(["x1"], "y", "t", max_depth=1, min_node_size=200,
                      honesty=False).fit(tree_df)
    assert tree.nodes_[0].feature == "x1"
    assert len(tree.leaves()) == 2


def test_one_hot_encode(spark, ab_df):
    df = ab_df.withColumn("cat", F.when(F.col("x1") > 0, "A").otherwise("B"))
    out = one_hot_encode(df, ["cat"])
    row = out.selectExpr("sum(cat_A + cat_B) s", "count(*) c").collect()[0]
    assert row["s"] == row["c"]               # exactly one indicator per row


def test_cut_bins(spark, ab_df):
    out = ab_df.select(cut_bins("x1", [-10, 0, 10],
                                labels=["neg", "pos"]).alias("b"), "x1") \
        .limit(200).collect()
    for r in out:
        assert r["b"] == ("neg" if r["x1"] <= 0 else "pos")


def test_bucketize_quantiles(spark, ab_df):
    out = bucketize(ab_df, "x1", num_quantiles=4)
    counts = out.groupBy("x1_bucket").count().collect()
    cs = {int(r["x1_bucket"]): r["count"] for r in counts}
    assert len(cs) == 4
    total = sum(cs.values())
    for v in cs.values():
        assert abs(v - total / 4) < total * 0.05


def test_kaplan_meier_and_logrank(spark):
    rng = np.random.default_rng(5)
    n = 4000
    g = rng.integers(0, 2, n)
    t = rng.exponential(10 + 10 * g, n).round(1) + 0.1
    cens = rng.uniform(0, 40, n)
    time = np.minimum(t, cens)
    event = (t <= cens).astype(int)
    df = spark.createDataFrame(
        pd.DataFrame({"time": time, "event": event, "g": g}))
    km = kaplan_meier(df, "time", "event", group="g")
    for gv, sub in km.groupby("g"):
        s = sub.sort_values("time").survival.to_numpy()
        assert (np.diff(s) <= 1e-12).all()      # monotone nonincreasing
        assert 0 <= s[-1] <= 1
    # group 1 survives longer → its S(t) at median time is higher
    med = np.median(time)
    s0 = km[(km.g == 0) & (km.time <= med)].survival.iloc[-1]
    s1 = km[(km.g == 1) & (km.time <= med)].survival.iloc[-1]
    assert s1 > s0
    lr = logrank_test(df, "time", "event", "g").iloc[0]
    assert lr.p_value < 1e-6                    # strongly different hazards


def test_long_term_effect(spark, ab_df):
    out = long_term_effect(ab_df, ["x1", "x2"], "y", "treatment", horizons=3)
    assert len(out) == 3
    assert np.isfinite(out.estimate).all()
    assert (out.stderr > 0).all()


def test_functions_surface(spark, ab_df):
    med = ab_df.agg(fn.quantile("y", 0.5, exact=True).alias("med"),
                    fn.quantiles("y", 0.25, 0.75).alias("qs")).collect()[0]
    assert med["qs"][0] < med["med"] < med["qs"][1]
    row = ab_df.select(
        fn.L2Norm(F.array("x1", "x2")).alias("norm"),
        fn.cosineSimilarity(F.array("x1", "x2"),
                            F.array("x1", "x2")).alias("cos_self"),
        fn.If(F.col("x1") > 0, 1, 0).alias("pos"),
        fn.erf(F.lit(1.0)).alias("erf1"),
        fn.cdf(F.lit(1.96)).alias("cdf196"),
        fn.intExp2(F.lit(10)).alias("p2"),
    ).limit(1).collect()[0]
    assert row["cos_self"] == pytest.approx(1.0, rel=1e-9)
    assert row["erf1"] == pytest.approx(math.erf(1.0), rel=1e-12)
    assert row["cdf196"] == pytest.approx(0.9738, abs=1e-3)  # t-CDF df=120
    assert row["p2"] == 1024
    # vector distance identities
    r2 = ab_df.select(
        fn.L1Distance(F.array("x1", "x2"), F.array("x2", "x1")).alias("d1"),
        (2 * F.abs(F.col("x1") - F.col("x2"))).alias("want")).limit(5).collect()
    for r in r2:
        assert r["d1"] == pytest.approx(r["want"], rel=1e-9)


def test_long_term_reference_semantics(spark):
    """long_term vs a hand-rolled numpy simulation of the reference
    pipeline: observed per-period z-tests exact; bootstrap mean of the
    recursive roll tracks the deterministic point roll."""
    import numpy as np
    import pandas as pd

    from fast_causal_inference_spark.operators.longterm import long_term

    rng = np.random.default_rng(7)
    n, T, k = 2000, 4, 2
    treat = rng.integers(0, 2, n)
    S = np.zeros((n, T, k))
    S[:, 0, 0] = 1.0 + 0.5 * treat + rng.normal(0, 1, n)
    S[:, 0, 1] = 0.5 + 0.2 * treat + rng.normal(0, 1, n)
    A = np.array([[0.6, 0.1], [0.2, 0.5]])
    for t in range(1, T):
        S[:, t] = S[:, t - 1] @ A.T + 0.3 + rng.normal(0, 0.5, (n, k))
    cols = {f"s{t}_{c}": S[:, t, c] for t in range(T) for c in range(k)}
    cols["treatment"] = treat
    df = spark.createDataFrame(pd.DataFrame(cols))
    surr = [[f"s{t}_0", f"s{t}_1"] for t in range(T)]
    out = long_term(df, surr, "treatment", key_metric=0, train_periods=2,
                    bs_num=40, seed=3)
    assert list(out.t) == [1, 2, 3, 4]
    for t in range(T):
        est = S[treat == 1, t, 0].mean() - S[treat == 0, t, 0].mean()
        assert out.estimate[t] == pytest.approx(est, abs=1e-9)
    # deterministic point roll (numpy) vs bootstrap centre
    X = np.column_stack([np.ones(n), S[:, 0, 0], S[:, 0, 1]])
    B = np.linalg.lstsq(X, S[:, 1], rcond=None)[0]
    v = {a: S[treat == a, 1].mean(axis=0) for a in (0, 1)}
    point = []
    for _ in range(2):
        for a in (0, 1):
            v[a] = np.concatenate([[1.0], v[a]]) @ B
        point.append(v[1][0] - v[0][0])
    assert np.allclose(point, out.mean_pred.to_numpy()[2:], atol=0.2)
    assert (out.std_pred.to_numpy()[2:] > 0).all()
    assert np.isnan(out.mean_pred.to_numpy()[:2]).all()


def test_winsorize_and_trim(spark, ab_df):
    from fast_causal_inference_spark.functions.features import (
        trim_outliers,
        winsorize,
    )
    import pyspark.sql.functions as F

    w = winsorize(ab_df, "numerator", 0.05, 0.95)
    lo, hi = ab_df.approxQuantile("numerator", [0.05, 0.95], 1e-4)
    mm = w.agg(F.min("numerator"), F.max("numerator")).collect()[0]
    assert mm[0] >= lo - 1e-9 and mm[1] <= hi + 1e-9
    assert w.count() == ab_df.count()

    w2 = winsorize(ab_df, ["numerator"], 0.05, 0.95, suffix="_w")
    assert "numerator_w" in w2.columns

    t = trim_outliers(ab_df, "numerator", 0.05, 0.95)
    assert t.count() < ab_df.count()
    mm = t.agg(F.min("numerator"), F.max("numerator")).collect()[0]
    assert mm[0] >= lo - 1e-9 and mm[1] <= hi + 1e-9

    with pytest.raises(ValueError):
        winsorize(ab_df, "numerator", 0.9, 0.1)
