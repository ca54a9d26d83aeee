"""t-test family vs independent numpy/pandas oracles."""

import math

import numpy as np
import pytest

from fast_causal_inference_spark.formula import parse_formulas
from fast_causal_inference_spark.operators.deltamethod import delta_method
from fast_causal_inference_spark.operators.srm import srm
from fast_causal_inference_spark.operators.suffstats import NumStats
from fast_causal_inference_spark.operators.ttest import (
    student_ttest,
    ttest_1samp,
    ttest_2samp,
    ttests_2samp,
    welch_ttest,
)
from fast_causal_inference_spark import stats_distributions as dist


def ratio_delta_se(num, den):
    """Independent delta-method SE oracle for avg(num)/avg(den)."""
    n = len(num)
    mn, md = num.mean(), den.mean()
    g = np.array([1.0 / md, -mn / md**2])
    cov = np.cov(np.vstack([num, den]))  # ddof=1
    return math.sqrt(g @ cov @ g / n)


def test_delta_method_matches_numpy(spark, ab_pdf, ab_df):
    got = delta_method(ab_df, "avg(numerator)/avg(denominator)", std=True).collect()[0][0]
    want = ratio_delta_se(ab_pdf.numerator.to_numpy(), ab_pdf.denominator.to_numpy())
    assert got == pytest.approx(want, rel=1e-9)


def test_delta_method_grouped(spark, ab_pdf, ab_df):
    got = {r["treatment"]: r["std"]
           for r in delta_method(ab_df, "avg(numerator)/avg(denominator)",
                                 group_cols=["treatment"]).collect()}
    for t in (0, 1):
        sub = ab_pdf[ab_pdf.treatment == t]
        want = ratio_delta_se(sub.numerator.to_numpy(), sub.denominator.to_numpy())
        assert got[t] == pytest.approx(want, rel=1e-9)


def test_ttest_1samp_simple_mean(spark, ab_pdf, ab_df):
    """For Y=avg(y), delta-method collapses to the classic one-sample t-test."""
    res = ttest_1samp(ab_df, "avg(y)", mu=1.5).collect()[0].asDict()
    y = ab_pdf.y.to_numpy()
    se = y.std(ddof=1) / math.sqrt(len(y))
    t = (y.mean() - 1.5) / se
    assert res["estimate"] == pytest.approx(y.mean() - 1.5, rel=1e-9)
    assert res["stderr"] == pytest.approx(se, rel=1e-9)
    assert res["t_stat"] == pytest.approx(t, rel=1e-9)
    assert res["p_value"] == pytest.approx(2 * float(dist.norm_sf(abs(t))), rel=1e-9)
    # CI via student-t df=n-1
    q = float(dist.t_ppf(0.975, len(y) - 1))
    assert res["lower"] == pytest.approx(y.mean() - 1.5 - q * se, rel=1e-6)


def test_ttest_2samp_ratio_metric(spark, ab_pdf, ab_df):
    res = ttest_2samp(ab_df, "avg(numerator)/avg(denominator)", "treatment") \
        .collect()[0].asDict()
    g0 = ab_pdf[ab_pdf.treatment == 0]
    g1 = ab_pdf[ab_pdf.treatment == 1]
    m0 = g0.numerator.mean() / g0.denominator.mean()
    m1 = g1.numerator.mean() / g1.denominator.mean()
    se0 = ratio_delta_se(g0.numerator.to_numpy(), g0.denominator.to_numpy())
    se1 = ratio_delta_se(g1.numerator.to_numpy(), g1.denominator.to_numpy())
    se = math.sqrt(se0**2 + se1**2)
    assert res["mean0"] == pytest.approx(m0, rel=1e-9)
    assert res["mean1"] == pytest.approx(m1, rel=1e-9)
    assert res["estimate"] == pytest.approx(m1 - m0, rel=1e-9)
    assert res["stderr"] == pytest.approx(se, rel=1e-9)
    assert res["n0"] == len(g0) and res["n1"] == len(g1)


def test_ttest_2samp_cuped_reduces_variance(spark, ab_df):
    plain = ttest_2samp(ab_df, "avg(numerator)/avg(denominator)",
                        "treatment").collect()[0].asDict()
    cuped = ttest_2samp(ab_df, "avg(numerator)/avg(denominator)", "treatment",
                        X="avg(numerator_pre)/avg(denominator_pre)") \
        .collect()[0].asDict()
    assert cuped["stderr"] < plain["stderr"]
    # effect estimate should remain in the same ballpark
    assert cuped["estimate"] == pytest.approx(plain["estimate"], abs=5 * plain["stderr"])


def test_ttest_2samp_cuped_matches_manual_theta(spark, ab_pdf, ab_df):
    """Single-covariate CUPED: verify against a hand-rolled linearization."""
    res = ttest_2samp(ab_df, "avg(y)", "treatment", X="avg(x1)").collect()[0].asDict()
    y = ab_pdf.y.to_numpy()
    x = ab_pdf.x1.to_numpy()
    t = ab_pdf.treatment.to_numpy()
    # pooled theta = cov(y, x)/var(x) (delta-method on identity formulas)
    theta = np.cov(y, x)[0, 1] / np.var(x, ddof=1)
    adj = y - theta * x
    a0, a1 = adj[t == 0], adj[t == 1]
    est = a1.mean() - a0.mean()
    se = math.sqrt(a0.var(ddof=1) / len(a0) + a1.var(ddof=1) / len(a1))
    assert res["estimate"] == pytest.approx(est, rel=1e-9)
    # variances computed per-arm on theta-adjusted values; allow tiny drift
    # because the arm-wise delta covariances use arm means, not pooled means
    assert res["stderr"] == pytest.approx(se, rel=1e-3)


def test_ttests_2samp_multi_alternative(spark, ab_df):
    rows = ttests_2samp(ab_df, "avg(y)", "treatment",
                        alternatives=["two-sided", "less", "greater"]).collect()
    byalt = {r["alternative"]: r.asDict() for r in rows}
    assert len(byalt) == 3
    assert byalt["less"]["p_value"] + byalt["greater"]["p_value"] == pytest.approx(1.0)
    assert byalt["two-sided"]["p_value"] == pytest.approx(
        2 * min(byalt["less"]["p_value"], byalt["greater"]["p_value"]), rel=1e-9)


def test_welch_and_student(spark, ab_pdf, ab_df):
    w = welch_ttest(ab_df, "y", "treatment").collect()[0].asDict()
    s = student_ttest(ab_df, "y", "treatment").collect()[0].asDict()
    g0 = ab_pdf[ab_pdf.treatment == 0].y.to_numpy()
    g1 = ab_pdf[ab_pdf.treatment == 1].y.to_numpy()
    n0, n1 = len(g0), len(g1)
    v0, v1 = g0.var(ddof=1), g1.var(ddof=1)
    se_w = math.sqrt(v0 / n0 + v1 / n1)
    t_w = (g1.mean() - g0.mean()) / se_w
    df_w = se_w**4 / ((v0 / n0) ** 2 / (n0 - 1) + (v1 / n1) ** 2 / (n1 - 1))
    assert w["t_stat"] == pytest.approx(t_w, rel=1e-9)
    assert w["df"] == pytest.approx(df_w, rel=1e-9)
    assert w["p_value"] == pytest.approx(2 * float(dist.t_sf(abs(t_w), df_w)), rel=1e-9)
    sp = ((n0 - 1) * v0 + (n1 - 1) * v1) / (n0 + n1 - 2)
    t_s = (g1.mean() - g0.mean()) / math.sqrt(sp * (1 / n0 + 1 / n1))
    assert s["t_stat"] == pytest.approx(t_s, rel=1e-9)
    assert s["df"] == n0 + n1 - 2


def test_srm(spark, ab_pdf, ab_df):
    out = srm(ab_df, "denominator", "treatment", [1.0, 1.0])
    f_obs = ab_pdf.groupby("treatment").denominator.sum().to_numpy(dtype=float)
    f_exp = np.full(2, f_obs.sum() / 2)
    chi2 = (((f_obs - f_exp) ** 2) / f_exp).sum()
    assert out["chisquare"].iloc[0] == pytest.approx(chi2, rel=1e-9)
    assert out["observed"].to_numpy() == pytest.approx(f_obs)


def test_ttest_2samp_pse(spark, ab_pdf, ab_df):
    """PSE: stratified on a discrete covariate; matches hand-rolled
    post-stratified combination (w = n_s/n, mean Σw·m, var Σw²·v)."""
    import numpy as np

    df = ab_df.withColumn("stratum", (ab_df.x3 > 1).cast("int"))
    res = ttest_2samp(df, "avg(y)", "treatment", pse="stratum") \
        .collect()[0].asDict()
    pdf = ab_pdf.assign(stratum=(ab_pdf.x3 > 1).astype(int))
    total = len(pdf)
    mean = {0: 0.0, 1: 0.0}
    var = {0: 0.0, 1: 0.0}
    for _, cell in pdf.groupby("stratum"):
        w = len(cell) / total
        for t in (0, 1):
            arm = cell[cell.treatment == t].y
            mean[t] += w * arm.mean()
            var[t] += w * w * arm.var(ddof=1) / len(arm)
    est = mean[1] - mean[0]
    se = math.sqrt(var[0] + var[1])
    assert res["estimate"] == pytest.approx(est, rel=1e-9)
    assert res["stderr"] == pytest.approx(se, rel=1e-9)
    # PSE with a prognostic stratum should not hurt precision materially
    plain = ttest_2samp(ab_df, "avg(y)", "treatment").collect()[0].asDict()
    assert res["stderr"] < plain["stderr"] * 1.05


def test_ttest_2samp_pse_grouped(spark, ab_df):
    df = ab_df.withColumn("stratum", (ab_df.x3 > 1).cast("int")) \
              .withColumn("seg", (ab_df.x1 > 0).cast("int"))
    rows = ttest_2samp(df, "avg(y)", "treatment", pse="stratum",
                       group_cols=["seg"]).collect()
    assert len(rows) == 2
    for r in rows:
        assert np.isfinite(r["estimate"]) and r["stderr"] > 0


def test_cupac_reduces_variance_unbiased(spark):
    import numpy as np
    import pandas as pd

    from fast_causal_inference_spark.operators.ttest import (
        cupac_ttest_2samp,
        ttest_2samp,
    )

    rng = np.random.default_rng(0)
    n = 30000
    x1, x2 = rng.normal(0, 1, n), rng.normal(0, 1, n)
    t = rng.integers(0, 2, n)
    y = 2.0 + 0.1 * t + 1.5 * x1 - 0.8 * x2 ** 2 + rng.normal(0, 0.5, n)
    df = spark.createDataFrame(pd.DataFrame(
        {"t": t, "y": y, "x1": x1, "x2": x2, "uid": range(n)}))
    plain = ttest_2samp(df, "avg(y)", "t").toPandas()
    cupac = cupac_ttest_2samp(df, "y", "t", ["x1", "x2", "pow(x2,2)"],
                              fold_expr="uid").toPandas()
    # ML covariate removes most of the x-driven variance
    assert float(cupac.stderr.iloc[0]) < 0.5 * float(plain.stderr.iloc[0])
    # and stays unbiased for the true effect 0.1
    assert float(cupac.estimate.iloc[0]) == pytest.approx(0.1, abs=0.025)
    # deterministic folds without fold_expr too (hash of features)
    again = cupac_ttest_2samp(df, "y", "t", ["x1", "x2", "pow(x2,2)"])
    assert float(again.toPandas().estimate.iloc[0]) == pytest.approx(
        0.1, abs=0.025)


def test_cupac_edge_contracts(spark):
    import numpy as np
    import pandas as pd

    from fast_causal_inference_spark.operators.ttest import (
        cupac_ttest_2samp,
    )

    rng = np.random.default_rng(1)
    n = 4000
    pdf = pd.DataFrame({"t": rng.integers(0, 2, n),
                        "y": rng.normal(0, 1, n),
                        "x1": rng.normal(0, 1, n),
                        "x2": rng.normal(0, 1, n),
                        "uid": range(n)})
    df = spark.createDataFrame(pdf)
    # expression index (accepted by every sibling test in this module)
    out = cupac_ttest_2samp(df, "y", "uid % 2", ["x1"],
                            fold_expr="uid").toPandas()
    assert np.isfinite(out.estimate.iloc[0])
    # parenthesized '+' inside a feature expression survives the formula
    out2 = cupac_ttest_2samp(df, "y", "t", ["pow(x1+x2,2)"],
                             fold_expr="uid").toPandas()
    assert np.isfinite(out2.estimate.iloc[0])
    # cv=1 is rejected up front
    with pytest.raises(ValueError, match="cv must be >= 2"):
        cupac_ttest_2samp(df, "y", "t", ["x1"], cv=1)
    # degenerate folds raise an informative error, not a deep TypeError
    from pyspark.sql import functions as sf

    const = df.withColumn("c0", sf.lit(1.0))
    with pytest.raises(ValueError, match="fold"):
        cupac_ttest_2samp(const.drop("uid", "x1", "x2", "y")
                          .withColumn("y", sf.lit(1.0)), "y", "t", ["c0"])
