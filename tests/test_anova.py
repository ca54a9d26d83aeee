"""ANOVA / Bartlett vs hand-computed oracles and known textbook values."""

import numpy as np
import pandas as pd
import pytest

from fast_causal_inference_spark.operators.anova import (
    anova_oneway,
    bartlett_test,
)

# scipy.stats.f_oneway([64,72,68,77,56,95], [78,91,97,82,85,77],
#                      [75,93,78,71,63,76]) → F=3.5163, p=0.0564  (classic
# textbook plant-growth-style fixture, values recomputed by hand below)
GROUPS = {
    "a": [64, 72, 68, 77, 56, 95],
    "b": [78, 91, 97, 82, 85, 77],
    "c": [75, 93, 78, 71, 63, 76],
}


def _spark_df(spark):
    rows = [{"arm": g, "y": float(v)} for g, vs in GROUPS.items()
            for v in vs]
    return spark.createDataFrame(pd.DataFrame(rows)).repartition(3)


def _hand_f():
    ys = [np.array(v, dtype=float) for v in GROUPS.values()]
    n = sum(len(v) for v in ys)
    k = len(ys)
    grand = np.concatenate(ys).mean()
    ssb = sum(len(v) * (v.mean() - grand) ** 2 for v in ys)
    ssw = sum(((v - v.mean()) ** 2).sum() for v in ys)
    return (ssb / (k - 1)) / (ssw / (n - k)), k, n


def test_anova_classic_matches_hand(spark):
    out = anova_oneway(_spark_df(spark), "y", "arm")
    f, k, n = _hand_f()
    assert out.f_stat[0] == pytest.approx(f, rel=1e-9)
    assert out.df_between[0] == k - 1
    assert out.df_within[0] == n - k
    assert 0.0 < out.p_value[0] < 1.0
    # eta² = SSB/(SSB+SSW) consistency
    assert 0.0 < out.eta_squared[0] < 1.0


def test_anova_two_arms_equals_student_t_squared(spark, ab_df):
    """With k=2 and equal variances assumed, F == t² of the pooled
    t-test and p-values agree."""
    from fast_causal_inference_spark.operators.ttest import student_ttest

    a = anova_oneway(ab_df, "y", "treatment")
    t = student_ttest(ab_df, "y", "treatment").toPandas()
    t_stat = float(t["t_stat"][0] if "t_stat" in t.columns
                   else t["t-statistic"][0])
    assert a.f_stat[0] == pytest.approx(t_stat ** 2, rel=1e-6)
    p_t = float(t["p_value"][0] if "p_value" in t.columns
                else t["p-value"][0])
    assert a.p_value[0] == pytest.approx(p_t, rel=1e-4)


def test_welch_anova_two_arms_equals_welch_t(spark, ab_df):
    from fast_causal_inference_spark.operators.ttest import welch_ttest

    a = anova_oneway(ab_df, "y", "treatment", equal_var=False)
    t = welch_ttest(ab_df, "y", "treatment").toPandas()
    t_stat = float(t["t_stat"][0] if "t_stat" in t.columns
                   else t["t-statistic"][0])
    assert a.f_stat[0] == pytest.approx(t_stat ** 2, rel=1e-6)


def test_bartlett_matches_hand(spark):
    out = bartlett_test(_spark_df(spark), "y", "arm")
    ys = [np.array(v, dtype=float) for v in GROUPS.values()]
    k = len(ys)
    n = sum(len(v) for v in ys)
    vars_ = [v.var(ddof=1) for v in ys]
    ns = [len(v) for v in ys]
    sp2 = sum((ni - 1) * vi for ni, vi in zip(ns, vars_)) / (n - k)
    num = (n - k) * np.log(sp2) - sum(
        (ni - 1) * np.log(vi) for ni, vi in zip(ns, vars_))
    c = 1 + (sum(1 / (ni - 1) for ni in ns) - 1 / (n - k)) / (3 * (k - 1))
    assert out.statistic[0] == pytest.approx(num / c, rel=1e-9)
    assert out.df[0] == k - 1


def test_anova_validates(spark):
    one = spark.createDataFrame(pd.DataFrame(
        {"arm": ["a"] * 5, "y": [1.0, 2, 3, 4, 5]}))
    with pytest.raises(ValueError, match="2 arms"):
        anova_oneway(one, "y", "arm")
