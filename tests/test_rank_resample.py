"""Mann-Whitney / KS / xexpt / bootstrap / permutation vs pandas-numpy oracles."""

import math

import numpy as np
import pandas as pd
import pytest

from fast_causal_inference_spark.operators.kstest import kolmogorov_smirnov_test
from fast_causal_inference_spark.operators.mann_whitney import mann_whitney_utest
from fast_causal_inference_spark.operators.resample import (
    boot_strap,
    boot_strap_summary,
    permutation,
)
from fast_causal_inference_spark.operators.ttest import ttest_2samp
from fast_causal_inference_spark.operators.xexpt import xexpt_ttest_2samp
from fast_causal_inference_spark import stats_distributions as dist


def mw_oracle(x0, x1):
    """Exact U and tie-corrected z via pandas ranks."""
    v = np.concatenate([x0, x1])
    g = np.concatenate([np.zeros(len(x0)), np.ones(len(x1))])
    ranks = pd.Series(v).rank(method="average").to_numpy()
    r1 = ranks[g == 1].sum()
    n0, n1 = float(len(x0)), float(len(x1))
    n = n0 + n1
    u1 = r1 - n1 * (n1 + 1) / 2
    _, t = np.unique(v, return_counts=True)
    tie = float((t**3 - t).sum())
    sd = math.sqrt(n0 * n1 / 12 * ((n + 1) - tie / (n * (n - 1))))
    return u1, sd


def test_mann_whitney_exact_u(spark, ab_pdf, ab_df):
    res = mann_whitney_utest(ab_df, "y", "treatment").iloc[0]
    x0 = ab_pdf[ab_pdf.treatment == 0].y.to_numpy()
    x1 = ab_pdf[ab_pdf.treatment == 1].y.to_numpy()
    u1, sd = mw_oracle(x0, x1)
    assert res.u1 == pytest.approx(u1, abs=1e-6)
    assert res.u0 == pytest.approx(len(x0) * len(x1) - u1, abs=1e-6)
    mu = len(x0) * len(x1) / 2
    z = (abs(u1 - mu) - 0.5) / sd
    assert res.z == pytest.approx(z, rel=1e-9)
    assert res.p_value == pytest.approx(2 * float(dist.norm_sf(z)), rel=1e-9)


def test_mann_whitney_with_heavy_ties(spark):
    rng = np.random.default_rng(3)
    pdf = pd.DataFrame({"t": rng.integers(0, 2, 3000),
                        "v": rng.integers(0, 5, 3000).astype(float)})
    df = spark.createDataFrame(pdf).repartition(6)
    res = mann_whitney_utest(df, "v", "t").iloc[0]
    u1, sd = mw_oracle(pdf[pdf.t == 0].v.to_numpy(), pdf[pdf.t == 1].v.to_numpy())
    assert res.u1 == pytest.approx(u1, abs=1e-6)
    n0 = (pdf.t == 0).sum()
    n1 = (pdf.t == 1).sum()
    z = (abs(u1 - n0 * n1 / 2) - 0.5) / sd
    assert res.z == pytest.approx(z, rel=1e-9)


def test_mann_whitney_alternatives(spark, ab_df):
    less = mann_whitney_utest(ab_df, "y", "treatment", alternative="less").iloc[0]
    greater = mann_whitney_utest(ab_df, "y", "treatment", alternative="greater").iloc[0]
    # continuity correction makes them not exactly complementary; close though
    assert less.p_value + greater.p_value == pytest.approx(1.0, abs=1e-3)


def ks_oracle(x0, x1):
    v = np.sort(np.unique(np.concatenate([x0, x1])))
    f0 = np.searchsorted(np.sort(x0), v, side="right") / len(x0)
    f1 = np.searchsorted(np.sort(x1), v, side="right") / len(x1)
    return float(np.abs(f0 - f1).max())


def test_ks_statistic(spark, ab_pdf, ab_df):
    res = kolmogorov_smirnov_test(ab_df, "y", "treatment",
                                  mode="asymp").iloc[0]
    x0 = ab_pdf[ab_pdf.treatment == 0].y.to_numpy()
    x1 = ab_pdf[ab_pdf.treatment == 1].y.to_numpy()
    d = ks_oracle(x0, x1)
    assert res.d_statistic == pytest.approx(d, abs=1e-12)
    en = math.sqrt(len(x0) * len(x1) / (len(x0) + len(x1)))
    lam = (en + 0.12 + 0.11 / en) * d
    assert res.p_value == pytest.approx(float(dist.kolmogorov_sf(lam)), rel=1e-9)


def test_ks_detects_shift(spark, ab_df):
    shifted = ab_df.selectExpr("treatment", "y + treatment * 5.0 AS y2")
    res = kolmogorov_smirnov_test(shifted, "y2", "treatment").iloc[0]
    assert res.p_value < 1e-6


def test_xexpt_avg_consistent_with_ttest(spark, ab_df):
    rep = xexpt_ttest_2samp(ab_df, "numerator", "denominator", "treatment",
                            "denominator_pre").iloc[0]
    tt = ttest_2samp(ab_df, "avg(numerator)/avg(denominator)",
                     "treatment").collect()[0].asDict()
    assert rep.mean0 == pytest.approx(tt["mean0"], rel=1e-10)
    assert rep["diff"] == pytest.approx(tt["estimate"], rel=1e-10)
    assert rep.t_stat == pytest.approx(tt["t_stat"], rel=1e-10)
    assert rep.p_value == pytest.approx(tt["p_value"], rel=1e-10)
    assert rep.lower == pytest.approx(tt["lower"], rel=1e-9)
    # self-consistency: power evaluated at the reported MDE equals target 0.8
    rep2 = xexpt_ttest_2samp(ab_df, "numerator", "denominator", "treatment",
                             "denominator_pre", mde=abs(rep["mde"])).iloc[0]
    assert rep2.power == pytest.approx(0.8, abs=0.01)


def test_xexpt_cuped_tightens(spark, ab_df):
    plain = xexpt_ttest_2samp(ab_df, "numerator", "denominator", "treatment",
                              "denominator_pre").iloc[0]
    cuped = xexpt_ttest_2samp(ab_df, "numerator", "denominator", "treatment",
                              "denominator_pre",
                              X="avg(numerator_pre)/avg(denominator_pre)").iloc[0]
    assert (cuped.upper - cuped.lower) < (plain.upper - plain.lower)


def test_xexpt_sum_metric(spark, ab_df):
    rep = xexpt_ttest_2samp(ab_df, "numerator", "denominator", "treatment",
                            "denominator_pre", metric_type="sum",
                            group_buckets=(1, 1)).iloc[0]
    assert np.isfinite(rep.t_stat)
    assert 0 <= rep.p_value <= 1
    assert rep.ratio0 == 1.0 and rep.ratio1 == 1.0
    # bucket-mean metric approximates the arm totals ratio
    assert rep.mean1 / rep.mean0 == pytest.approx(
        rep.numerator1 / rep.numerator0, rel=1e-6)


def test_bootstrap_deterministic_and_centered(spark, ab_pdf, ab_df):
    reps = boot_strap(ab_df, "avg(numerator)/avg(denominator)",
                      n_resamples=50, seed=11).toPandas()
    assert len(reps) == 50
    point = ab_pdf.numerator.mean() / ab_pdf.denominator.mean()
    assert reps.value.mean() == pytest.approx(point, rel=0.02)
    reps2 = boot_strap(ab_df, "avg(numerator)/avg(denominator)",
                       n_resamples=50, seed=11).toPandas()
    assert reps.sort_values("replica_id").value.to_numpy() == pytest.approx(
        reps2.sort_values("replica_id").value.to_numpy())


def test_bootstrap_summary_matches_delta_method(spark, ab_df):
    """Bootstrap SE of a ratio metric ≈ delta-method SE."""
    from fast_causal_inference_spark.operators.deltamethod import delta_method

    summ = boot_strap_summary(ab_df, "avg(numerator)/avg(denominator)",
                              n_resamples=200, seed=5)
    se_delta = delta_method(ab_df, "avg(numerator)/avg(denominator)",
                            std=True).collect()[0][0]
    assert summ.stderr.iloc[0] == pytest.approx(se_delta, rel=0.25)
    assert summ.lower.iloc[0] < summ.estimate.iloc[0] < summ.upper.iloc[0]


def test_permutation_null_and_effect(spark, ab_df):
    null = permutation(ab_df, "avg(x1)", "treatment", permutation_num=60,
                       seed=3).iloc[0]
    assert null.p_value > 0.05      # x1 independent of treatment
    eff = permutation(ab_df, "avg(y)", "treatment", permutation_num=60,
                      seed=3).iloc[0]
    assert eff.p_value <= 1.0 / 60 + 1e-9   # y has a strong true effect
    assert abs(eff.observed_diff) > 5 * null.perm_std



def test_ks_exact_mode_matches_enumeration(spark):
    """Exact KS null probability vs brute-force path enumeration (n=5+5)."""
    import itertools

    from fast_causal_inference_spark.operators.kstest import _exact_ks_pvalue

    n0 = n1 = 5
    for d in (0.2000001, 0.4000001, 0.6000001, 0.8000001):
        total = 0
        exceed = 0
        for comb in itertools.combinations(range(n0 + n1), n0):
            i = j = 0
            dmax = 0.0
            mask = set(comb)
            for step in range(n0 + n1):
                if step in mask:
                    i += 1
                else:
                    j += 1
                dmax = max(dmax, abs(i / n0 - j / n1))
            total += 1
            if dmax >= d:
                exceed += 1
        want = exceed / total
        got = _exact_ks_pvalue(d, n0, n1)
        assert got == pytest.approx(want, abs=1e-12), d


def test_ks_exact_vs_asymp_consistent(spark, ab_df):
    ex = kolmogorov_smirnov_test(ab_df, "y", "treatment", mode="exact").iloc[0]
    asym = kolmogorov_smirnov_test(ab_df, "y", "treatment", mode="asymp").iloc[0]
    assert ex.d_statistic == asym.d_statistic
    assert ex.p_value == pytest.approx(asym.p_value, abs=0.05)
