"""Proportion z-tests vs hand formulas and the chi-square identity."""

import math

import numpy as np
import pandas as pd
import pytest

from fast_causal_inference_spark.operators.proportion import (
    proportion_ztest,
    proportion_ztest_1samp,
)


def _df(spark, x0, n0, x1, n1):
    rows = ([{"arm": 0, "s": 1}] * x0 + [{"arm": 0, "s": 0}] * (n0 - x0)
            + [{"arm": 1, "s": 1}] * x1 + [{"arm": 1, "s": 0}] * (n1 - x1))
    return spark.createDataFrame(pd.DataFrame(rows)).repartition(4)


def test_two_sample_matches_hand(spark):
    d = _df(spark, 45, 300, 72, 310)
    out = proportion_ztest(d, "s", "arm")
    p0, p1 = 45 / 300, 72 / 310
    pooled = (45 + 72) / 610
    se = math.sqrt(pooled * (1 - pooled) * (1 / 300 + 1 / 310))
    assert out.z[0] == pytest.approx((p1 - p0) / se, rel=1e-12)
    assert out["diff"][0] == pytest.approx(p1 - p0)
    assert 0 < out.p_value[0] < 0.05


def test_pooled_z_squared_equals_chi2(spark):
    """Identity: the pooled two-proportion z² equals the (uncorrected)
    2×2 chi-square statistic."""
    from fast_causal_inference_spark.operators.contingency import (
        chi_square_independence,
    )

    d = _df(spark, 30, 100, 52, 120)
    z = proportion_ztest(d, "s", "arm").z[0]
    chi2 = chi_square_independence(d, "arm", "s").chi2[0]
    assert z ** 2 == pytest.approx(chi2, rel=1e-9)


def test_one_sample(spark):
    d = _df(spark, 60, 200, 0, 1).where("arm = 0")
    out = proportion_ztest_1samp(d, "s", p0=0.25)
    p = 60 / 200
    z = (p - 0.25) / math.sqrt(0.25 * 0.75 / 200)
    assert out.z[0] == pytest.approx(z, rel=1e-12)
    assert out.wilson_lower[0] < p < out.wilson_upper[0]
    g = proportion_ztest_1samp(d, "s", p0=0.25, alternative="greater")
    assert g.p_value[0] == pytest.approx(out.p_value[0] / 2, rel=1e-9)


def test_validations(spark):
    d = _df(spark, 5, 10, 5, 10)
    with pytest.raises(ValueError, match="p0"):
        proportion_ztest_1samp(d, "s", p0=1.5)
    degenerate = _df(spark, 10, 10, 10, 10)
    with pytest.raises(ValueError, match="degenerate"):
        proportion_ztest(degenerate, "s", "arm")
