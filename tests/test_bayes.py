"""Bayesian A/B operators: conjugate math vs Monte Carlo and identities."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from fast_causal_inference_spark.operators.bayes import (
    _expected_loss_beta,
    _p_beta_greater,
    bayes_ab_binary,
    bayes_ab_continuous,
)


def test_p_beta_greater_vs_monte_carlo():
    rng = np.random.default_rng(7)
    for a1, b1, a2, b2 in [(20, 80, 30, 70), (3, 3, 2, 5),
                           (120.5, 380.5, 101.0, 399.0)]:
        mc = (rng.beta(a1, b1, 400_000)
              > rng.beta(a2, b2, 400_000)).mean()
        got = _p_beta_greater(a1, b1, a2, b2)
        assert abs(got - mc) < 4e-3, (a1, b1, a2, b2, got, mc)


def test_p_beta_greater_symmetry_and_bounds():
    p = _p_beta_greater(10, 20, 10, 20)
    assert abs(p - 0.5) < 1e-9  # identical posteriors
    assert _p_beta_greater(100, 10, 10, 100) > 0.999
    q = _p_beta_greater(7, 13, 11, 9)
    assert abs(q + _p_beta_greater(11, 9, 7, 13) - 1.0) < 1e-9


def test_expected_loss_vs_monte_carlo():
    rng = np.random.default_rng(11)
    a1, b1, a2, b2 = 25, 75, 30, 70
    A = rng.beta(a1, b1, 400_000)
    B = rng.beta(a2, b2, 400_000)
    mc = np.maximum(B - A, 0).mean()
    got = _expected_loss_beta(a1, b1, a2, b2)
    assert abs(got - mc) < 4e-4


@pytest.fixture(scope="module")
def ab_events(spark):
    return (spark.range(20000)
            .withColumn("arm", (F.col("id") % 2).cast("int"))
            .withColumn("converted",
                        (F.pmod(F.xxhash64("id", F.lit(3)), F.lit(100))
                         < 10 + 3 * F.col("arm")).cast("int"))
            .withColumn("y",
                        F.pmod(F.xxhash64("id", F.lit(5)), F.lit(1000))
                        .cast("double") / 100.0 + 2.0 * F.col("arm")))


def test_bayes_ab_binary(ab_events):
    out = bayes_ab_binary(ab_events, "converted", "arm")
    assert set(out["arm"]) == {0, 1}
    r1 = out[out.arm == 1].iloc[0]
    r0 = out[out.arm == 0].iloc[0]
    # posterior params are exact suff-stat functions
    assert r1["alpha"] == 1.0 + r1["successes"]
    assert r1["beta"] == 1.0 + r1["n"] - r1["successes"]
    # treatment converts ~13% vs ~10%: it should win decisively
    assert r1["p_beats_other"] > 0.99
    assert abs(r0["p_beats_other"] + r1["p_beats_other"] - 1.0) < 1e-9
    assert r1["expected_loss"] < r0["expected_loss"]
    assert r0["ci_lower"] < r0["posterior_mean"] < r0["ci_upper"]


def test_bayes_ab_continuous(ab_events):
    out = bayes_ab_continuous(ab_events, "y", "arm")
    r1 = out[out.arm == 1].iloc[0]
    r0 = out[out.arm == 0].iloc[0]
    assert r1["posterior_mean"] > r0["posterior_mean"]  # +2 shift
    assert r1["p_beats_other"] > 0.999
    assert r1["expected_loss"] < 1e-3
    assert r0["expected_loss"] > 1.5  # ~ the true +2 gap
    # expected-loss identity: loss0 - loss1 = mean1 - mean0
    assert np.isclose(r0["expected_loss"] - r1["expected_loss"],
                      r1["posterior_mean"] - r0["posterior_mean"],
                      rtol=1e-9)


def test_bayes_missing_arm_raises(ab_events):
    with pytest.raises(ValueError, match="absent"):
        bayes_ab_binary(ab_events, "converted", "arm",
                        treatment_values=(0, 9))
