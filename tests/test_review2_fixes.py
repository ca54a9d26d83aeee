"""Regression tests for the second round-6 review pass: conformal rank
exactness, AME/ATT complete-case replication, rmst domain validation,
OPE degenerate-input guards, and the driver-side pooled Oaxaca fit."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F


def test_conformal_quantile_is_exact_order_statistic(spark):
    """n=564 per calibration arm: rank = ceil(565*0.9) = 509, and
    509/564*564 rounds UP in floats — the probe must still return the
    509th order statistic, not the 510th."""
    from fast_causal_inference_spark.operators.conformal import (
        conformal_fit,
    )

    rng = np.random.default_rng(5)
    n_cal = 564
    # fold 1 (calibration) gets exactly 564 rows per arm; fold 0 fits
    rows = []
    i = 0
    for arm in (0, 1):
        for fold in (0, 1):
            cnt = n_cal if fold == 1 else 300
            for _ in range(cnt):
                rows.append((i, arm, fold, float(rng.normal()),
                             float(rng.normal())))
                i += 1
    pdf = pd.DataFrame(rows, columns=["id", "arm", "fold", "x", "eps"])
    pdf["y"] = 2.0 + 0.5 * pdf.x + pdf.eps + 3.0 * pdf.arm
    df = spark.createDataFrame(pdf)
    m = conformal_fit(df, "y", "arm", ["x"], alpha=0.1,
                      fold_expr="fold")
    # recompute the exact order statistic per arm on the driver
    for arm, q_hat, mu in ((1, m.q1, m.mu1), (0, m.q0, m.mu0)):
        cal = pdf[(pdf.arm == arm) & (pdf.fold == 1)]
        pred = mu.beta[0] + mu.beta[1] * cal.x.to_numpy()
        scores = np.sort(np.abs(cal.y.to_numpy() - pred))
        rank = int(np.ceil((n_cal + 1) * 0.9))
        assert q_hat == pytest.approx(scores[rank - 1], abs=1e-12), \
            f"arm {arm}: got {q_hat}, exact {scores[rank-1]} " \
            f"(rank+1 would be {scores[rank]})"


def test_ame_replicates_fit_complete_case(spark):
    """Rows with NULL outcome must not re-enter the AME Fisher rebuild:
    AME on a frame WITH null-y rows == AME on the frame without them."""
    from fast_causal_inference_spark.operators.glm import glm
    from fast_causal_inference_spark.operators.margins import (
        average_marginal_effects,
    )

    rng = np.random.default_rng(11)
    n = 400
    pdf = pd.DataFrame({"x": rng.normal(0, 1, n)})
    pdf["y"] = rng.poisson(np.exp(0.3 + 0.2 * pdf.x)).astype(float)
    pdf.loc[: n // 5, "y"] = None          # 20% NULL outcomes
    df = spark.createDataFrame(pdf)
    clean = spark.createDataFrame(pdf.dropna())
    m = glm(df, "y ~ x", family="poisson")
    assert m.y_expr == "y"
    a_full = average_marginal_effects(m, df)
    a_clean = average_marginal_effects(m, clean)
    assert a_full.ame.iloc[0] == pytest.approx(a_clean.ame.iloc[0])
    assert a_full.stderr.iloc[0] == pytest.approx(a_clean.stderr.iloc[0])


def test_entropy_att_ignores_null_outcomes(spark):
    from fast_causal_inference_spark.operators.balancing import (
        entropy_balancing,
    )

    rng = np.random.default_rng(3)
    n = 600
    pdf = pd.DataFrame({"t": (np.arange(n) % 2),
                        "x": rng.normal(0, 1, n)})
    pdf["y"] = 1.0 + pdf.x + 2.0 * pdf.t + rng.normal(0, 0.5, n)
    eb = entropy_balancing(spark.createDataFrame(pdf), "t", ["x"])
    att_clean = eb.att(spark.createDataFrame(pdf), "y").iloc[0]
    pdf2 = pd.concat([pdf, pd.DataFrame(
        {"t": [1, 1, 0, 0], "x": [0.1, -0.2, 0.3, 0.0],
         "y": [None] * 4})], ignore_index=True)
    att_nulls = eb.att(spark.createDataFrame(pdf2), "y").iloc[0]
    # the 4 NULL-y rows must simply drop out of the outcome means
    assert att_nulls["ATT"] == pytest.approx(att_clean["ATT"], rel=1e-6)


def test_rmst_rejects_negative_times(spark):
    from fast_causal_inference_spark.operators.survival import rmst

    pdf = pd.DataFrame({"t": [-1.0, 2.0, 3.0], "e": [1, 1, 0]})
    with pytest.raises(ValueError, match="negative event time"):
        rmst(spark.createDataFrame(pdf), "t", "e", tau=2.5)


def test_ope_ips_zero_support_raises_cleanly(spark):
    from fast_causal_inference_spark.operators.offpolicy import ope_ips

    pdf = pd.DataFrame({"r": [1.0, 0.0, 1.0], "a": [0, 0, 0]})
    df = spark.createDataFrame(pdf)
    # target policy never takes the logged action -> every weight is 0
    with pytest.raises(ValueError, match="no support"):
        ope_ips(df, "r", target_prob=F.lit(0.0), logging_prob=F.lit(0.5))


def test_oaxaca_pooled_matches_direct_refit(spark):
    """The driver-side summed-Gramian pooled fit must equal a direct
    pooled OLS refit (same betas to float precision)."""
    from fast_causal_inference_spark.operators.decompose import (
        oaxaca_blinder,
    )
    from fast_causal_inference_spark.operators.ols import ols

    rng = np.random.default_rng(7)
    n = 500
    pdf = pd.DataFrame({"g": np.arange(n) % 2,
                        "x": rng.normal(0, 1, n)})
    pdf["y"] = 1.0 + 0.8 * pdf.x + 0.5 * pdf.g + rng.normal(0, 1, n)
    df = spark.createDataFrame(pdf)
    ob = oaxaca_blinder(df, "y", "g", ["x"], reference="pooled")
    direct = ols(df, "y ~ x")
    # explained = dx' * beta_pooled_slopes
    xa = pdf[pdf.g == 1].x.mean()
    xb = pdf[pdf.g == 0].x.mean()
    expl = ob[ob.component == "explained"].value.iloc[0]
    assert expl == pytest.approx((xa - xb) * direct.beta[1], rel=1e-9)
    gap = ob[ob.component == "total_gap"].value.iloc[0]
    assert gap == pytest.approx(pdf[pdf.g == 1].y.mean()
                                - pdf[pdf.g == 0].y.mean(), rel=1e-9)
