"""Smoothed quantile regression: exact-QR reference, estimating
equation, intercept-only = sample quantile, monotonicity across tau."""

import numpy as np
import pandas as pd
import pytest

from fast_causal_inference_spark.operators.quantreg import (
    quantile_regression,
)


def _exact_qr_2param(x, y, tau):
    """Exact QR for y ~ 1 + x by basic-solution enumeration: some optimal
    pinball solution interpolates two data points (LP vertex)."""
    n = len(x)
    best, best_loss = None, np.inf
    for i in range(n):
        for j in range(i + 1, n):
            if x[i] == x[j]:
                continue
            b = (y[j] - y[i]) / (x[j] - x[i])
            a = y[i] - b * x[i]
            r = y - a - b * x
            loss = np.sum(r * (tau - (r < 0)))
            if loss < best_loss:
                best_loss, best = loss, (a, b)
    return np.array(best), best_loss


@pytest.fixture(scope="module")
def qr_pdf():
    rng = np.random.default_rng(7)
    n = 240
    x = rng.uniform(0, 2, n)
    # heteroscedastic: conditional tau-quantile slope varies with tau
    y = 1.0 + 2.0 * x + (0.5 + 0.8 * x) * rng.normal(size=n)
    return pd.DataFrame({"x": x, "y": y})


def test_matches_exact_qr_small_n(spark, qr_pdf):
    sdf = spark.createDataFrame(qr_pdf).repartition(8)
    x, y = qr_pdf.x.to_numpy(), qr_pdf.y.to_numpy()
    for tau in (0.25, 0.5, 0.75):
        m = quantile_regression(sdf, "y ~ x", tau=tau, h=0.05)
        exact, exact_loss = _exact_qr_2param(x, y, tau)
        # smoothing bias is O(h^2) at the loss scale; coefficients agree
        # to a few times that
        assert m.beta == pytest.approx(exact, abs=0.2)
        r = y - m.beta[0] - m.beta[1] * x
        loss = np.sum(r * (tau - (r < 0)))
        assert loss <= exact_loss * 1.01 + 0.05
        assert m.converged


def test_estimating_equation_near_zero(spark, qr_pdf):
    sdf = spark.createDataFrame(qr_pdf)
    m = quantile_regression(sdf, "y ~ x", tau=0.3)
    x, y = qr_pdf.x.to_numpy(), qr_pdf.y.to_numpy()
    r = y - m.beta[0] - m.beta[1] * x
    # smoothed EE is exactly zero; the sharp one within kernel slack
    sig = 1.0 / (1.0 + np.exp(-r / m.h))
    ee_smooth = np.array([np.mean(0.3 - (1 - sig)),
                          np.mean((0.3 - (1 - sig)) * x)])
    assert np.abs(ee_smooth).max() < 1e-7
    assert np.abs([np.mean(0.3 - (r < 0)),
                   np.mean((0.3 - (r < 0)) * x)]).max() < 0.05


def test_intercept_only_is_sample_quantile(spark):
    rng = np.random.default_rng(3)
    v = rng.normal(10, 2, 2000)
    sdf = spark.createDataFrame(pd.DataFrame({"y": v, "one": 1.0}))
    for tau in (0.1, 0.5, 0.9):
        m = quantile_regression(sdf, "y ~ one", tau=tau, use_bias=False,
                                h=0.02)
        assert m.beta[0] == pytest.approx(np.quantile(v, tau), abs=0.05)


def test_monotone_and_hetero_slopes(spark, qr_pdf):
    sdf = spark.createDataFrame(qr_pdf).cache()
    ms = {t: quantile_regression(sdf, "y ~ x", tau=t)
          for t in (0.2, 0.5, 0.8)}
    sdf.unpersist()
    # predicted quantiles increase in tau at both ends of the x range
    for xv in (0.2, 1.8):
        preds = [ms[t].beta[0] + ms[t].beta[1] * xv for t in (0.2, 0.5, 0.8)]
        assert preds[0] < preds[1] < preds[2]
    # heteroscedastic DGP: upper-quantile slope > lower-quantile slope
    assert ms[0.8].beta[1] > ms[0.2].beta[1]
    # sandwich SEs are positive and plausibly scaled
    for m in ms.values():
        assert (m.stderr > 0).all() and (m.stderr < 2.0).all()
    tab = ms[0.5].coef_table()
    assert list(tab.name) == ["(Intercept)", "x"]
    assert (tab.p_value < 0.05).all()


def test_validation(spark, qr_pdf):
    sdf = spark.createDataFrame(qr_pdf)
    with pytest.raises(ValueError, match="tau"):
        quantile_regression(sdf, "y ~ x", tau=1.2)
    with pytest.raises(ValueError, match="bandwidth"):
        quantile_regression(sdf, "y ~ x", h=-1.0)
