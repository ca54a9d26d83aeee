"""Interrupted time series vs an independent numpy HAC implementation."""

import math

import numpy as np
import pandas as pd
import pytest

from fast_causal_inference_spark.operators.its import (
    interrupted_time_series,
)


def _nw_cov(X, e, L):
    """Independent HAC: direct double sum over lag pairs."""
    T, k = X.shape
    S = np.zeros((k, k))
    for i in range(T):
        S += np.outer(X[i] * e[i], X[i] * e[i])
    for lag in range(1, L + 1):
        w = 1 - lag / (L + 1)
        for i in range(lag, T):
            G = np.outer(X[i] * e[i], X[i - lag] * e[i - lag])
            S += w * (G + G.T)
    XtX_inv = np.linalg.inv(X.T @ X)
    return XtX_inv @ S @ XtX_inv * (T / (T - k))


@pytest.fixture(scope="module")
def its_pdf():
    rng = np.random.default_rng(17)
    days = pd.date_range("2024-01-01", periods=120, freq="D")
    t = np.arange(120, dtype=float)
    post = (days >= pd.Timestamp("2024-03-01")).astype(float)
    t0 = float(np.argmax(post))
    mu = 50 + 0.2 * t + 8.0 * post + 0.5 * (t - t0) * post
    # AR(1) daily noise so HAC matters
    eps = np.zeros(120)
    for i in range(1, 120):
        eps[i] = 0.6 * eps[i - 1] + rng.normal(0, 2)
    daily = mu + eps
    rows = []
    for d, m in zip(days, daily):
        for j in range(5):                   # 5 raw events per day
            rows.append({"ts": d + pd.Timedelta(hours=2 * j + 1),
                         "val": float(m + ((j - 2) * 0.5))})
    return pd.DataFrame(rows)


def test_its_matches_numpy_hac(spark, its_pdf):
    sdf = spark.createDataFrame(its_pdf).repartition(8)
    out = interrupted_time_series(sdf, "val", "ts", "2024-03-01",
                                  freq="1 day")
    # rebuild the daily grid + segmented OLS + HAC independently
    g = (its_pdf.assign(day=its_pdf.ts.dt.floor("D"))
         .groupby("day").val.mean().sort_index())
    T = len(g)
    t = np.arange(T, dtype=float)
    post = (g.index >= pd.Timestamp("2024-03-01")).astype(float)
    t0 = float(np.argmax(post))
    X = np.column_stack([np.ones(T), t, post, (t - t0) * post])
    beta = np.linalg.lstsq(X, g.to_numpy(), rcond=None)[0]
    e = g.to_numpy() - X @ beta
    L = int(math.floor(4 * (T / 100) ** (2 / 9)))
    cov = _nw_cov(X, e, L)
    got = dict(zip(out.name, out.coef))
    gse = dict(zip(out.name, out.stderr))
    for i, nm in enumerate(["(Intercept)", "trend", "level_change",
                            "slope_change"]):
        assert got[nm] == pytest.approx(beta[i], abs=1e-8), nm
        assert gse[nm] == pytest.approx(math.sqrt(cov[i, i]), rel=1e-9), nm
    # truth recovery
    assert got["level_change"] == pytest.approx(8.0, abs=2.5)
    assert got["slope_change"] == pytest.approx(0.5, abs=0.12)
    assert got["trend"] == pytest.approx(0.2, abs=0.1)
    # attributable effect = c'β with its delta SE
    c = np.array([0, 0, 1.0, ((t - t0) * post).sum() / post.sum()])
    assert got["attributable_effect"] == pytest.approx(float(c @ beta),
                                                       abs=1e-8)
    assert gse["attributable_effect"] == pytest.approx(
        math.sqrt(c @ cov @ c), rel=1e-9)
    assert out.attrs["n_buckets"] == 120 and out.attrs["nw_lags"] == L
    assert out.attrs["n_post"] == int(post.sum())


def test_its_hac_widens_under_autocorrelation(spark, its_pdf):
    sdf = spark.createDataFrame(its_pdf)
    hac = interrupted_time_series(sdf, "val", "ts", "2024-03-01")
    iid = interrupted_time_series(sdf, "val", "ts", "2024-03-01",
                                  nw_lags=0)
    h = dict(zip(hac.name, hac.stderr))
    i = dict(zip(iid.name, iid.stderr))
    # positive AR(1) → HAC SEs exceed the naive ones for the trend terms
    assert h["trend"] > i["trend"]
    assert h["level_change"] > i["level_change"]


def test_its_validation(spark, its_pdf):
    sdf = spark.createDataFrame(its_pdf)
    with pytest.raises(ValueError, match="agg"):
        interrupted_time_series(sdf, "val", "ts", "2024-03-01", agg="max")
    with pytest.raises(ValueError, match="freq"):
        interrupted_time_series(sdf, "val", "ts", "2024-03-01",
                                freq="13 minutes")
    with pytest.raises(ValueError, match="post"):
        interrupted_time_series(sdf, "val", "ts", "2030-01-01")
    with pytest.raises(ValueError, match="pre"):
        interrupted_time_series(sdf, "val", "ts", "2020-01-01")
    with pytest.raises(ValueError, match="needs a series"):
        interrupted_time_series(sdf.where("ts < '2024-01-03'"), "val",
                                "ts", "2024-01-02")
