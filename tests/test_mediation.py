"""Mediation analysis vs explicit numpy OLS fits and a known DGP."""

import math

import numpy as np
import pandas as pd
import pytest


@pytest.fixture(scope="module")
def med_pdf():
    """t → m (a=0.8) → y (b=1.5) plus direct t → y (c'=0.5) and a shared
    covariate confounding both models."""
    rng = np.random.default_rng(13)
    n = 5000
    x = rng.normal(0, 1, n)
    t = (rng.uniform(0, 1, n) < 0.5).astype(float)
    m = 0.3 + 0.8 * t + 0.4 * x + rng.normal(0, 0.7, n)
    y = 1.0 + 0.5 * t + 1.5 * m + 0.6 * x + rng.normal(0, 1.0, n)
    return pd.DataFrame({"x": x, "t": t, "m": m, "y": y})


@pytest.fixture(scope="module")
def med_df(spark, med_pdf):
    return spark.createDataFrame(med_pdf).repartition(4).cache()


def _np_ols(X, yv):
    beta, *_ = np.linalg.lstsq(X, yv, rcond=None)
    e = yv - X @ beta
    sigma2 = e @ e / (len(yv) - X.shape[1])
    se = np.sqrt(np.diag(sigma2 * np.linalg.inv(X.T @ X)))
    return beta, se


def test_mediation_matches_numpy(med_df, med_pdf):
    from fast_causal_inference_spark.operators.mediation import mediation

    res = mediation(med_df, "y", "t", "m", covariates=["x"])
    one = np.ones(len(med_pdf))
    Xm = np.column_stack([one, med_pdf.t, med_pdf.x])
    Xo = np.column_stack([one, med_pdf.t, med_pdf.m, med_pdf.x])
    bm, sem = _np_ols(Xm, med_pdf.m.to_numpy())
    bo, seo = _np_ols(Xo, med_pdf.y.to_numpy())
    bt, sot = _np_ols(Xm, med_pdf.y.to_numpy())
    assert res.a == pytest.approx(bm[1], abs=1e-8)
    assert res.a_stderr == pytest.approx(sem[1], abs=1e-8)
    assert res.ade == pytest.approx(bo[1], abs=1e-8)
    assert res.b == pytest.approx(bo[2], abs=1e-8)
    assert res.b_stderr == pytest.approx(seo[2], abs=1e-8)
    assert res.total == pytest.approx(bt[1], abs=1e-8)
    assert res.acme == pytest.approx(bm[1] * bo[2], abs=1e-8)
    sobel = math.sqrt(bm[1] ** 2 * seo[2] ** 2 + bo[2] ** 2 * sem[1] ** 2)
    assert res.acme_stderr == pytest.approx(sobel, abs=1e-8)


def test_mediation_recovers_dgp(med_df):
    from fast_causal_inference_spark.operators.mediation import mediation

    res = mediation(med_df, "y", "t", "m", covariates=["x"])
    assert res.acme == pytest.approx(0.8 * 1.5, abs=0.1)
    assert res.ade == pytest.approx(0.5, abs=0.1)
    assert res.total == pytest.approx(0.5 + 1.2, abs=0.12)
    # exact decomposition: total = ADE + ACME with shared covariates
    assert res.total == pytest.approx(res.ade + res.acme, abs=1e-8)
    assert 0.6 < res.prop_mediated < 0.8
    assert res.sobel_p < 1e-6


def test_mediation_no_covariates_and_nulls(spark, med_pdf):
    from fast_causal_inference_spark.operators.mediation import mediation

    pdf = med_pdf.copy()
    pdf.loc[:49, "m"] = np.nan                  # complete-case filtering
    sdf = spark.createDataFrame(pdf)
    res = mediation(sdf, "y", "t", "m")
    assert res.n == len(pdf) - 50
    sub = pdf.dropna()
    one = np.ones(len(sub))
    bm, sem = _np_ols(np.column_stack([one, sub.t]), sub.m.to_numpy())
    bo, seo = _np_ols(np.column_stack([one, sub.t, sub.m]),
                      sub.y.to_numpy())
    assert res.acme == pytest.approx(bm[1] * bo[2], abs=1e-8)


def test_mediation_too_few_rows(spark):
    from fast_causal_inference_spark.operators.mediation import mediation

    tiny = spark.createDataFrame(
        pd.DataFrame({"t": [0.0, 1.0], "m": [1.0, 2.0], "y": [1.0, 3.0]}))
    with pytest.raises(ValueError, match="complete rows"):
        mediation(tiny, "y", "t", "m")
