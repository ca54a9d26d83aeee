"""Ordered logit vs an independent numpy proportional-odds MLE."""

import math

import numpy as np
import pandas as pd
import pytest

from fast_causal_inference_spark.operators.ordinal import ordered_logit


def _sig(v):
    return 1.0 / (1.0 + np.exp(-v))


def _np_ordered_logit(X, yidx, J, max_iter=60, tol=1e-10):
    """Vectorized Newton on the same likelihood (independent path)."""
    n, k = X.shape
    cum = np.bincount(yidx, minlength=J).cumsum() / n
    th = np.concatenate([np.log(cum[:-1] / (1 - cum[:-1])), np.zeros(k)])

    def score(th):
        alpha = np.concatenate([[-np.inf], th[:J - 1], [np.inf]])
        eta = X @ th[J - 1:]
        A = alpha[yidx + 1] - eta
        B = alpha[yidx] - eta
        sA, sB = _sig(A), _sig(B)
        sA[np.isposinf(A)] = 1.0
        sB[np.isneginf(B)] = 0.0
        fA = np.where(np.isfinite(A), sA * (1 - sA), 0.0)
        fB = np.where(np.isfinite(B), sB * (1 - sB), 0.0)
        fpA = np.where(np.isfinite(A), fA * (1 - 2 * sA), 0.0)
        fpB = np.where(np.isfinite(B), fB * (1 - 2 * sB), 0.0)
        P = sA - sB + 1e-300
        lA, lB = fA / P, -fB / P
        lAA = fpA / P - lA * lA
        lBB = -fpB / P - lB * lB
        lAB = fA * fB / P ** 2
        p_tot = J - 1 + k
        g = np.zeros(p_tot)
        H = np.zeros((p_tot, p_tot))
        for m in range(J - 1):
            u = (yidx == m).astype(float)
            w = (yidx == m + 1).astype(float)
            g[m] = (u * lA + w * lB).sum()
            H[m, m] = (u * lAA + w * lBB).sum()
            if m < J - 2:
                H[m, m + 1] = H[m + 1, m] = (w * lAB).sum()
            hb = -(X * (u * (lAA + lAB) + w * (lAB + lBB))[:, None]) \
                .sum(axis=0)
            H[m, J - 1:] = H[J - 1:, m] = hb
        g[J - 1:] = -(X * (lA + lB)[:, None]).sum(axis=0)
        curv = lAA + 2 * lAB + lBB
        H[J - 1:, J - 1:] = X.T @ (curv[:, None] * X)
        return float(np.log(P).sum()), g, H

    ll, g, H = score(th)
    for _ in range(max_iter):
        step = np.linalg.solve(H, g)
        new = th - step
        ll_n, g_n, H_n = score(new)
        halves = 0
        while (not np.isfinite(ll_n) or ll_n < ll - 1e-12) and halves < 20:
            step /= 2
            new = th - step
            ll_n, g_n, H_n = score(new)
            halves += 1
        done = np.max(np.abs(new - th)) < tol or abs(ll_n - ll) < tol
        th, ll, g, H = new, ll_n, g_n, H_n
        if done:
            break
    se = np.sqrt(np.diag(np.linalg.pinv(-H)))
    return th, se, ll


@pytest.fixture(scope="module")
def ord_pdf():
    rng = np.random.default_rng(13)
    n = 5000
    x1 = rng.normal(0, 1, n)
    x2 = rng.binomial(1, 0.5, n).astype(float)
    eta = 0.8 * x1 - 0.5 * x2
    # latent-variable draw with true cutpoints (-1, 0.5, 1.5)
    u = eta + rng.logistic(0, 1, n)
    grade = np.digitize(u, [-1.0, 0.5, 1.5]) + 1          # 1..4
    return pd.DataFrame({"x1": x1, "x2": x2, "grade": grade})


def test_ordered_logit_matches_numpy_and_truth(spark, ord_pdf):
    sdf = spark.createDataFrame(ord_pdf).repartition(4)
    out = ordered_logit(sdf, "grade ~ x1 + x2")
    X = np.column_stack([ord_pdf.x1, ord_pdf.x2])
    yidx = ord_pdf.grade.to_numpy() - 1
    th, se, ll = _np_ordered_logit(X, yidx, 4)
    got = dict(zip(out.name, out.coef))
    gse = dict(zip(out.name, out.stderr))
    assert got["x1"] == pytest.approx(th[3], abs=1e-6)
    assert got["x2"] == pytest.approx(th[4], abs=1e-6)
    for j, nm in enumerate(["cut_1|2", "cut_2|3", "cut_3|4"]):
        assert got[nm] == pytest.approx(th[j], abs=1e-6)
    assert gse["x1"] == pytest.approx(se[3], abs=1e-6)
    assert gse["cut_1|2"] == pytest.approx(se[0], abs=1e-6)
    assert out.attrs["loglik"] == pytest.approx(ll, abs=1e-5)
    assert out.attrs["converged"] and out.attrs["categories"] == [1, 2, 3, 4]
    # recovers the DGP: slopes and the ordered cutpoints
    assert got["x1"] == pytest.approx(0.8, abs=0.08)
    assert got["x2"] == pytest.approx(-0.5, abs=0.1)
    assert got["cut_1|2"] == pytest.approx(-1.0, abs=0.12)
    assert got["cut_3|4"] == pytest.approx(1.5, abs=0.12)
    cuts = [got["cut_1|2"], got["cut_2|3"], got["cut_3|4"]]
    assert cuts == sorted(cuts)


def test_ordered_logit_binary_equals_logistic(spark, ord_pdf):
    from fast_causal_inference_spark.operators.logistic import (
        logistic_regression,
    )

    pdf = ord_pdf.assign(hi=(ord_pdf.grade >= 3).astype(int))
    sdf = spark.createDataFrame(pdf)
    out = ordered_logit(sdf, "hi ~ x1 + x2")
    lr = logistic_regression(sdf, "hi ~ x1 + x2")
    got = dict(zip(out.name, out.coef))
    # P(y=1) = σ(xβ − α): slopes match, cutpoint = −intercept
    assert got["x1"] == pytest.approx(float(lr.beta[1]), abs=1e-6)
    assert got["x2"] == pytest.approx(float(lr.beta[2]), abs=1e-6)
    assert got["cut_0|1"] == pytest.approx(-float(lr.beta[0]), abs=1e-6)


def test_ordered_logit_validation(spark, ord_pdf):
    sdf = spark.createDataFrame(ord_pdf)
    with pytest.raises(ValueError, match="regressors"):
        ordered_logit(sdf, "grade ~ ")
    with pytest.raises(ValueError, match="2 distinct"):
        ordered_logit(sdf.where("grade = 1"), "grade ~ x1")
    with pytest.raises(ValueError, match="cap"):
        ordered_logit(sdf.selectExpr("x1", "x2",
                                     "row_number() over (order by x1) "
                                     "as grade"),
                      "grade ~ x1")
