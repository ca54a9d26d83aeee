"""Grambsch-Therneau PH test: numpy mirror + null/alternative power."""

import numpy as np
import pandas as pd
import pytest

from fast_causal_inference_spark.operators.survival import (
    cox_ph,
    proportional_hazards_test,
)


def _simulate(nonprop: bool, n: int = 2500, seed: int = 4):
    rng = np.random.default_rng(seed)
    x = rng.normal(size=n)
    z = rng.integers(0, 2, n).astype(float)
    if nonprop:
        # piecewise effect of x: +0.8 early, -0.8 late — grossly
        # non-proportional; generate by mixing two exponential regimes
        t = np.where(rng.uniform(size=n) < 0.5,
                     rng.exponential(1.0 / np.exp(0.8 * x)),
                     2.0 + rng.exponential(1.0 / np.exp(-0.8 * x)))
    else:
        t = rng.exponential(1.0 / np.exp(0.5 * x + 0.3 * z))
    c = rng.exponential(4.0, n)
    obs = np.minimum(t, c)
    # coarse rounding keeps the time grid bounded (ties OK for Breslow)
    return pd.DataFrame({"t": np.ceil(obs * 20) / 20.0,
                         "e": (t <= c).astype(float), "x": x, "z": z})


def _np_gt_test(pdf, beta, transform="rank"):
    """Direct per-event-time mirror of the GT score test."""
    k = beta.shape[0]
    X = pdf[["x", "z"]].to_numpy()[:, :k]
    t, e = pdf.t.to_numpy(), pdf.e.to_numpy()
    w = np.exp(X @ beta)
    ev_times = np.sort(np.unique(t[e == 1]))
    recs = []
    for tm in ev_times:
        risk = t >= tm
        S0 = w[risk].sum()
        xbar = (w[risk, None] * X[risk]).sum(axis=0) / S0
        V = ((w[risk, None, None] * X[risk][:, :, None]
              * X[risk][:, None, :]).sum(axis=0) / S0
             - np.outer(xbar, xbar))
        at = (t == tm) & (e == 1)
        d = at.sum()
        s = X[at].sum(axis=0) - d * xbar
        recs.append((d, s, V))
    if transform == "rank":
        g = np.arange(1, len(ev_times) + 1, dtype=float)
    else:
        g = ev_times
    ds = np.array([r[0] for r in recs], dtype=float)
    gc = g - (g * ds).sum() / ds.sum()
    u = sum(gi * r[1] for gi, r in zip(gc, recs))
    H = sum(r[0] * r[2] for r in recs)
    Igg = sum(gi * gi * r[0] * r[2] for gi, r in zip(gc, recs))
    Igb = sum(gi * r[0] * r[2] for gi, r in zip(gc, recs))
    D = Igg - Igb @ np.linalg.pinv(H) @ Igb.T
    chi2 = float(u @ np.linalg.pinv(D) @ u)
    return chi2, u, D


def test_matches_numpy_mirror(spark):
    pdf = _simulate(nonprop=False, n=800)
    sdf = spark.createDataFrame(pdf).repartition(8)
    fit = cox_ph(sdf, "t", "e", ["x", "z"])
    beta = fit.coef.to_numpy()
    out = proportional_hazards_test(sdf, "t", "e", ["x", "z"], beta=beta,
                                    transform="rank")
    chi2_np, u_np, D_np = _np_gt_test(pdf, beta, "rank")
    g_row = out[out.name == "GLOBAL"].iloc[0]
    assert g_row.chi2 == pytest.approx(chi2_np, rel=1e-8)
    for i, nm in enumerate(["x", "z"]):
        r = out[out.name == nm].iloc[0]
        assert r.chi2 == pytest.approx(u_np[i] ** 2 / D_np[i, i], rel=1e-8)


def test_null_vs_alternative(spark):
    null_p, alt_p = [], []
    for seed in (1, 2, 3):
        pn = _simulate(nonprop=False, seed=seed)
        pa = _simulate(nonprop=True, seed=seed)
        sn = spark.createDataFrame(pn)
        sa = spark.createDataFrame(pa)
        null_p.append(proportional_hazards_test(
            sn, "t", "e", ["x", "z"])[lambda d: d.name == "GLOBAL"]
            .p_value.iloc[0])
        alt_p.append(proportional_hazards_test(
            sa, "t", "e", ["x"])[lambda d: d.name == "x"]
            .p_value.iloc[0])
    # proportional DGP: no rejection storm; reversing effect: decisive
    assert np.median(null_p) > 0.05
    assert max(alt_p) < 1e-6


def test_km_transform_and_validation(spark):
    pdf = _simulate(nonprop=False, n=600)
    sdf = spark.createDataFrame(pdf)
    out = proportional_hazards_test(sdf, "t", "e", ["x"], transform="km")
    assert set(out.name) == {"x", "GLOBAL"}
    assert out.attrs["transform"] == "km"
    assert (out.p_value.between(0, 1)).all()
    with pytest.raises(ValueError, match="transform"):
        proportional_hazards_test(sdf, "t", "e", ["x"], transform="bogus")
    with pytest.raises(ValueError, match="covariates"):
        proportional_hazards_test(sdf, "t", "e", [])
