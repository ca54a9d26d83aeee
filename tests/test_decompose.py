"""Oaxaca-Blinder: numpy closed-form mirror, exact reconstruction,
and behavior on a known DGP."""

import numpy as np
import pandas as pd
import pytest

from fast_causal_inference_spark.operators.decompose import oaxaca_blinder


@pytest.fixture(scope="module")
def gap_pdf():
    rng = np.random.default_rng(13)
    n = 4000
    g = rng.integers(0, 2, n)
    # group A (g=1) has higher x AND a higher slope
    x1 = rng.normal(1.0 + 0.5 * g, 1.0)
    x2 = rng.uniform(size=n)
    y = (2.0 + (1.0 + 0.5 * g) * x1 + 0.5 * x2
         + rng.normal(0, 0.4, n))
    return pd.DataFrame({"g": g, "x1": x1, "x2": x2, "y": y})


def _np_ols(X, y):
    X1 = np.column_stack([np.ones(len(y)), X])
    return np.linalg.solve(X1.T @ X1, X1.T @ y)


def test_matches_numpy_closed_form(spark, gap_pdf):
    sdf = spark.createDataFrame(gap_pdf).repartition(8)
    for ref in ("A", "B", "pooled"):
        out = oaxaca_blinder(sdf, "y", "g", ["x1", "x2"], reference=ref)
        a, b = gap_pdf[gap_pdf.g == 1], gap_pdf[gap_pdf.g == 0]
        bA = _np_ols(a[["x1", "x2"]].to_numpy(), a.y.to_numpy())
        bB = _np_ols(b[["x1", "x2"]].to_numpy(), b.y.to_numpy())
        bP = _np_ols(gap_pdf[["x1", "x2"]].to_numpy(),
                     gap_pdf.y.to_numpy())
        bstar = {"A": bA, "B": bB, "pooled": bP}[ref]
        dx = (a[["x1", "x2"]].mean() - b[["x1", "x2"]].mean()).to_numpy()
        explained = float(dx @ bstar[1:])
        gap = a.y.mean() - b.y.mean()
        vals = out.set_index("component").value
        assert vals["total_gap"] == pytest.approx(gap, rel=1e-9)
        assert vals["explained"] == pytest.approx(explained, rel=1e-7)
        assert vals["unexplained"] == pytest.approx(gap - explained,
                                                   rel=1e-7)
        # decomposition identity + per-covariate additivity
        assert vals["explained"] == pytest.approx(
            vals["explained:x1"] + vals["explained:x2"], rel=1e-9)
        assert out.attrs["reference"] == ref


def test_dgp_semantics(spark, gap_pdf):
    sdf = spark.createDataFrame(gap_pdf)
    out = oaxaca_blinder(sdf, "y", "g", ["x1", "x2"], reference="B")
    vals = out.set_index("component")
    # x1 endowment gap of ~0.5 at slope ~1.0 -> explained:x1 near 0.5
    assert vals.loc["explained:x1", "value"] == pytest.approx(0.5, abs=0.12)
    # slope difference (0.5 per unit x1, x̄_A≈1.5) -> sizable unexplained
    assert vals.loc["unexplained", "value"] > 0.4
    # x2 is balanced across groups: tiny contribution, CI covers 0
    assert abs(vals.loc["explained:x2", "value"]) < 0.05
    assert (vals.loc["explained:x2", "lower"] <= 0
            <= vals.loc["explained:x2", "upper"])
    # SEs behave like root-n statistics
    assert 0 < vals.loc["explained", "stderr"] < 0.2
    assert 0 < vals.loc["unexplained", "stderr"] < 0.2


def test_validation(spark, gap_pdf):
    sdf = spark.createDataFrame(gap_pdf)
    with pytest.raises(ValueError, match="reference"):
        oaxaca_blinder(sdf, "y", "g", ["x1"], reference="C")
    with pytest.raises(ValueError, match="covariate"):
        oaxaca_blinder(sdf, "y", "g", [])
    with pytest.raises(ValueError, match="empty group"):
        oaxaca_blinder(sdf.where("g = 1"), "y", "g", ["x1"])
