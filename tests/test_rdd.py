"""Regression discontinuity: sharp + fuzzy vs a numpy WLS oracle."""

import numpy as np
import pandas as pd
import pytest


def _wls(x, y, w):
    """Numpy WLS of y on [1, x]: (a, b, var_a, resid-cross helper)."""
    X = np.column_stack([np.ones_like(x), x])
    XtW = X.T * w
    G = XtW @ X
    beta = np.linalg.solve(G, XtW @ y)
    e = y - X @ beta
    n = len(x)
    sigma2 = float(np.sum(w * e * e)) / (n - 2)
    cov = sigma2 * np.linalg.inv(G)
    return beta[0], beta[1], cov[0, 0], e


def _oracle_sharp(pdf, cutoff, h):
    x = pdf.run.to_numpy() - cutoff
    y = pdf.y.to_numpy()
    w = np.clip(1 - np.abs(x / h), 0, None)
    res = {}
    for side, m in (("l", (x < 0) & (w > 0)), ("r", (x >= 0) & (w > 0))):
        a, b, va, _ = _wls(x[m], y[m], w[m])
        res[side] = (a, b, va, m.sum())
    tau = res["r"][0] - res["l"][0]
    se = np.sqrt(res["r"][2] + res["l"][2])
    return tau, se, res


def test_rdd_sharp_matches_numpy(spark):
    from fast_causal_inference_spark.operators.rdd import (
        regression_discontinuity,
    )

    rng = np.random.default_rng(23)
    n = 20000
    run = rng.uniform(-2, 2, n)
    jump = 1.5
    y = 3 + 0.8 * run + jump * (run >= 0) + rng.normal(0, 1, n)
    pdf = pd.DataFrame({"run": run, "y": y})
    out = regression_discontinuity(
        spark.createDataFrame(pdf), "y", "run", cutoff=0.0,
        bandwidth=0.75).iloc[0]
    tau, se, res = _oracle_sharp(pdf, 0.0, 0.75)
    assert float(out.estimate) == pytest.approx(tau, rel=1e-9)
    assert float(out.stderr) == pytest.approx(se, rel=1e-9)
    assert float(out.n_left) == res["l"][3]
    assert float(out.n_right) == res["r"][3]
    assert float(out.slope_left) == pytest.approx(res["l"][1], rel=1e-9)
    # the design recovers the planted jump
    assert abs(float(out.estimate) - jump) < 4 * float(out.stderr)
    assert float(out.p_value) < 1e-6


def test_rdd_nonzero_cutoff_and_kernels(spark):
    from fast_causal_inference_spark.operators.rdd import (
        regression_discontinuity,
    )

    rng = np.random.default_rng(29)
    n = 8000
    run = rng.uniform(10, 30, n)
    y = run * 0.5 + 2.0 * (run >= 20) + rng.normal(0, 1, n)
    df = spark.createDataFrame(pd.DataFrame({"run": run, "y": y}))
    for kernel in ("triangular", "rectangular", "epanechnikov"):
        out = regression_discontinuity(df, "y", "run", cutoff=20.0,
                                       bandwidth=5.0, kernel=kernel).iloc[0]
        assert abs(float(out.estimate) - 2.0) < 5 * float(out.stderr), kernel


def test_rdd_fuzzy_local_wald(spark):
    """Fuzzy RDD: treatment jumps 0.2 -> 0.8 at the cutoff; ITT jump of
    0.6*tau scales back up to tau via the local Wald ratio."""
    from fast_causal_inference_spark.operators.rdd import (
        regression_discontinuity,
    )

    rng = np.random.default_rng(31)
    n = 40000
    run = rng.uniform(-1, 1, n)
    p = np.where(run >= 0, 0.8, 0.2)
    t = (rng.uniform(0, 1, n) < p).astype(float)
    tau = 2.0
    y = 1 + 0.5 * run + tau * t + rng.normal(0, 1, n)
    df = spark.createDataFrame(pd.DataFrame({"run": run, "y": y, "t": t}))
    out = regression_discontinuity(df, "y", "run", cutoff=0.0,
                                   bandwidth=0.5, treatment="t").iloc[0]
    assert float(out.jump_t) == pytest.approx(0.6, abs=0.05)
    assert abs(float(out.estimate) - tau) < 4 * float(out.stderr)
    sharp = regression_discontinuity(df, "y", "run", cutoff=0.0,
                                     bandwidth=0.5).iloc[0]
    # ITT (sharp on Y) ~ 0.6 * tau; the Wald ratio rescales it
    assert float(out.estimate) == pytest.approx(
        float(sharp.estimate) / float(out.jump_t), rel=1e-9)


def test_rdd_guards(spark):
    from fast_causal_inference_spark.operators.rdd import (
        regression_discontinuity,
    )

    df = spark.createDataFrame(
        pd.DataFrame({"run": np.linspace(-1, 1, 100),
                      "y": np.ones(100)}))
    with pytest.raises(ValueError, match="bandwidth"):
        regression_discontinuity(df, "y", "run", 0.0, -1.0)
    with pytest.raises(ValueError, match="kernel"):
        regression_discontinuity(df, "y", "run", 0.0, 0.5, kernel="gauss")
    with pytest.raises(ValueError, match="at least 3"):
        regression_discontinuity(df, "y", "run", 0.0, 0.005)
    # NULL outcomes drop from both sums and counts
    pdf = pd.DataFrame({"run": np.linspace(-1, 1, 2001),
                        "y": np.linspace(-1, 1, 2001) * 2.0})
    pdf.loc[pdf.index % 5 == 0, "y"] = np.nan
    out = regression_discontinuity(
        spark.createDataFrame(pdf), "y", "run", 0.0, 0.8).iloc[0]
    kept = pdf[pdf.y.notna()]
    x = kept.run.to_numpy()
    w = np.clip(1 - np.abs(x / 0.8), 0, None)
    assert float(out.n_left) == ((x < 0) & (w > 0)).sum()
    assert float(out.n_right) == ((x >= 0) & (w > 0)).sum()


def test_mccrary_density_smooth_vs_manipulated(spark):
    """Continuous density -> no jump detected; sorting across the cutoff
    (mass pushed from just-left to just-right) -> strong positive jump."""
    from fast_causal_inference_spark.operators.rdd import (
        mccrary_density_test,
    )

    rng = np.random.default_rng(37)
    n = 60000
    smooth = rng.uniform(-1, 1, n)
    out = mccrary_density_test(
        spark.createDataFrame(pd.DataFrame({"run": smooth})), "run",
        cutoff=0.0, bin_width=0.02, bandwidth=0.4).iloc[0]
    assert abs(float(out.theta)) < 3.5 * float(out.stderr)
    # uniform density = 0.5 on [-1, 1]
    assert float(out.f_left) == pytest.approx(0.5, rel=0.1)
    assert float(out.f_right) == pytest.approx(0.5, rel=0.1)

    manip = smooth.copy()
    push = (manip > -0.05) & (manip < 0)   # sorters jump the threshold
    manip[push] = -manip[push]
    out2 = mccrary_density_test(
        spark.createDataFrame(pd.DataFrame({"run": manip})), "run",
        cutoff=0.0, bin_width=0.02, bandwidth=0.4).iloc[0]
    assert float(out2.theta) > 0
    assert float(out2.p_value) < 1e-4


def test_mccrary_guards(spark):
    from fast_causal_inference_spark.operators.rdd import (
        mccrary_density_test,
    )

    df = spark.createDataFrame(
        pd.DataFrame({"run": np.linspace(-1, 1, 200)}))
    with pytest.raises(ValueError, match="bin_width"):
        mccrary_density_test(df, "run", 0.0, -0.1, 0.5)
    with pytest.raises(ValueError, match="histogram bins"):
        mccrary_density_test(df, "run", 0.0, 0.5, 0.5)


def test_rdd_fuzzy_null_treatment_dropped(spark):
    """Rows with NULL treatment must drop from ALL fuzzy moments (shared
    row set), not just the t-moments — else the treatment fit solves
    inconsistent normal equations (silently imputing t=0)."""
    from fast_causal_inference_spark.operators.rdd import (
        regression_discontinuity,
    )

    rng = np.random.default_rng(47)
    n = 20000
    run = rng.uniform(-1, 1, n)
    t = (run >= 0).astype(float)
    y = 1 + 0.5 * run + 2.0 * t + rng.normal(0, 1, n)
    pdf = pd.DataFrame({"run": run, "y": y, "t": t})
    nullmask = rng.uniform(0, 1, n) < 0.3
    with_nulls = pdf.copy()
    with_nulls.loc[nullmask, "t"] = np.nan
    out = regression_discontinuity(
        spark.createDataFrame(with_nulls), "y", "run", 0.0, 0.5,
        treatment="t").iloc[0]
    # complete-case oracle: exactly the rows with observed t
    want = regression_discontinuity(
        spark.createDataFrame(pdf[~nullmask]), "y", "run", 0.0, 0.5,
        treatment="t").iloc[0]
    for c in ("estimate", "stderr", "jump_t", "n_left", "n_right"):
        assert float(out[c]) == pytest.approx(float(want[c]), rel=1e-12), c
    assert float(out.jump_t) == pytest.approx(1.0, abs=1e-9)


def test_mccrary_discrete_running_variable(spark):
    """Empty grid bins count as density 0: an integer-valued running
    variable at bin_width 0.2 must NOT read ~5x the true density."""
    from fast_causal_inference_spark.operators.rdd import (
        mccrary_density_test,
    )

    rng = np.random.default_rng(53)
    run = rng.integers(-10, 11, 50000).astype(float)   # uniform on 21 ints
    out = mccrary_density_test(
        spark.createDataFrame(pd.DataFrame({"run": run})), "run",
        cutoff=0.5, bin_width=0.2, bandwidth=4.0).iloc[0]
    # true density of a discrete uniform smoothed over its grid ~ 1/21
    assert float(out.f_left) == pytest.approx(1 / 21, rel=0.2)
    assert float(out.f_right) == pytest.approx(1 / 21, rel=0.2)
    assert abs(float(out.theta)) < 4 * float(out.stderr)
