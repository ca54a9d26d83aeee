"""OLS/WLS/DID/IV vs independent numpy oracles."""

import math

import numpy as np
import pytest

from fast_causal_inference_spark.operators.matrix import matrix_multiplication
from fast_causal_inference_spark.operators.ols import (
    OlsModel,
    did,
    iv_regression,
    ols,
    wls,
)


def np_ols(X, y):
    """Plain numpy OLS with intercept; returns beta, se, r2, sigma2."""
    n, p = X.shape
    beta, *_ = np.linalg.lstsq(X, y, rcond=None)
    resid = y - X @ beta
    ssr = float(resid @ resid)
    sigma2 = ssr / (n - p)
    xtx_inv = np.linalg.inv(X.T @ X)
    se = np.sqrt(np.diag(xtx_inv) * sigma2)
    sst = float(((y - y.mean()) ** 2).sum())
    return beta, se, 1 - ssr / sst, sigma2


def test_ols_matches_numpy(spark, ab_pdf, ab_df):
    m = ols(ab_df, "y ~ x1 + x2 + treatment")
    X = np.column_stack([np.ones(len(ab_pdf)), ab_pdf.x1, ab_pdf.x2,
                         ab_pdf.treatment])
    beta, se, r2, sigma2 = np_ols(X, ab_pdf.y.to_numpy())
    assert m.beta == pytest.approx(beta, rel=1e-8)
    assert m.stderr == pytest.approx(se, rel=1e-7)
    assert m.r2 == pytest.approx(r2, rel=1e-8)
    assert m.sigma2 == pytest.approx(sigma2, rel=1e-7)
    # F-stat consistency: R^2-based formula
    n, p = X.shape
    f = (r2 / (p - 1)) / ((1 - r2) / (n - p))
    assert m.f_stat == pytest.approx(f, rel=1e-7)


def test_ols_no_bias(spark, ab_pdf, ab_df):
    m = ols(ab_df, "y ~ x1 + x2", use_bias=False)
    X = np.column_stack([ab_pdf.x1, ab_pdf.x2])
    beta, *_ = np.linalg.lstsq(X, ab_pdf.y.to_numpy(), rcond=None)
    assert m.beta == pytest.approx(beta, rel=1e-8)
    assert m.names == ["x1", "x2"]


def test_ols_expression_terms(spark, ab_pdf, ab_df):
    m = ols(ab_df, "y ~ x1 + x1*x2")
    X = np.column_stack([np.ones(len(ab_pdf)), ab_pdf.x1, ab_pdf.x1 * ab_pdf.x2])
    beta, *_ = np.linalg.lstsq(X, ab_pdf.y.to_numpy(), rcond=None)
    assert m.beta == pytest.approx(beta, rel=1e-7)


def test_wls_matches_numpy(spark, ab_pdf, ab_df):
    m = wls(ab_df, "y ~ x1 + x2", weight="weight")
    w = ab_pdf.weight.to_numpy()
    X = np.column_stack([np.ones(len(ab_pdf)), ab_pdf.x1, ab_pdf.x2])
    y = ab_pdf.y.to_numpy()
    sw = np.sqrt(w)
    beta, *_ = np.linalg.lstsq(X * sw[:, None], y * sw, rcond=None)
    assert m.beta == pytest.approx(beta, rel=1e-8)
    # weighted sigma2 with df = n_rows - p
    resid = y - X @ beta
    sigma2 = float(w @ resid**2) / (len(y) - 3)
    assert m.sigma2 == pytest.approx(sigma2, rel=1e-7)


def test_predict_and_intervals(spark, ab_pdf, ab_df):
    m = ols(ab_df, "y ~ x1 + x2")
    scored = m.predict(ab_df, interval="confidence").limit(50).toPandas()
    X = np.column_stack([np.ones(len(scored)), scored.x1, scored.x2])
    want = X @ m.beta
    assert scored.prediction.to_numpy() == pytest.approx(want, rel=1e-9)
    assert (scored.prediction_lower < scored.prediction).all()
    assert (scored.prediction_upper > scored.prediction).all()
    # prediction interval strictly wider
    scored_p = m.predict(ab_df, interval="prediction").limit(50).toPandas()
    assert ((scored_p.prediction_upper - scored_p.prediction_lower).to_numpy()
            > (scored.prediction_upper - scored.prediction_lower).to_numpy()).all()


def test_model_json_roundtrip(spark, ab_df):
    m = ols(ab_df, "y ~ x1 + x2")
    m2 = OlsModel.from_json(m.to_json())
    assert m2.beta == pytest.approx(m.beta)
    assert m2.summary() == m.summary()


def test_did_interaction(spark, ab_pdf, ab_df):
    df = ab_df.withColumn("period", (ab_df.x3 > 1).cast("int"))
    pdf = ab_pdf.assign(period=(ab_pdf.x3 > 1).astype(int))
    m = did(df, "y", "treatment", "period")
    X = np.column_stack([np.ones(len(pdf)), pdf.treatment, pdf.period,
                         pdf.treatment * pdf.period])
    beta, se, _, _ = np_ols(X, pdf.y.to_numpy())
    assert m.beta == pytest.approx(beta, rel=1e-8)
    assert "*" in m.names[3]        # interaction term present


def test_iv_2sls_matches_numpy(spark):
    """Simulated endogenous treatment with a valid instrument."""
    rng = np.random.default_rng(7)
    n = 6000
    z = rng.integers(0, 2, n).astype(float)
    u = rng.normal(0, 1, n)                      # confounder
    x = rng.normal(0, 1, n)                      # exogenous covariate
    t = 0.8 * z + 0.5 * u + rng.normal(0, 1, n)  # endogenous
    y = 2.0 + 1.5 * t + 0.7 * x + 1.2 * u + rng.normal(0, 1, n)
    import pandas as pd

    pdf = pd.DataFrame({"y": y, "t": t, "z": z, "x": x})
    df = SparkDF(pdf)
    m = iv_regression(df, "y ~ (t ~ z) + x")

    # numpy 2SLS: stage1 t ~ [1,z,x]; stage2 y ~ [1, that, x]
    Z = np.column_stack([np.ones(n), z, x])
    g1 = np.linalg.lstsq(Z, t, rcond=None)[0]
    that = Z @ g1
    X2 = np.column_stack([np.ones(n), that, x])
    beta = np.linalg.lstsq(X2, y, rcond=None)[0]
    assert m.beta == pytest.approx(beta, rel=1e-6)
    # 2SLS residuals use the REAL t
    Xr = np.column_stack([np.ones(n), t, x])
    resid = y - Xr @ beta
    sigma2 = float(resid @ resid) / (n - 3)
    se = np.sqrt(np.diag(np.linalg.inv(X2.T @ X2)) * sigma2)
    assert m.stderr == pytest.approx(se, rel=1e-6)
    # recovers the true effect within 3 SE (u-confounding would bias plain OLS)
    assert abs(m.beta[1] - 1.5) < 3 * m.stderr[1]
    plain = ols(df, "y ~ t + x")
    assert abs(plain.beta[1] - 1.5) > abs(m.beta[1] - 1.5)


def SparkDF(pdf):
    from pyspark.sql import SparkSession

    return SparkSession.getActiveSession().createDataFrame(pdf).repartition(4)


def test_matrix_multiplication(spark, ab_pdf, ab_df):
    m = matrix_multiplication(ab_df, "x1", "x2", "y")
    X = np.column_stack([ab_pdf.x1, ab_pdf.x2, ab_pdf.y])
    assert m == pytest.approx(X.T @ X, rel=1e-9)
    mi = matrix_multiplication(ab_df, "x1", "x2", std=True, invert=True)
    Xb = np.column_stack([ab_pdf.x1, ab_pdf.x2, np.ones(len(ab_pdf))])
    assert mi == pytest.approx(np.linalg.inv(Xb.T @ Xb), rel=1e-7)


def test_summary_format(spark, ab_df):
    s = ols(ab_df, "y ~ x1 + x2").summary()
    assert "Coefficients:" in s and "R-squared" in s and "F-statistic" in s
    assert "(Intercept)" in s


def test_cluster_robust_ols_matches_numpy(spark):
    """CR1 sandwich vs a direct numpy computation (cluster-correlated
    errors: plain OLS SEs understate, CR1 matches the hand sandwich)."""
    import numpy as np
    import pandas as pd

    from fast_causal_inference_spark.operators.ols import (
        cluster_robust_ols,
        ols,
    )

    rng = np.random.default_rng(12)
    G, m = 40, 25                       # 40 clusters × 25 rows
    n = G * m
    cl = np.repeat(np.arange(G), m)
    u_c = rng.normal(0, 1.0, G)[cl]     # cluster random effect
    x = rng.normal(0, 1, n) + 0.5 * rng.normal(0, 1, G)[cl]
    y = 1.0 + 2.0 * x + u_c + rng.normal(0, 0.5, n)
    d = spark.createDataFrame(
        pd.DataFrame({"y": y, "x": x, "c": cl})).repartition(6)

    model = cluster_robust_ols(d, "y ~ x", "c")
    plain = ols(d, "y ~ x")
    assert model.beta == pytest.approx(plain.beta, rel=1e-9)

    # numpy oracle
    X = np.column_stack([np.ones(n), x])
    beta = np.linalg.solve(X.T @ X, X.T @ y)
    e = y - X @ beta
    meat = np.zeros((2, 2))
    for g in range(G):
        sg = X[cl == g].T @ e[cl == g]
        meat += np.outer(sg, sg)
    bread = np.linalg.inv(X.T @ X)
    corr = (G / (G - 1)) * ((n - 1) / (n - 2))
    V = corr * bread @ meat @ bread
    want_se = np.sqrt(np.diag(V))
    assert model.stderr == pytest.approx(want_se, rel=1e-6)
    # with cluster-correlated errors CR1 > classic SEs
    assert (model.stderr > plain.stderr).all()
    assert model.df_resid == G - 1
    assert (model.p_values <= 1.0).all()


def test_hc_robust_ols_matches_numpy(spark):
    import numpy as np
    import pandas as pd

    from fast_causal_inference_spark.operators.ols import ols, robust_ols

    rng = np.random.default_rng(3)
    n = 3000
    x = rng.normal(0, 1, n)
    # heteroskedastic: error sd grows with |x|
    y = 1.0 + 2.0 * x + rng.normal(0, 0.5 + np.abs(x), n)
    d = spark.createDataFrame(pd.DataFrame({"y": y, "x": x})).repartition(5)
    m = robust_ols(d, "y ~ x", hc="HC1")
    plain = ols(d, "y ~ x")
    assert m.beta == pytest.approx(plain.beta, rel=1e-9)

    X = np.column_stack([np.ones(n), x])
    beta = np.linalg.solve(X.T @ X, X.T @ y)
    e = y - X @ beta
    meat = (X * (e ** 2)[:, None]).T @ X * (n / (n - 2))
    bread = np.linalg.inv(X.T @ X)
    want = np.sqrt(np.diag(bread @ meat @ bread))
    assert m.stderr == pytest.approx(want, rel=1e-6)
    # the slope SE must grow when error variance rises with |x| (the
    # intercept SE can legitimately shrink under the same pattern)
    assert m.stderr[1] > plain.stderr[1]
    with pytest.raises(ValueError, match="hc"):
        robust_ols(d, "y ~ x", hc="HC9")


def test_ols_grouped_weighted_and_nulls(spark):
    """ols_grouped: weighted fits keep Σw df semantics; NULL rows drop
    from the complete-case df_resid in unweighted fits."""
    import numpy as np
    import pandas as pd

    from fast_causal_inference_spark.operators.ols import ols, ols_grouped, wls

    from pyspark.sql import functions as F

    rng = np.random.default_rng(7)
    n = 2000
    pdf = pd.DataFrame({
        "g": np.tile([0, 1], n // 2),
        "x": rng.normal(0, 1, n),
        "w": rng.uniform(0.5, 2.0, n),
    })
    pdf["y"] = 1.0 + 2.0 * pdf.x + rng.normal(0, 1, n)
    pdf.loc[:50, "y"] = np.nan
    df = spark.createDataFrame(pdf)
    models = ols_grouped(df, "y ~ x", "g")
    for gv in (0, 1):
        ref = ols(df.where(F.col("g") == gv), "y ~ x")
        assert models[gv].beta == pytest.approx(ref.beta, rel=1e-9)
        assert models[gv].stderr == pytest.approx(ref.stderr, rel=1e-9)
    wm = ols_grouped(df, "y ~ x", "g", weight="w")
    for gv in (0, 1):
        ref = wls(df.where(F.col("g") == gv), "y ~ x", weight="w")
        assert wm[gv].beta == pytest.approx(ref.beta, rel=1e-9)
