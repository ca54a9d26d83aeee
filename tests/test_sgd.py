"""Stochastic SGD regressions (reference stochastic*Regression semantics:
per-block mini-batch SGD, states merge-averaged)."""

import numpy as np
import pandas as pd
import pytest

from fast_causal_inference_spark.operators.logistic import (
    stochastic_linear_regression,
    stochastic_logistic_regression,
)


@pytest.fixture(scope="module")
def lin_df(spark):
    rng = np.random.default_rng(11)
    n = 8000
    x1 = rng.normal(0, 1, n)
    x2 = rng.normal(0, 1, n)
    y = 1.0 + 2.0 * x1 - 1.5 * x2 + rng.normal(0, 0.5, n)
    z = 0.5 + 1.5 * x1
    p = 1 / (1 + np.exp(-z))
    yb = (rng.uniform(0, 1, n) < p).astype(float)
    return spark.createDataFrame(pd.DataFrame(
        {"x1": x1, "x2": x2, "y": y, "yb": yb})).repartition(4).cache()


def test_sgd_linear_recovers_coefficients(spark, lin_df):
    m = stochastic_linear_regression(lin_df, "y ~ x1 + x2",
                                     learning_rate=0.05, l1=0.0,
                                     batch_size=32, epochs=30, seed=3)
    assert m.beta == pytest.approx([1.0, 2.0, -1.5], abs=0.15)
    scored = m.predict(lin_df).select("prediction", "y").toPandas()
    assert np.corrcoef(scored.prediction, scored.y)[0, 1] > 0.95


def test_sgd_momentum_and_nesterov(spark, lin_df):
    for method in ("Momentum", "Nesterov", "Adam"):
        m = stochastic_linear_regression(lin_df, "y ~ x1 + x2",
                                         learning_rate=0.01, l1=0.0,
                                         batch_size=32, epochs=20,
                                         method=method, seed=3)
        assert m.beta[1] == pytest.approx(2.0, abs=0.4), method


def test_sgd_lasso_shrinks_noise_feature(spark):
    rng = np.random.default_rng(5)
    n = 6000
    x1 = rng.normal(0, 1, n)
    noise = rng.normal(0, 1, n)
    y = 2.0 * x1 + rng.normal(0, 0.3, n)
    df = spark.createDataFrame(pd.DataFrame(
        {"x1": x1, "noise": noise, "y": y})).repartition(4)
    dense = stochastic_linear_regression(df, "y ~ x1 + noise",
                                         learning_rate=0.05, l1=0.0,
                                         batch_size=32, epochs=25, seed=2)
    sparse = stochastic_linear_regression(df, "y ~ x1 + noise",
                                          learning_rate=0.05, l1=0.5,
                                          batch_size=32, epochs=25,
                                          method="Lasso", seed=2)
    assert abs(sparse.beta[2]) < abs(dense.beta[2]) + 1e-9
    assert abs(sparse.beta[2]) < 0.05          # noise coef ~zeroed
    assert sparse.beta[1] > 1.0                # signal survives


def test_sgd_logistic_direction(spark, lin_df):
    m = stochastic_logistic_regression(lin_df, "yb ~ x1 + x2",
                                       learning_rate=0.1, l1=0.0,
                                       batch_size=32, epochs=30, seed=3)
    assert m.beta == pytest.approx([0.5, 1.5, 0.0], abs=0.3)
    from fast_causal_inference_spark.operators.logistic import auc
    scored = m.predict(lin_df, "score")
    assert auc(scored, "score", "yb") > 0.75


def test_sgd_deterministic(spark, lin_df):
    a = stochastic_linear_regression(lin_df, "y ~ x1", epochs=2,
                                     learning_rate=0.01, seed=9)
    b = stochastic_linear_regression(lin_df, "y ~ x1", epochs=2,
                                     learning_rate=0.01, seed=9)
    assert a.beta == pytest.approx(b.beta, rel=1e-12)
