"""Logistic regression by IRLS over Gramian aggregations, + distributed AUC.

Parity target: reference ``regression.py:45-255`` (``Logistic(tol, iter)`` —
each IRLS iteration is ONE engine aggregation of a weighted Gramian, solved on
the driver) and the CH ``stochasticLogisticRegression`` facade
(``regression.py:553-764``; exact SGD semantics intentionally not replicated —
MLlib's LBFGS logistic is the Spark-native equivalent, available via
``use_mllib=True``).

Each iteration shuffles O(k²) doubles; row-scale work stays in codegen.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass
class LogisticModel:
    feature_exprs: list[str]
    use_bias: bool
    beta: np.ndarray
    stderr: np.ndarray
    n: float
    n_iter: int
    converged: bool
    names: list[str] = field(default_factory=list)

    def __post_init__(self):
        if not self.names:
            self.names = ((["(Intercept)"] if self.use_bias else [])
                          + list(self.feature_exprs))

    def logit_column(self) -> Column:
        out: Column = F.lit(float(self.beta[0])) if self.use_bias else F.lit(0.0)
        coefs = self.beta[1:] if self.use_bias else self.beta
        for b, e in zip(coefs, self.feature_exprs):
            out = out + float(b) * F.expr(e).cast("double")
        return out

    def predict_proba_column(self) -> Column:
        z = self.logit_column()
        return F.lit(1.0) / (F.lit(1.0) + F.exp(-z))

    def predict(self, df: DataFrame, alias: str = "probability") -> DataFrame:
        return df.withColumn(alias, self.predict_proba_column())

    @property
    def z_values(self) -> np.ndarray:
        with np.errstate(divide="ignore", invalid="ignore"):
            return self.beta / self.stderr

    @property
    def p_values(self) -> np.ndarray:
        from fast_causal_inference_spark import stats_distributions as dist

        return 2.0 * dist.norm_sf(np.abs(self.z_values))

    def coef_table(self):
        import pandas as pd

        return pd.DataFrame({"name": self.names, "estimate": self.beta,
                             "stderr": self.stderr, "z_value": self.z_values,
                             "p_value": self.p_values})


def logistic_regression(df: DataFrame, formula: str, use_bias: bool = True,
                        max_iter: int = 25, tol: float = 1e-8,
                        use_mllib: bool = False) -> LogisticModel:
    """Fit ``'y ~ x1 + x2'`` (y ∈ {0,1}) by IRLS driver loop.

    Per iteration: one agg of Σ s·xxᵀ and Σ s·x·z (z = working response)
    → driver solve. Standard errors from the final weighted Gramian inverse.
    """
    from fast_causal_inference_spark.operators.ols import parse_r_formula

    y_expr, feats = parse_r_formula(formula)
    if use_mllib:
        return _mllib_logistic(df, y_expr, feats, use_bias, max_iter, tol)
    k = len(feats)
    p = k + (1 if use_bias else 0)
    xs = ([F.lit(1.0)] if use_bias else []) + \
        [F.expr(e).cast("double") for e in feats]
    y = F.expr(y_expr).cast("double")

    beta = np.zeros(p)
    n = None
    converged = False
    it = 0
    for it in range(1, max_iter + 1):
        eta: Column = F.lit(float(beta[0])) * xs[0]
        for j in range(1, p):
            eta = eta + F.lit(float(beta[j])) * xs[j]
        mu = F.lit(1.0) / (F.lit(1.0) + F.exp(-eta))
        s = mu * (1 - mu) + F.lit(1e-10)
        z = eta + (y - mu) / s
        aggs = []
        for i in range(p):
            aggs.append(F.sum(s * xs[i] * z).alias(f"b{i}"))
            for j in range(i, p):
                aggs.append(F.sum(s * xs[i] * xs[j]).alias(f"a{i}_{j}"))
        aggs.append(F.count(F.lit(1)).alias("n__"))
        row = df.agg(*aggs).collect()[0]
        n = float(row["n__"])
        A = np.empty((p, p))
        b = np.empty(p)
        for i in range(p):
            b[i] = row[f"b{i}"]
            for j in range(i, p):
                A[i, j] = A[j, i] = row[f"a{min(i,j)}_{max(i,j)}"]
        new_beta = np.linalg.solve(A, b)
        delta = float(np.max(np.abs(new_beta - beta)))
        beta = new_beta
        if delta < tol:
            converged = True
            break
    # SE from inv of final Fisher information (= weighted Gramian A)
    stderr = np.sqrt(np.maximum(np.diag(np.linalg.inv(A)), 0.0))
    return LogisticModel(feature_exprs=feats, use_bias=use_bias, beta=beta,
                         stderr=stderr, n=n, n_iter=it, converged=converged)


def _mllib_logistic(df, y_expr, feats, use_bias, max_iter, tol) -> LogisticModel:
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import VectorAssembler

    prepared = df.select(F.expr(y_expr).cast("double").alias("__label"),
                         *[F.expr(e).cast("double").alias(f"__f{i}")
                           for i, e in enumerate(feats)])
    va = VectorAssembler(inputCols=[f"__f{i}" for i in range(len(feats))],
                         outputCol="__features")
    lr = LogisticRegression(featuresCol="__features", labelCol="__label",
                            maxIter=max_iter, tol=tol, fitIntercept=use_bias,
                            regParam=0.0)
    m = lr.fit(va.transform(prepared))
    beta = np.array(([m.intercept] if use_bias else []) +
                    list(m.coefficients.toArray()))
    return LogisticModel(feature_exprs=feats, use_bias=use_bias, beta=beta,
                         stderr=np.full(len(beta), np.nan),
                         n=float(prepared.count()),
                         n_iter=m.summary.totalIterations, converged=True)


def auc(df: DataFrame, score: str, label: str) -> float:
    """Distributed ROC-AUC via the rank formula (one Mann-Whitney pass):
    AUC = (R₁ − n₁(n₁+1)/2) / (n₀·n₁) with average ranks on score ties."""
    from fast_causal_inference_spark.operators.mann_whitney import (
        mann_whitney_utest,
    )

    res = mann_whitney_utest(df, score, label, continuity_correction=False)
    r = res.iloc[0]
    return float(r.u1 / (r.n0 * r.n1))


# thin facades mirroring the reference's stochastic_* surface ---------------


def stochastic_logistic_regression(df: DataFrame, formula: str,
                                   l1: float = 0.0, **kwargs):
    """Reference stochasticLogisticRegression facade → MLlib logistic
    (elasticNet for the Lasso updater)."""
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import VectorAssembler
    from fast_causal_inference_spark.operators.ols import parse_r_formula

    y_expr, feats = parse_r_formula(formula)
    prepared = df.select(F.expr(y_expr).cast("double").alias("__label"),
                         *[F.expr(e).cast("double").alias(f"__f{i}")
                           for i, e in enumerate(feats)])
    va = VectorAssembler(inputCols=[f"__f{i}" for i in range(len(feats))],
                         outputCol="__features")
    lr = LogisticRegression(featuresCol="__features", labelCol="__label",
                            regParam=l1, elasticNetParam=1.0 if l1 > 0 else 0.0,
                            **kwargs)
    return lr.fit(va.transform(prepared))


def stochastic_linear_regression(df: DataFrame, formula: str,
                                 l1: float = 0.0, **kwargs):
    """Reference stochasticLinearRegression facade → MLlib linear regression
    (elasticNet=1 reproduces the Lasso updater)."""
    from pyspark.ml.regression import LinearRegression
    from pyspark.ml.feature import VectorAssembler
    from fast_causal_inference_spark.operators.ols import parse_r_formula

    y_expr, feats = parse_r_formula(formula)
    prepared = df.select(F.expr(y_expr).cast("double").alias("__label"),
                         *[F.expr(e).cast("double").alias(f"__f{i}")
                           for i, e in enumerate(feats)])
    va = VectorAssembler(inputCols=[f"__f{i}" for i in range(len(feats))],
                         outputCol="__features")
    lr = LinearRegression(featuresCol="__features", labelCol="__label",
                          regParam=l1, elasticNetParam=1.0 if l1 > 0 else 0.0,
                          **kwargs)
    return lr.fit(va.transform(prepared))
