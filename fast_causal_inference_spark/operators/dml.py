"""Double Machine Learning: LinearDML and NonParamDML by k-fold cross-fitting.

Parity targets: reference ``uplift.py:2163-2360`` (LinearDML — folds via
``rowNumberInAllBlocks() %% cv``, per-fold OLS residualization, final OLS of
ỹ on t̃ [+ t̃·X interactions]) and ``NonParamDMLParser.java:29-131`` (weighted
final stage: ỹ/t̃ on X with weight t̃²).

Spark-first: folds come from a deterministic row hash; every nuisance fit is
a Gramian aggregation (one per fold per nuisance — 2·cv tiny shuffles);
out-of-fold residual columns are pure ``CASE WHEN`` expressions, so the final
stage is again a single aggregation over codegen'd columns. No row ever moves
to the driver.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from fast_causal_inference_spark.operators.ols import OlsModel, ols


def _fold_column(df: DataFrame, cv: int, fold_col: str, seed: int,
                 fold_expr: str | None = None) -> DataFrame:
    """Deterministic fold id ∈ [0, cv) from a row hash (reference uses
    rowNumberInAllBlocks %% cv; a hash is order-stable under repartitioning).
    ``fold_expr`` overrides with a user expression (e.g. ``id % 3``)."""
    if fold_expr is not None:
        return df.withColumn(fold_col,
                             F.pmod(F.expr(fold_expr), F.lit(cv)).cast("int"))
    h = F.xxhash64(*[F.col(c) for c in df.columns], F.lit(seed))
    return df.withColumn(fold_col, F.pmod(h, F.lit(cv)).cast("int"))


@dataclass
class DMLResult:
    """Final-stage model over treatment residuals.

    ``theta`` — constant effect (LinearDML without X-heterogeneity) or the
    coefficient vector over [1, X…] (CATE model).
    """

    theta: np.ndarray
    stderr: np.ndarray
    names: list[str]
    final_model: OlsModel
    hetero_exprs: list[str]

    @property
    def ate(self) -> float:
        return float(self.theta[0])

    def effect_column(self) -> Column:
        out: Column = F.lit(float(self.theta[0]))
        for b, e in zip(self.theta[1:], self.hetero_exprs):
            out = out + float(b) * F.expr(e).cast("double")
        return out

    def effect(self, df: DataFrame, alias: str = "effect") -> DataFrame:
        return df.withColumn(alias, self.effect_column())

    def summary(self):
        import pandas as pd

        from fast_causal_inference_spark import stats_distributions as dist

        z = self.theta / self.stderr
        return pd.DataFrame({
            "name": self.names, "estimate": self.theta, "stderr": self.stderr,
            "z_value": z, "p_value": 2.0 * dist.norm_sf(np.abs(z)),
        })


def _residual_columns(df: DataFrame, target: str, covariates: list[str],
                      cv: int, fold_col: str, alias: str) -> DataFrame:
    """Out-of-fold OLS residuals of ``target ~ covariates`` as one column."""
    preds = []
    for f in range(cv):
        model = ols(df.where(F.col(fold_col) != f),
                    f"{target} ~ {' + '.join(covariates)}")
        preds.append((f, model.predict_column()))
    pred: Column = F.lit(None).cast("double")
    expr = None
    for f, p in preds:
        expr = F.when(F.col(fold_col) == f, p) if expr is None \
            else expr.when(F.col(fold_col) == f, p)
    pred = expr
    return df.withColumn(alias, F.expr(target).cast("double") - pred)


def linear_dml(df: DataFrame, Y: str, T: str, X: list[str],
               W: list[str] | None = None, cv: int = 3, seed: int = 42,
               heterogeneity: list[str] | None = None,
               fold_expr: str | None = None) -> DMLResult:
    """LinearDML: residualize Y and T on X(+W) out-of-fold, then OLS of
    ỹ on [t̃, t̃·heterogeneity…] without intercept bias on t̃.

    ``heterogeneity`` — feature expressions whose interaction with t̃ models
    CATE; empty → constant-effect DML (partially linear model).
    """
    controls = list(X) + list(W or [])
    if not controls:
        raise ValueError("DML needs at least one control covariate")
    hetero = list(heterogeneity or [])
    work = _fold_column(df, cv, "__fold", seed, fold_expr)
    work = _residual_columns(work, Y, controls, cv, "__fold", "__res_y")
    work = _residual_columns(work, T, controls, cv, "__fold", "__res_t")

    terms = ["__res_t"] + [f"__res_t*({e})" for e in hetero]
    final = ols(work, f"__res_y ~ {' + '.join(terms)}", use_bias=True)
    # drop the (near-zero) intercept from the effect representation
    theta = final.beta[1:]
    stderr = final.stderr[1:]
    names = [T] + [f"{T}*{e}" for e in hetero]
    return DMLResult(theta=theta, stderr=stderr, names=names,
                     final_model=final, hetero_exprs=hetero)


def non_param_dml(df: DataFrame, Y: str, T: str, X: list[str],
                  W: list[str] | None = None, cv: int = 3, seed: int = 42,
                  heterogeneity: list[str] | None = None) -> DMLResult:
    """NonParamDML: final stage regresses ỹ/t̃ on [1, heterogeneity…] with
    weight t̃² (reference NonParamDMLParser.java:29-131)."""
    controls = list(X) + list(W or [])
    hetero = list(heterogeneity or [])
    work = _fold_column(df, cv, "__fold", seed)
    work = _residual_columns(work, Y, controls, cv, "__fold", "__res_y")
    work = _residual_columns(work, T, controls, cv, "__fold", "__res_t")
    work = (work.withColumn("__ratio", F.col("__res_y") / F.col("__res_t"))
                .withColumn("__w", F.col("__res_t") * F.col("__res_t"))
                .where(F.abs(F.col("__res_t")) > 1e-12))
    if hetero:
        final = ols(work, f"__ratio ~ {' + '.join(hetero)}", use_bias=True,
                    weight="__w")
        theta, stderr = final.beta, final.stderr
    else:
        # intercept-only weighted mean: θ = Σw·r/Σw — which algebraically
        # equals the classic DML moment Σ(t̃·ỹ)/Σt̃², with a sandwich SE
        row = work.agg(
            F.sum(F.col("__w") * F.col("__ratio")).alias("swr"),
            F.sum("__w").alias("sw"),
            F.count(F.lit(1)).alias("n")).collect()[0]
        theta0 = row["swr"] / row["sw"]
        # sandwich: Var(θ) = Σ(t̃·(ỹ-θt̃))² / (Σt̃²)², and t̃(ỹ-θt̃) = w(r-θ)
        resid = work.select(
            (F.col("__w") * F.col("__w")
             * F.pow(F.col("__ratio") - F.lit(theta0), 2)).alias("e"))
        r2_ = resid.agg(F.sum("e").alias("se")).collect()[0]
        se0 = float(np.sqrt(r2_["se"]) / row["sw"])
        theta, stderr = np.array([theta0]), np.array([se0])
        final = None
    names = (["(Intercept)"] + hetero) if hetero else ["theta"]
    return DMLResult(theta=theta, stderr=stderr, names=names,
                     final_model=final, hetero_exprs=hetero)
