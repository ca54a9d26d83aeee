"""ATE / IPW estimators with Poisson-bootstrap confidence intervals.

Parity target: reference ``statistics.py:1054-1217`` (IPWestimator /
ATEestimator built on BootStrapMulti). Point estimates are single
aggregations; CIs reuse the replicated-aggregation bootstrap.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fast_causal_inference_spark.operators.resample import poisson_weight_column


def _bootstrap_ci(df: DataFrame, value_fn, B: int, seed: int,
                  alpha: float = 0.05) -> tuple[float, float, float]:
    """Poisson-bootstrap std/CI of a statistic expressed as (num/den Columns).

    ``value_fn(w)`` must return a dict of named aggregate Columns given a
    weight Column; and a finalizer combining a result row into the scalar.
    """
    aggs, finalize = value_fn
    rep = F.explode(F.sequence(F.lit(0), F.lit(B - 1))).alias("__rep")
    exploded = (df.select("*", rep)
                .withColumn("__u", F.rand(seed))
                .withColumn("__w", poisson_weight_column(
                    1.0, F.col("__u")).cast("double"))
                .drop("__u"))
    agged = exploded.groupBy("__rep").agg(
        *[c.alias(n) for n, c in aggs(F.col("__w")).items()])
    vals = np.array([finalize(r) for r in agged.collect()], dtype=float)
    lo, hi = np.quantile(vals, [alpha / 2, 1 - alpha / 2])
    return float(vals.std(ddof=1)), float(lo), float(hi)


def ate_estimator(df: DataFrame, Y: str, T: str, B: int = 100,
                  seed: int = 42) -> pd.DataFrame:
    """Difference-in-means ATE with bootstrap std/CI."""
    y = F.expr(Y).cast("double")
    t = F.expr(T).cast("double")

    def aggs(w):
        return {"s1": F.sum(w * y * t), "n1": F.sum(w * t),
                "s0": F.sum(w * y * (1 - t)), "n0": F.sum(w * (1 - t))}

    def finalize(r):
        return r["s1"] / r["n1"] - r["s0"] / r["n0"]

    point_row = df.agg(*[c.alias(n) for n, c in aggs(F.lit(1.0)).items()]) \
        .collect()[0]
    point = finalize(point_row)
    std, lo, hi = _bootstrap_ci(df, (aggs, finalize), B, seed)
    return pd.DataFrame([{"ATE": point, "stddev": std,
                          "lower": lo, "upper": hi, "n_resamples": B}])


def ipw_estimator(df: DataFrame, Y: str, T: str, P: str, B: int = 100,
                  seed: int = 42, eps: float = 0.01) -> pd.DataFrame:
    """Inverse-propensity-weighted ATE (Horvitz-Thompson with the reference's
    +eps guard on the propensity) with bootstrap std/CI."""
    y = F.expr(Y).cast("double")
    t = F.expr(T).cast("double")
    p = F.expr(P).cast("double")

    def aggs(w):
        return {"a": F.sum(w * y * t / (p + eps)),
                "b": F.sum(w * y * (1 - t) / (1 - p + eps)),
                "n": F.sum(w)}

    def finalize(r):
        return (r["a"] - r["b"]) / r["n"]

    point_row = df.agg(*[c.alias(n) for n, c in aggs(F.lit(1.0)).items()]) \
        .collect()[0]
    point = finalize(point_row)
    std, lo, hi = _bootstrap_ci(df, (aggs, finalize), B, seed)
    return pd.DataFrame([{"ATE": point, "stddev": std,
                          "lower": lo, "upper": hi, "n_resamples": B}])


def aipw_estimator(df: DataFrame, Y: str, T: str, X: list[str],
                   propensity: str = "logistic", eps: float = 0.01,
                   alpha: float = 0.05) -> pd.DataFrame:
    """Doubly-robust AIPW (augmented IPW) ATE.

    ψᵢ = μ₁(xᵢ) − μ₀(xᵢ) + tᵢ(yᵢ−μ₁(xᵢ))/ê(xᵢ)
         − (1−tᵢ)(yᵢ−μ₀(xᵢ))/(1−ê(xᵢ));
    ATE = mean ψ, SE = sd(ψ)/√n (the influence-function variance — ψ IS
    the efficient influence function, so no bootstrap pass is needed),
    normal CI.  Consistent if EITHER the per-arm outcome regressions OR
    the propensity model is correct (double robustness).

    Composition of existing suff-stats kernels: two closed-form per-arm
    OLS fits + one propensity fit (``'logistic'`` IRLS, or ``'linear'``
    probability model — one more closed-form OLS), then ONE aggregation
    of the ψ column (all three models score as pure Column expressions;
    ê is clamped to [eps, 1−eps]).  Goes beyond the reference's
    IPW/ATE estimators (``statistics.py:1054-1217``) with the standard
    efficient estimator.
    """
    from fast_causal_inference_spark.operators.logistic import (
        logistic_regression,
    )
    from fast_causal_inference_spark.operators.ols import ols
    from fast_causal_inference_spark import stats_distributions as dist

    if propensity not in ("logistic", "linear"):
        raise ValueError("propensity must be 'logistic' or 'linear'")
    t = F.expr(T).cast("double")
    y = F.expr(Y).cast("double")
    rhs = "+".join(X)
    # binary contrast only: rows from other arms of a multi-valued
    # treatment would otherwise silently pollute the psi average
    work = df.withColumn("__t", t).withColumn("__y", y) \
             .where(F.col("__t").isin(0.0, 1.0))
    # BOTH per-arm outcome models come from ONE groupBy(arm) Gramian scan
    # (additive Gramians, same kernel as the T-learner); the propensity
    # fit is an independent full-corpus job and overlaps it
    import threading

    from fast_causal_inference_spark.operators.ols import ols_grouped

    res: dict = {}

    def _run(key, fn):
        def go():
            try:
                res[key] = fn()
            except BaseException as exc:      # noqa: BLE001 — re-raised
                res[key] = exc
        th = threading.Thread(target=go)
        th.start()
        return th

    threads = [
        _run("mu", lambda: ols_grouped(work, f"__y ~ {rhs}", "__t")),
        _run("e", (lambda: logistic_regression(work, f"__t ~ {rhs}"))
             if propensity == "logistic"
             else (lambda: ols(work, f"__t ~ {rhs}"))),
    ]
    for th in threads:
        th.join()
    for v in res.values():
        if isinstance(v, BaseException):
            raise v
    mu1, mu0 = res["mu"][1.0], res["mu"][0.0]
    e_col = (res["e"].predict_proba_column()
             if propensity == "logistic" else res["e"].predict_column())
    e = F.greatest(F.lit(float(eps)),
                   F.least(F.lit(1.0 - eps), e_col))
    m1 = mu1.predict_column()
    m0 = mu0.predict_column()
    psi = (m1 - m0
           + F.col("__t") * (F.col("__y") - m1) / e
           - (1 - F.col("__t")) * (F.col("__y") - m0) / (1 - e))
    # n counts rows with a defined psi (null Y/X rows would otherwise
    # deflate the influence-function SE)
    row = work.agg(F.count(psi).alias("n"),
                   F.avg(psi).alias("ate"),
                   F.stddev_samp(psi).alias("sd")).collect()[0]
    n, ate, sd = float(row["n"]), float(row["ate"]), float(row["sd"])
    se = sd / np.sqrt(n)
    z = float(dist.norm_ppf(1 - alpha / 2))
    return pd.DataFrame([{"ATE": ate, "stderr": se,
                          "lower": ate - z * se, "upper": ate + z * se,
                          "n": n, "propensity": propensity}])
