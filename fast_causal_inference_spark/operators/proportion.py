"""Proportion tests: one-sample z vs p₀ and two-sample (conversion-rate)
z-test, with Wald and Wilson intervals.

Sufficient statistic: (n, successes) per arm — one aggregation, O(1)
driver math; the binary-metric fast path of the t-test family (a t-test
on a 0/1 column estimates the same difference with the same asymptotic
variance, but the proportion form reports rates, pooled-variance z, and
proper binomial intervals)."""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fast_causal_inference_spark import stats_distributions as dist

__all__ = ["proportion_ztest", "proportion_ztest_1samp"]


def _wilson(p: float, n: float, z: float) -> tuple[float, float]:
    den = 1.0 + z * z / n
    center = (p + z * z / (2 * n)) / den
    half = z * math.sqrt(p * (1 - p) / n + z * z / (4 * n * n)) / den
    return center - half, center + half


def proportion_ztest_1samp(df: DataFrame, success: str, p0: float,
                           alternative: str = "two-sided",
                           alpha: float = 0.05) -> pd.DataFrame:
    """z-test of P(success) = p₀.  ``success`` is a boolean/0-1 column or
    expression.  Null variance uses p₀ (score test)."""
    s = F.expr(success).cast("double")
    row = df.where(s.isNotNull()).agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(s).alias("x"),
        F.sum(F.when(~s.isin(0.0, 1.0), 1).otherwise(0)).alias("bad")
    ).collect()[0]
    n, x = float(row["n"]), float(row["x"] or 0.0)
    if n == 0:
        raise ValueError("no rows")
    if int(row["bad"] or 0):
        raise ValueError(
            f"{int(row['bad'])} rows have success values outside {{0, 1}}"
            " — a proportion test needs a binary indicator (a count-"
            "valued column would give p > 1 and a negative Wilson "
            "variance); recode the expression first")
    if not 0.0 < p0 < 1.0:
        raise ValueError("p0 must be in (0, 1)")
    p = x / n
    se0 = math.sqrt(p0 * (1 - p0) / n)
    z = (p - p0) / se0
    if alternative == "two-sided":
        pv = 2.0 * float(dist.norm_sf(abs(z)))
    elif alternative == "greater":
        pv = float(dist.norm_sf(z))
    elif alternative == "less":
        pv = 1.0 - float(dist.norm_sf(z))
    else:
        raise ValueError("alternative must be two-sided|greater|less")
    zc = float(dist.norm_ppf(1 - alpha / 2))
    lo, hi = _wilson(p, n, zc)
    return pd.DataFrame([{
        "proportion": p, "p0": p0, "z": z, "p_value": min(pv, 1.0),
        "n": n, "wilson_lower": lo, "wilson_upper": hi,
    }])


def proportion_ztest(df: DataFrame, success: str, index: str,
                     alternative: str = "two-sided",
                     treatment_values: tuple = (0, 1),
                     alpha: float = 0.05) -> pd.DataFrame:
    """Two-sample pooled z-test of equal proportions (conversion rates),
    with the Wald CI on the difference and per-arm Wilson intervals."""
    s = F.expr(success).cast("double")
    idx = F.col(index) if index.isidentifier() else F.expr(index)
    v0, v1 = treatment_values
    arm = F.when(idx == F.lit(v0), 0).when(idx == F.lit(v1), 1)
    rows = (df.where(arm.isNotNull() & s.isNotNull())
            .groupBy(arm.alias("arm"))
            .agg(F.count(F.lit(1)).cast("double").alias("n"),
                 F.sum(s).alias("x"),
                 F.sum(F.when(~s.isin(0.0, 1.0), 1).otherwise(0))
                 .alias("bad")).collect())
    n_bad = sum(int(r["bad"] or 0) for r in rows)
    if n_bad:
        raise ValueError(
            f"{n_bad} rows have success values outside {{0, 1}} — a "
            "proportion test needs a binary indicator; recode the "
            "expression first")
    st = {r["arm"]: (float(r["n"]), float(r["x"] or 0.0)) for r in rows}
    if 0 not in st or 1 not in st:
        raise ValueError("both arms must be non-empty")
    n0, x0 = st[0]
    n1, x1 = st[1]
    p0_, p1_ = x0 / n0, x1 / n1
    pooled = (x0 + x1) / (n0 + n1)
    se = math.sqrt(pooled * (1 - pooled) * (1 / n0 + 1 / n1))
    if se == 0:
        raise ValueError("degenerate: all successes or all failures")
    z = (p1_ - p0_) / se
    if alternative == "two-sided":
        pv = 2.0 * float(dist.norm_sf(abs(z)))
    elif alternative == "greater":
        pv = float(dist.norm_sf(z))
    elif alternative == "less":
        pv = 1.0 - float(dist.norm_sf(z))
    else:
        raise ValueError("alternative must be two-sided|greater|less")
    zc = float(dist.norm_ppf(1 - alpha / 2))
    se_unpooled = math.sqrt(p0_ * (1 - p0_) / n0 + p1_ * (1 - p1_) / n1)
    diff = p1_ - p0_
    w0 = _wilson(p0_, n0, zc)
    w1 = _wilson(p1_, n1, zc)
    return pd.DataFrame([{
        "proportion0": p0_, "proportion1": p1_, "diff": diff,
        "z": z, "p_value": min(pv, 1.0), "n0": n0, "n1": n1,
        "lower": diff - zc * se_unpooled, "upper": diff + zc * se_unpooled,
        "wilson0_lower": w0[0], "wilson0_upper": w0[1],
        "wilson1_lower": w1[0], "wilson1_upper": w1[1],
    }])
