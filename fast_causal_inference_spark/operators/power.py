"""Experiment design helpers: power, minimum detectable effect, sample
size, and standardized effect sizes.

The closed forms embedded in the xexpt report (power at mde, recommended
samples — reference ``xexpt_ttest_2samp.h:505-522``) exposed as
standalone utilities, plus Cohen's d / Hedges' g from one
sufficient-statistics pass.
"""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fast_causal_inference_spark import stats_distributions as dist

__all__ = ["effect_size", "power_ttest", "sample_size_ttest",
           "mde_ttest", "power_proportion", "sample_size_proportion"]


def power_ttest(effect: float, std: float, n0: float, n1: float,
                alpha: float = 0.05) -> float:
    """Power of the two-sample z/t test to detect ``effect`` (absolute
    difference in means) at per-arm sizes (n0, n1) with common ``std``."""
    if std <= 0 or n0 <= 0 or n1 <= 0:
        raise ValueError("std and arm sizes must be positive")
    se = std * math.sqrt(1.0 / n0 + 1.0 / n1)
    z_a = float(dist.norm_ppf(1 - alpha / 2))
    shift = abs(effect) / se
    return float(1 - dist.norm_cdf(z_a - shift)
                 + dist.norm_cdf(-z_a - shift))


def sample_size_ttest(effect: float, std: float, alpha: float = 0.05,
                      power: float = 0.8, ratio: float = 1.0) -> float:
    """Per-control-arm sample size for the two-sample test
    (treatment arm = ratio·n).  Inverts the normal-approximation power
    formula — the reference's 'recommend_samples' shape."""
    if effect == 0:
        return float("inf")
    z_a = float(dist.norm_ppf(1 - alpha / 2))
    z_b = float(dist.norm_ppf(power))
    n0 = (1.0 + 1.0 / ratio) * (std * (z_a + z_b) / abs(effect)) ** 2
    return float(math.ceil(n0))


def mde_ttest(std: float, n0: float, n1: float, alpha: float = 0.05,
              power: float = 0.8) -> float:
    """Minimum detectable absolute effect at the given design."""
    se = std * math.sqrt(1.0 / n0 + 1.0 / n1)
    return float((dist.norm_ppf(1 - alpha / 2)
                  + dist.norm_ppf(power)) * se)


def power_proportion(p0: float, p1: float, n0: float, n1: float,
                     alpha: float = 0.05) -> float:
    """Power of the two-sample proportion z-test (pooled-variance null,
    unpooled alternative — the standard conversion-rate design formula)."""
    for p in (p0, p1):
        if not 0.0 < p < 1.0:
            raise ValueError("proportions must be in (0, 1)")
    if n0 <= 0 or n1 <= 0:
        raise ValueError("arm sizes must be positive")
    pbar = (n0 * p0 + n1 * p1) / (n0 + n1)
    se0 = math.sqrt(pbar * (1 - pbar) * (1.0 / n0 + 1.0 / n1))
    se1 = math.sqrt(p0 * (1 - p0) / n0 + p1 * (1 - p1) / n1)
    z_a = float(dist.norm_ppf(1 - alpha / 2))
    d = abs(p1 - p0)
    return float(1 - dist.norm_cdf((z_a * se0 - d) / se1)
                 + dist.norm_cdf((-z_a * se0 - d) / se1))


def sample_size_proportion(p0: float, p1: float, alpha: float = 0.05,
                           power: float = 0.8,
                           ratio: float = 1.0) -> float:
    """Per-control-arm size for the conversion-rate test (treatment arm
    = ratio·n): the Fleiss-style normal-approximation inversion."""
    for p in (p0, p1):
        if not 0.0 < p < 1.0:
            raise ValueError("proportions must be in (0, 1)")
    if p0 == p1:
        return float("inf")
    pbar = (p0 + ratio * p1) / (1.0 + ratio)
    z_a = float(dist.norm_ppf(1 - alpha / 2))
    z_b = float(dist.norm_ppf(power))
    num = (z_a * math.sqrt((1.0 + 1.0 / ratio) * pbar * (1 - pbar))
           + z_b * math.sqrt(p0 * (1 - p0)
                             + p1 * (1 - p1) / ratio)) ** 2
    return float(math.ceil(num / (p1 - p0) ** 2))


def effect_size(df: DataFrame, y: str, index: str,
                treatment_values: tuple = (0, 1)) -> pd.DataFrame:
    """Cohen's d (pooled-SD standardized difference), bias-corrected
    Hedges' g, and the achieved power to re-detect the observed effect —
    one ``groupBy(arm)`` sufficient-statistics pass."""
    idx = F.col(index) if index.isidentifier() else F.expr(index)
    ycol = F.expr(y).cast("double")
    v0, v1 = treatment_values
    arm = F.when(idx == F.lit(v0), 0).when(idx == F.lit(v1), 1)
    rows = (df.where(arm.isNotNull() & ycol.isNotNull())
            .groupBy(arm.alias("arm"))
            .agg(F.count(F.lit(1)).cast("double").alias("n"),
                 F.avg(ycol).alias("m"),
                 F.var_samp(ycol).alias("v")).collect())
    st = {r["arm"]: (float(r["n"]), float(r["m"]), float(r["v"]))
          for r in rows}
    if 0 not in st or 1 not in st:
        raise ValueError("both arms must be non-empty")
    n0, m0, v0_ = st[0]
    n1, m1, v1_ = st[1]
    if n0 < 2 or n1 < 2:
        raise ValueError("every arm needs at least 2 rows")
    sp = math.sqrt(((n0 - 1) * v0_ + (n1 - 1) * v1_) / (n0 + n1 - 2))
    if sp == 0:
        raise ValueError("zero pooled variance")
    d = (m1 - m0) / sp
    j = 1.0 - 3.0 / (4.0 * (n0 + n1) - 9.0)      # Hedges' correction
    return pd.DataFrame([{
        "cohens_d": d, "hedges_g": d * j, "diff": m1 - m0,
        "pooled_sd": sp, "n0": n0, "n1": n1,
        "achieved_power": power_ttest(m1 - m0, sp, n0, n1),
    }])
