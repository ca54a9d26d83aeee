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
           "mde_ttest", "power_proportion", "sample_size_proportion",
           "icc_oneway", "design_effect", "sample_size_cluster_ttest",
           "events_logrank", "sample_size_logrank"]


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
    # var_samp is NULL for a 1-row arm — see bayes_ab_continuous
    st = {r["arm"]: (float(r["n"]), float(r["m"]),
                     float(r["v"]) if r["v"] is not None
                     else float("nan"))
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


def icc_oneway(df, Y: str, cluster: str) -> dict:
    """ICC(1) from the one-way random-effects ANOVA decomposition:
    (MSB − MSW) / (MSB + (m̄ − 1)·MSW), with m̄ the mean-square-weighted
    average cluster size (Searle's n0 = (N − Σm²/N)/(C − 1)).

    ONE ``groupBy(cluster)`` sufficient-sums pass; everything else is
    driver math over the (bounded) cluster relation.  Returns a dict with
    icc, msb, msw, n_clusters, n, m_bar — the design input for
    :func:`design_effect` / :func:`sample_size_cluster_ttest`.
    """
    from pyspark.sql import functions as F

    y = F.expr(Y).cast("double")
    rows = (df.where(y.isNotNull() & F.expr(cluster).isNotNull())
            .groupBy(F.expr(cluster).alias("__cl"))
            .agg(F.count(F.lit(1)).cast("double").alias("m"),
                 F.sum(y).alias("s"),
                 F.sum(y * y).alias("ss")).collect())
    C = len(rows)
    if C < 2:
        raise ValueError("icc_oneway needs at least 2 clusters")
    N = sum(float(r["m"]) for r in rows)
    S = sum(float(r["s"]) for r in rows)
    SS = sum(float(r["ss"]) for r in rows)
    ssb = sum(float(r["s"]) ** 2 / float(r["m"]) for r in rows) - S * S / N
    ssw = SS - sum(float(r["s"]) ** 2 / float(r["m"]) for r in rows)
    if N <= C:
        raise ValueError(
            "icc_oneway: every cluster has a single row (N == C) — "
            "within-cluster variance is undefined; is the cluster "
            "column a unique id?")
    msb = ssb / (C - 1)
    msw = ssw / (N - C)
    n0 = (N - sum(float(r["m"]) ** 2 for r in rows) / N) / (C - 1)
    icc = (msb - msw) / (msb + (n0 - 1.0) * msw) if msb + (n0 - 1) * msw \
        else float("nan")
    return {"icc": float(icc), "msb": float(msb), "msw": float(msw),
            "n_clusters": C, "n": float(N), "m_bar": float(n0)}


def design_effect(m: float, icc: float) -> float:
    """Kish design effect for cluster sampling: 1 + (m − 1)·ICC — the
    factor by which within-cluster correlation inflates the variance of
    a mean over N = C·m individuals."""
    return float(1.0 + (m - 1.0) * max(icc, 0.0))


def events_logrank(hazard_ratio: float, alpha: float = 0.05,
                   power: float = 0.8, ratio: float = 1.0) -> float:
    """Schoenfeld (1983) required number of EVENTS for a two-arm
    log-rank / Cox test:

        d = (z_{1−α/2} + z_{power})² · (1 + r)² / (r · (ln HR)²)

    with allocation ratio r = n₁/n₀.  Survival designs are event-driven,
    not subject-driven — this is the quantity that actually powers the
    trial."""
    if hazard_ratio <= 0 or hazard_ratio == 1.0:
        raise ValueError("hazard_ratio must be positive and != 1")
    if not 0 < alpha < 1 or not 0 < power < 1:
        raise ValueError("alpha and power must lie in (0, 1)")
    za = float(dist.norm_ppf(1 - alpha / 2))
    zb = float(dist.norm_ppf(power))
    r = ratio
    return float(math.ceil((za + zb) ** 2 * (1 + r) ** 2
                           / (r * math.log(hazard_ratio) ** 2)))


def sample_size_logrank(hazard_ratio: float, p_event: float,
                        alpha: float = 0.05, power: float = 0.8,
                        ratio: float = 1.0) -> dict:
    """Subjects for a two-arm survival design: Schoenfeld events divided
    by the overall event probability ``p_event`` over the study horizon
    (estimate it from the pooled KM: 1 − S(τ), e.g. via :func:`rmst`'s
    inputs or a pilot)."""
    if not 0 < p_event <= 1:
        raise ValueError("p_event must lie in (0, 1]")
    d = events_logrank(hazard_ratio, alpha=alpha, power=power, ratio=ratio)
    n_total = math.ceil(d / p_event)
    n0 = math.ceil(n_total / (1 + ratio))
    return {"events_required": float(d),
            "n_total": float(n_total),
            "n_control": float(n0),
            "n_treatment": float(n_total - n0),
            "p_event": float(p_event)}


def sample_size_cluster_ttest(effect: float, std: float, m: float,
                              icc: float, alpha: float = 0.05,
                              power: float = 0.8,
                              ratio: float = 1.0) -> dict:
    """Cluster-randomized design: individuals per control arm is the
    individual-randomized requirement × the design effect; clusters per
    arm = that divided by the cluster size ``m``."""
    n_ind = sample_size_ttest(effect, std, alpha=alpha, power=power,
                              ratio=ratio)
    deff = design_effect(m, icc)
    if not math.isfinite(n_ind):
        return {"n_per_arm": float("inf"),
                "clusters_per_arm": float("inf"),
                "design_effect": deff,
                "n_individual_randomized": float("inf")}
    n_clustered = math.ceil(n_ind * deff)
    return {"n_per_arm": float(n_clustered),
            "clusters_per_arm": float(math.ceil(n_clustered / m)),
            "design_effect": deff,
            "n_individual_randomized": float(n_ind)}
