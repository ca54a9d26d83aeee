"""Bayesian A/B testing — conjugate posteriors, P(win), expected loss.

Beyond the reference's frequentist surface: the decision layer most
experiment platforms put next to the t-test family. Spark's share of the
work is ONE sufficient-statistics aggregation per call (counts/sums per
arm); every posterior quantity is closed-form driver math on those
scalars, so the operators scale exactly like ``ttest_2samp``.

* binary metrics — Beta–Bernoulli conjugacy: posterior
  ``Beta(a0 + s, b0 + n − s)`` per arm; ``P(treatment beats control)``
  and expected loss via deterministic Simpson integration of the Beta
  densities (the repo-local ``betainc`` — no scipy in the environment).
* continuous metrics — large-sample normal posterior
  ``N(ȳ, s²/n)`` under a flat prior; P(win) and expected loss have
  closed normal forms.

Expected loss is the Bayesian decision quantity: choosing arm X costs
``E[max(p_other − p_X, 0)]`` — the usual ship-when-below-threshold rule
(e.g. 0.1% of the metric).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..stats_distributions import betainc, norm_cdf

__all__ = ["bayes_ab_binary", "bayes_ab_continuous"]

_GRID_N = 4097  # Simpson nodes (odd); |err| ~ 1e-10 for smooth betas


def _log_beta(a: float, b: float) -> float:
    return math.lgamma(a) + math.lgamma(b) - math.lgamma(a + b)


def _beta_logpdf(x: np.ndarray, a: float, b: float) -> np.ndarray:
    with np.errstate(divide="ignore"):
        return ((a - 1.0) * np.log(x) + (b - 1.0) * np.log1p(-x)
                - _log_beta(a, b))


def _simpson(y: np.ndarray, dx: float) -> float:
    return float(dx / 3.0 * (y[0] + y[-1] + 4.0 * y[1:-1:2].sum()
                             + 2.0 * y[2:-2:2].sum()))


def _p_beta_greater(a1: float, b1: float, a2: float, b2: float) -> float:
    """P(X1 > X2) for independent Beta(a1,b1), Beta(a2,b2):
    ∫ pdf_1(x) · CDF_2(x) dx by Simpson on a fixed grid."""
    x = np.linspace(0.0, 1.0, _GRID_N)
    inner = x[1:-1]
    pdf1 = np.zeros_like(x)
    pdf1[1:-1] = np.exp(_beta_logpdf(inner, a1, b1))
    cdf2 = betainc(a2, b2, x)   # vectorized (stats_distributions)
    y = pdf1 * cdf2
    # endpoint densities can be infinite for a<1/b<1 priors; the
    # integrand is still integrable — clamp the (measure-zero) endpoints
    y[~np.isfinite(y)] = 0.0
    return min(max(_simpson(y, x[1] - x[0]), 0.0), 1.0)


def _expected_loss_beta(a1: float, b1: float, a2: float,
                        b2: float) -> float:
    """E[max(X2 − X1, 0)] — the expected loss of SHIPPING arm 1 when
    arm 2 might be better.  E[X2·1(X2>X1)] − E[X1·1(X2>X1)] via the
    conjugate identity E[X·1(X>Y)] = mean(X)·P(X⁺ > Y) with
    X⁺ ~ Beta(a+1, b)."""
    m2 = a2 / (a2 + b2)
    m1 = a1 / (a1 + b1)
    t1 = m2 * _p_beta_greater(a2 + 1.0, b2, a1, b1)
    t2 = m1 * (1.0 - _p_beta_greater(a1 + 1.0, b1, a2, b2))
    return max(t1 - t2, 0.0)


def bayes_ab_binary(df: DataFrame, success: str, arm: str,
                    treatment_values: tuple = (0, 1),
                    prior: tuple = (1.0, 1.0)) -> pd.DataFrame:
    """Beta–Bernoulli A/B readout for a 0/1 (or boolean) success column.

    One row per arm: posterior ``alpha/beta``, posterior mean and 95%
    credible interval, ``p_beats_other`` and ``expected_loss`` (of
    shipping that arm). ``prior`` is the shared Beta(a0, b0) prior —
    (1, 1) is uniform."""
    a0, b0 = float(prior[0]), float(prior[1])
    c_val, t_val = treatment_values
    sv = F.expr(success).cast("double")
    s = F.when(sv > 0, 1.0).otherwise(0.0)
    # complete-case: a NULL success is missing data, not a failure —
    # counting it in n silently deflated the posterior rate; map arms
    # to 0/1 server-side so string-typed arm columns that match the
    # isin coercion can't miss the driver-side dict lookup
    armc = F.expr(arm)
    arm01 = F.when(armc == F.lit(c_val), 0).when(armc == F.lit(t_val), 1)
    rows = (df.where(arm01.isNotNull() & sv.isNotNull())
            .groupBy(arm01.alias("__arm"))
            .agg(F.count(F.lit(1)).alias("n"), F.sum(s).alias("s"))
            .collect())
    by01 = {int(r["__arm"]): (float(r["n"]), float(r["s"])) for r in rows}
    stats = {v: by01[i] for i, v in enumerate(treatment_values)
             if i in by01}
    for v in treatment_values:
        if v not in stats:
            raise ValueError(f"arm value {v!r} absent from {arm!r}")
    post = {v: (a0 + stats[v][1], b0 + stats[v][0] - stats[v][1])
            for v in treatment_values}
    (ac, bc), (at, bt) = post[c_val], post[t_val]
    p_t_wins = _p_beta_greater(at, bt, ac, bc)
    out = []
    for v, p_win, (a, b), (oa, ob) in [
            (c_val, 1.0 - p_t_wins, post[c_val], post[t_val]),
            (t_val, p_t_wins, post[t_val], post[c_val])]:
        mean = a / (a + b)
        lo, hi = _beta_ppf_pair(a, b, 0.025, 0.975)
        out.append({
            "arm": v, "n": stats[v][0], "successes": stats[v][1],
            "alpha": a, "beta": b, "posterior_mean": mean,
            "ci_lower": lo, "ci_upper": hi,
            "p_beats_other": p_win,
            "expected_loss": _expected_loss_beta(a, b, oa, ob),
        })
    return pd.DataFrame(out)


def _beta_ppf_pair(a: float, b: float, q_lo: float,
                   q_hi: float) -> tuple:
    """Beta quantiles by bisection on the repo-local betainc."""
    def ppf(q):
        lo, hi = 0.0, 1.0
        for _ in range(80):
            mid = (lo + hi) / 2.0
            if betainc(a, b, mid) < q:
                lo = mid
            else:
                hi = mid
        return (lo + hi) / 2.0
    return ppf(q_lo), ppf(q_hi)


def bayes_ab_continuous(df: DataFrame, y: str, arm: str,
                        treatment_values: tuple = (0, 1)) -> pd.DataFrame:
    """Normal-posterior A/B readout for a continuous metric (flat prior,
    large-sample): posterior ``N(ȳ, s²/n)`` per arm; P(win) and expected
    loss in closed form (φ/Φ)."""
    c_val, t_val = treatment_values
    yc = F.expr(y).cast("double")
    armc = F.expr(arm)
    arm01 = F.when(armc == F.lit(c_val), 0).when(armc == F.lit(t_val), 1)
    rows = (df.where(arm01.isNotNull() & yc.isNotNull())
            .groupBy(arm01.alias("__arm"))
            .agg(F.count(F.lit(1)).alias("n"), F.avg(yc).alias("m"),
                 F.var_samp(yc).alias("v"))
            .collect())
    # var_samp is NULL for a single-row arm: float(None) would raise a
    # bare TypeError BEFORE the friendly >=2-rows check below
    by01 = {int(r["__arm"]): (float(r["n"]), float(r["m"]),
                              float(r["v"]) if r["v"] is not None
                              else float("nan")) for r in rows}
    stats = {v: by01[i] for i, v in enumerate(treatment_values)
             if i in by01}
    for v in treatment_values:
        if v not in stats or stats[v][0] < 2:
            raise ValueError(f"arm {v!r} needs >= 2 non-null rows")
    post = {v: (m, math.sqrt(var / n)) for v, (n, m, var) in stats.items()}
    (mc, sc), (mt, st) = post[c_val], post[t_val]
    sd = math.sqrt(sc * sc + st * st)
    if sd > 0:
        p_t_wins = float(norm_cdf((mt - mc) / sd))
    else:
        # degenerate posteriors: the higher mean wins with certainty
        p_t_wins = 0.5 if mt == mc else float(mt > mc)

    def _eloss(mu_diff):
        # E[max(D, 0)] for D ~ N(mu_diff, sd²)
        if sd == 0:
            return max(mu_diff, 0.0)
        z = mu_diff / sd
        return float(sd * math.exp(-z * z / 2.0) / math.sqrt(2 * math.pi)
                     + mu_diff * norm_cdf(z))

    out = []
    for v, p_win, mu, se, eloss in [
            (c_val, 1.0 - p_t_wins, mc, sc, _eloss(mt - mc)),
            (t_val, p_t_wins, mt, st, _eloss(mc - mt))]:
        out.append({
            "arm": v, "n": stats[v][0], "posterior_mean": mu,
            "posterior_sd": se,
            "ci_lower": mu - 1.959963984540054 * se,
            "ci_upper": mu + 1.959963984540054 * se,
            "p_beats_other": p_win, "expected_loss": eloss,
        })
    return pd.DataFrame(out)
