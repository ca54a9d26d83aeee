"""Off-policy evaluation (OPE) for logged bandit feedback.

Estimates the value of a *target* policy π from data logged under a
*behavior* policy μ: importance sampling (IPS), self-normalized IPS
(SNIPS), and the doubly-robust estimator (DR) of Dudík-Langford-Li
(ICML 2011).  Complements the on-policy ATE/AIPW estimators in
``operators/estimators.py`` — the reference engine
(``statistics.py:1054-1217``) stops at IPW; OPE is the logged-bandit
generalization an experimentation platform needs for counterfactual
policy questions ("what would revenue have been under the new ranking
policy?").

Plan shape (100 TB honest): every estimator is ONE aggregation over
pure Column expressions — the importance weight w = π(aᵢ|xᵢ)/μ(aᵢ|xᵢ)
and the reward never leave codegen.  DR additionally fits one
per-action outcome model first (a single ``groupBy(action)`` Gramian
scan via ``ols_grouped``) and scores it as a broadcast-free Column
expression, so the total is two scans.  Standard errors come from the
estimators' influence functions (no bootstrap pass).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from fast_causal_inference_spark import stats_distributions as dist

__all__ = ["ope_ips", "ope_snips", "ope_dr", "ope_report"]


def _weight(target_prob, logging_prob, clip: float | None) -> Column:
    pi = F.expr(target_prob) if isinstance(target_prob, str) else target_prob
    mu = F.expr(logging_prob) if isinstance(logging_prob, str) else logging_prob
    w = pi.cast("double") / mu.cast("double")
    if clip is not None:
        if clip <= 0:
            raise ValueError(f"clip must be positive, got {clip}")
        w = F.least(w, F.lit(float(clip)))
    return w


def _finish(n: float, value: float, sd_if: float, ess: float,
            estimator: str, alpha: float) -> pd.DataFrame:
    se = sd_if / np.sqrt(n)
    z = float(dist.norm_ppf(1 - alpha / 2))
    return pd.DataFrame([{
        "estimator": estimator, "value": value, "stderr": se,
        "lower": value - z * se, "upper": value + z * se,
        "n": n, "ess": ess,
    }])


def ope_ips(df: DataFrame, reward: str, target_prob, logging_prob,
            clip: float | None = None, alpha: float = 0.05) -> pd.DataFrame:
    """Inverse-propensity-scoring value of the target policy.

    V̂ = mean(wᵢ rᵢ) with wᵢ = π(aᵢ|xᵢ)/μ(aᵢ|xᵢ) (optionally clipped at
    ``clip``); SE = sd(w r)/√n (w r IS the influence function).  Also
    reports the effective sample size ESS = (Σw)²/Σw² — the standard
    overlap diagnostic (small ESS/n means the target policy visits
    actions the log rarely took).
    """
    r = F.expr(reward).cast("double")
    w = _weight(target_prob, logging_prob, clip)
    # restrict the ESS sums to the rows the estimate uses (defined w·r):
    # otherwise the overlap diagnostic is computed on a different row
    # set than n/v/sd
    w_used = F.when((w * r).isNotNull(), w)
    row = df.agg(F.count(w * r).alias("n"),
                 F.avg(w * r).alias("v"),
                 F.stddev_samp(w * r).alias("sd"),
                 F.sum(w_used).alias("sw"),
                 F.sum(w_used * w_used).alias("sw2")).collect()[0]
    n = float(row["n"])
    if n == 0:
        raise ValueError("ope_ips: no rows with defined reward and weight")
    if not float(row["sw2"] or 0.0) > 0:
        raise ValueError(
            "ope_ips: every importance weight is 0 — the target policy "
            "has no support on the logged actions")
    ess = float(row["sw"]) ** 2 / float(row["sw2"])
    sd = float(row["sd"]) if row["sd"] is not None else float("nan")
    return _finish(n, float(row["v"]), sd, ess, "ips", alpha)


def ope_snips(df: DataFrame, reward: str, target_prob, logging_prob,
              clip: float | None = None, alpha: float = 0.05) -> pd.DataFrame:
    """Self-normalized IPS: V̂ = Σwᵢrᵢ / Σwᵢ.

    Invariant to reward translation and immune to weight-scale
    miscalibration; the delta-method influence function is
    φᵢ = wᵢ(rᵢ − V̂)/w̄, so SE = sd(φ)/√n in the same single scan plus
    the already-computed moments (no second pass: sd(φ) expands into
    the five sums below).
    """
    r = F.expr(reward).cast("double")
    w = _weight(target_prob, logging_prob, clip)
    # EVERY sum restricted to rows with a defined w·r (the rows the
    # estimate uses): a NULL-reward row with a defined weight would
    # otherwise enter Σw / Σw² but not Σwr — biasing the normalized
    # value toward 0 and computing ESS/w̄ on a different row set than n
    # (ope_ips already gates its ESS sums the same way)
    m = (w * r).isNotNull()
    wm = F.when(m, w)
    row = df.agg(F.count(F.when(m, 1)).alias("n"),
                 F.sum(wm * r).alias("swr"),
                 F.sum(wm).alias("sw"),
                 F.sum(wm * wm * r * r).alias("sw2r2"),
                 F.sum(wm * wm * r).alias("sw2r"),
                 F.sum(wm * wm).alias("sw2")).collect()[0]
    n = float(row["n"])
    if n == 0 or float(row["sw"]) == 0:
        raise ValueError("ope_snips: no rows (or all-zero weights)")
    v = float(row["swr"]) / float(row["sw"])
    wbar = float(row["sw"]) / n
    # E[φ²] with φ = w(r − v)/w̄ ; mean(φ) = 0 by construction of v
    m2 = (float(row["sw2r2"]) - 2 * v * float(row["sw2r"])
          + v * v * float(row["sw2"])) / n / wbar ** 2
    sd = np.sqrt(max(0.0, m2) * n / max(1.0, n - 1))
    ess = float(row["sw"]) ** 2 / float(row["sw2"])
    return _finish(n, v, float(sd), ess, "snips", alpha)


def ope_dr(df: DataFrame, reward: str, action: str, features: list[str],
           target_probs: dict, logging_prob, clip: float | None = None,
           alpha: float = 0.05) -> pd.DataFrame:
    """Doubly-robust policy value (Dudík-Langford-Li 2011).

    V̂ = mean( Σₐ π(a|xᵢ) q̂(xᵢ,a)  +  wᵢ (rᵢ − q̂(xᵢ,aᵢ)) )

    ``target_probs`` maps each action value to a Column/SQL expression
    for π(a|x) (they should sum to 1 row-wise); ``logging_prob`` is
    μ(aᵢ|xᵢ) for the *logged* action.  q̂ is a per-action linear model
    on ``features`` fit by ONE ``groupBy(action)`` Gramian scan
    (``ols_grouped``), scored as Column expressions.  Unbiased if
    EITHER q̂ or μ is correct; variance strictly below IPS when q̂ has
    signal.  SE from the influence function (the summand itself).
    """
    from fast_causal_inference_spark.operators.ols import ols_grouped

    if not target_probs:
        raise ValueError("target_probs must map action values to π(a|x)")
    r = F.expr(reward).cast("double")
    a = F.col(action)
    rhs = "+".join(features)
    work = df.withColumn("__r", r)
    models = ols_grouped(work, f"__r ~ {rhs}", action)
    missing = [k for k in target_probs if k not in models]
    if missing:
        raise ValueError(
            f"ope_dr: actions {missing} in target_probs never appear in the "
            f"log; their q-model is unidentified (logged actions: "
            f"{sorted(models)})")
    def _prob(p) -> Column:
        return (F.expr(p) if isinstance(p, str) else p).cast("double")

    # direct-method term: Σ_a π(a|x) q̂(x, a)
    dm = None
    for act, p in target_probs.items():
        term = _prob(p) * models[act].predict_column()
        dm = term if dm is None else dm + term
    # q̂ at the logged action, and π at the logged action
    q_logged = None
    pi_logged = None
    for act, p in target_probs.items():
        m = models[act].predict_column()
        cond = a == F.lit(act)
        q_logged = F.when(cond, m) if q_logged is None \
            else q_logged.when(cond, m)
        pi_logged = F.when(cond, _prob(p)) if pi_logged is None \
            else pi_logged.when(cond, _prob(p))
    q_logged = q_logged.otherwise(F.lit(None))
    # logged actions outside target_probs get π = 0 (the target policy
    # never takes them), keeping the correction term defined
    pi_logged = pi_logged.otherwise(F.lit(0.0))
    w = _weight(pi_logged, logging_prob, clip)
    phi = dm + w * (F.col("__r") - F.coalesce(q_logged, F.lit(0.0)))
    # ESS sums gated on defined φ — same row-set rule as ips/snips (a
    # NULL-feature row has no q̂, drops out of n/v/sd, and must not
    # inflate the overlap diagnostic either)
    w_used = F.when(phi.isNotNull(), w)
    row = work.agg(F.count(phi).alias("n"),
                   F.avg(phi).alias("v"),
                   F.stddev_samp(phi).alias("sd"),
                   F.sum(w_used).alias("sw"),
                   F.sum(w_used * w_used).alias("sw2")).collect()[0]
    n = float(row["n"])
    if n == 0:
        raise ValueError("ope_dr: no rows with defined reward and features")
    ess = float(row["sw"]) ** 2 / float(row["sw2"]) \
        if float(row["sw2"]) > 0 else 0.0
    return _finish(n, float(row["v"]), float(row["sd"]), ess, "dr", alpha)


def ope_report(df: DataFrame, reward: str, action: str, features: list[str],
               target_probs: dict, logging_prob,
               clip: float | None = None, alpha: float = 0.05) -> pd.DataFrame:
    """All three estimators side by side (IPS / SNIPS / DR) for the same
    target policy — the standard OPE triangulation table.  π(aᵢ|xᵢ) for
    the logged action is assembled from ``target_probs`` exactly as in
    ``ope_dr``."""
    a = F.col(action)
    pi_logged = None
    for act, p in target_probs.items():
        pe = (F.expr(p) if isinstance(p, str) else p).cast("double")
        cond = a == F.lit(act)
        pi_logged = F.when(cond, pe) if pi_logged is None \
            else pi_logged.when(cond, pe)
    pi_logged = pi_logged.otherwise(F.lit(0.0))
    parts = [
        ope_ips(df, reward, pi_logged, logging_prob, clip, alpha),
        ope_snips(df, reward, pi_logged, logging_prob, clip, alpha),
        ope_dr(df, reward, action, features, target_probs, logging_prob,
               clip, alpha),
    ]
    return pd.concat(parts, ignore_index=True)
