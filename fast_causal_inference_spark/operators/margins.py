"""Average marginal effects (AME) for fitted GLM / logistic models.

A GLM coefficient lives on the link scale; decision-makers want the
response scale — "one more unit of x moves the conversion probability
by how much, on average?".  The AME for a continuous regressor is

    AME_j = (1/n) Σᵢ  μ'(ηᵢ) · β_j,

with delta-method covariance J Cov(β) Jᵀ where

    J = ā·I + β cᵀ,   ā = mean μ'(η),   c = mean μ''(η)·x̃ᵢ

(x̃ = design vector incl. intercept) — the standard result behind R's
``marginaleffects``/Stata's ``margins, dydx``.

Plan shape: ONE aggregation computes ā, the (p)-vector c, AND the
Fisher information Σ w x̃x̃ᵀ at β̂ (w the family IRLS weight), so
Cov(β̂) = dispersion·A⁻¹ is reproduced exactly without the model having
to carry its covariance — everything is pure Column arithmetic except
the probit link's exact-erf Φ (the package's Arrow ``erf``).

Supports :class:`~...glm.GlmModel` (gaussian, poisson, quasipoisson,
gamma, tweedie, binomial logit/probit/cloglog, negbin) and
:class:`~...logistic.LogisticModel`.  Beyond the reference engine
(coefficient tables only).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from fast_causal_inference_spark import stats_distributions as dist

__all__ = ["average_marginal_effects", "average_marginal_effects_joint"]


def _family_cols(model, eta: Column):
    """(dμ/dη, d²μ/dη², IRLS weight w) columns for the model's family."""
    fam = getattr(model, "family", "binomial")
    link = getattr(model, "link", None)
    if fam == "gaussian":
        return F.lit(1.0), F.lit(0.0), F.lit(1.0)
    if fam == "binomial" or fam is None:
        if link == "probit":
            from fast_causal_inference_spark.functions import erf

            phi = F.exp(-eta * eta / 2.0) / F.lit(math.sqrt(2 * math.pi))
            mu = 0.5 * (1.0 + erf(eta / F.lit(math.sqrt(2.0))))
            v = mu * (1.0 - mu) + F.lit(1e-12)
            return phi, -eta * phi, phi * phi / v
        if link == "cloglog":
            mu = 1.0 - F.exp(-F.exp(eta))
            dmu = F.exp(eta - F.exp(eta))
            d2 = dmu * (1.0 - F.exp(eta))
            v = mu * (1.0 - mu) + F.lit(1e-12)
            return dmu, d2, dmu * dmu / v
        mu = 1.0 / (1.0 + F.exp(-eta))          # logit (canonical)
        dmu = mu * (1.0 - mu)
        return dmu, dmu * (1.0 - 2.0 * mu), dmu
    # log-link count/positive families: μ = μ' = μ''
    mu = F.exp(eta)
    if fam in ("poisson", "quasipoisson"):
        w = mu
    elif fam == "gamma":
        w = F.lit(1.0)
    elif fam == "tweedie":
        p = model.var_power
        if p is None:
            raise ValueError("tweedie model lacks var_power; refit with "
                             "the current glm()")
        w = F.pow(mu, F.lit(2.0 - float(p)))
    elif fam == "negbin":
        # NB2 stores the Cameron-Trivedi α in model.dispersion; the IRLS
        # weight is μ/(1+αμ) (V(μ) = μ + αμ²)
        w = mu / (1.0 + F.lit(float(model.dispersion)) * mu)
    else:
        raise ValueError(f"unsupported family for margins: {fam}")
    return mu, mu, w


def _model_spec(model, df: DataFrame, k: int):
    """Per-model projection spec for the joint scan: complete-case
    condition, projected design/derivative columns (tagged ``k`` so N
    models coexist in one select), and the metadata the driver-side
    post-processing needs."""
    feats = list(model.feature_exprs)
    use_bias = model.use_bias
    beta = np.asarray(model.beta, dtype=float)
    p = len(beta)
    if hasattr(model, "eta_column"):
        eta = model.eta_column()
    else:
        eta = model.logit_column()
    xs = ([F.lit(1.0)] if use_bias else []) + \
        [F.expr(e).cast("double") for e in feats]
    # replicate the FIT's complete-case filter exactly: features AND the
    # outcome AND any offset.  Filtering features only would let rows the
    # fit excluded re-enter the Fisher-information rebuild (wrong
    # Cov(β) → wrong SEs) and, with a NULL offset, silently drop from
    # the sums while still counting in n (biasing the AME toward 0).
    cc = None
    for e in feats:
        c0 = F.expr(e).cast("double").isNotNull()
        cc = c0 if cc is None else (cc & c0)
    y_expr = getattr(model, "y_expr", None)
    if y_expr is not None:
        try:                      # .select resolves eagerly — probe it
            df.select(F.expr(y_expr).cast("double"))
        except Exception:
            # scoring frame without the outcome column: legitimate for
            # the point estimates, but the Fisher rebuild then can only
            # match feature-complete rows — flag it
            import warnings

            warnings.warn(
                f"average_marginal_effects: outcome {y_expr!r} is not "
                "resolvable on this frame; NULL-outcome rows the fit "
                "excluded cannot be filtered here, so pass the "
                "estimation frame for exact standard errors",
                stacklevel=2)
        else:
            c0 = F.expr(y_expr).cast("double").isNotNull()
            cc = c0 if cc is None else (cc & c0)
    off_expr = getattr(model, "offset", None)
    if off_expr is not None:
        c0 = F.expr(off_expr).cast("double").isNotNull()
        cc = c0 if cc is None else (cc & c0)
    dmu, d2mu, w = _family_cols(model, eta)
    # project the link derivatives once per row (probit dμ/d²μ carry
    # erf chains; inlined they would re-evaluate per agg expression);
    # the model's complete-case mask rides as a boolean column so N
    # models with DIFFERENT masks share one scan — each model's sums
    # are gated on its own mask at the aggregation
    proj = [x.alias(f"__p{k}_{i}__") for i, x in enumerate(xs)]
    proj += [dmu.alias(f"__dmu{k}__"), d2mu.alias(f"__d2{k}__"),
             w.alias(f"__w{k}__"),
             (cc if cc is not None else F.lit(True)).alias(f"__cc{k}__")]
    return {"feats": feats, "use_bias": use_bias, "beta": beta, "p": p,
            "model": model, "proj": proj}


def _model_result(spec, row, k: int, alpha: float) -> pd.DataFrame:
    """Driver-side delta-method post-processing of one model's slice of
    the joint aggregation row."""
    model, beta, p = spec["model"], spec["beta"], spec["p"]
    feats, use_bias = spec["feats"], spec["use_bias"]
    n = float(row[f"n{k}"])
    if n == 0:
        raise ValueError("average_marginal_effects: no complete rows")
    abar = float(row[f"a{k}"]) / n
    cvec = np.array([float(row[f"c{k}_{i}"]) / n for i in range(p)])
    A = np.empty((p, p))
    for i in range(p):
        for j in range(i, p):
            A[i, j] = A[j, i] = float(row[f"A{k}_{i}_{j}"])
    # dispersion scales Cov(β) only for the families where glm() scales
    # it (negbin's `dispersion` is the NB α — already in the weights)
    fam = getattr(model, "family", "binomial")
    scale = (float(model.dispersion)
             if fam in ("quasipoisson", "gamma", "gaussian", "tweedie")
             else 1.0)
    cov = np.linalg.pinv(A) * scale

    # J over the SLOPE coefficients only (no AME for the intercept)
    slope_idx = list(range(1, p)) if use_bias else list(range(p))
    J = np.zeros((len(slope_idx), p))
    for r_i, bi in enumerate(slope_idx):
        J[r_i, :] = beta[bi] * cvec
        J[r_i, bi] += abar
    ame = abar * beta[slope_idx]
    V = J @ cov @ J.T
    se = np.sqrt(np.maximum(np.diag(V), 0.0))
    z = np.divide(ame, se, out=np.full_like(ame, np.nan), where=se > 0)
    zc = float(dist.norm_ppf(1 - alpha / 2))
    return pd.DataFrame({
        "name": [feats[i - 1] if use_bias else feats[i]
                 for i in slope_idx],
        "ame": ame, "stderr": se, "z": z,
        "p_value": [2.0 * float(dist.norm_sf(abs(zi))) if zi == zi
                    else float("nan") for zi in z],
        "lower": ame - zc * se, "upper": ame + zc * se})


def average_marginal_effects_joint(models, df: DataFrame,
                                   alpha: float = 0.05,
                                   ) -> list[pd.DataFrame]:
    """AME for N models averaged over the SAME frame in ONE scan.

    Each model keeps its own complete-case semantics (its mask is a
    projected boolean; its sums are ``sum(if(mask, term))``), so the
    results are exactly ``[average_marginal_effects(m, df) for m in
    models]`` at 1/N the scans — the common case being several fits of
    one training frame read back-to-back (e.g. a model zoo report)."""
    if not models:
        return []
    specs = [_model_spec(m, df, k) for k, m in enumerate(models)]
    step = df.select(*[c for s in specs for c in s["proj"]])
    aggs = []
    for k, s in enumerate(specs):
        p = s["p"]
        cc = F.col(f"__cc{k}__")
        ps = [F.col(f"__p{k}_{i}__") for i in range(p)]
        dmuc, d2c = F.col(f"__dmu{k}__"), F.col(f"__d2{k}__")
        wc = F.col(f"__w{k}__")
        aggs.append(F.count(F.when(cc, F.lit(1))).alias(f"n{k}"))
        aggs.append(F.sum(F.when(cc, dmuc)).alias(f"a{k}"))
        for i, x in enumerate(ps):
            aggs.append(F.sum(F.when(cc, d2c * x)).alias(f"c{k}_{i}"))
            for j in range(i, p):
                aggs.append(F.sum(F.when(cc, wc * x * ps[j]))
                            .alias(f"A{k}_{i}_{j}"))
    row = step.agg(*aggs).collect()[0]
    return [_model_result(s, row, k, alpha) for k, s in enumerate(specs)]


def average_marginal_effects(model, df: DataFrame,
                             alpha: float = 0.05) -> pd.DataFrame:
    """Response-scale AME per feature with delta-method inference.

    ``model`` is a fitted ``GlmModel`` or ``LogisticModel``; ``df`` the
    frame to average over (typically the training frame).  Returns one
    row per feature: ame, stderr, z, p_value, CI.
    """
    return average_marginal_effects_joint([model], df, alpha)[0]
