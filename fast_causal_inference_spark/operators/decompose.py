"""Oaxaca-Blinder decomposition of a two-group outcome gap.

Splits mean(Y | A) − mean(Y | B) into the part explained by covariate
differences and the part due to differing coefficients (the classic
wage-gap decomposition; Oaxaca 1973, Blinder 1973 — standard in any
platform's fairness / cohort-gap tooling):

    gap = [x̄_A − x̄_B]ᵀ β*            (explained / endowments)
        + [x̄_Aᵀ(β_A − β*) + x̄_Bᵀ(β* − β_B)]   (unexplained)

with β* the reference coefficient vector: ``reference='A'|'B'`` gives
the two-fold decomposition from that group's coefficients;
``'pooled'`` (Neumark) uses the pooled regression.  The two-fold
"unexplained" term further splits into the within-group contributions
when a group reference is chosen.

Plan shape: BOTH group fits come from ONE ``groupBy(group)`` Gramian
scan (``ols_grouped``; the pooled fit is the sum of the two group
Gramians, so no extra pass), group means ride in the same scan's
moment sums.  Driver state is two (k+1)-vectors and matrices.  SEs for
the explained/unexplained terms use the standard independent-groups
delta method (coefficient covariances from the per-group fits; mean
covariances from the per-group moment sums).

Beyond the reference engine (no decomposition tooling there); fully
closed-form, so the gate oracle re-derives every term in SQL.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fast_causal_inference_spark import stats_distributions as dist

__all__ = ["oaxaca_blinder"]


def oaxaca_blinder(df: DataFrame, Y: str, group: str, X: list[str],
                   group_a=1, group_b=0, reference: str = "pooled",
                   alpha: float = 0.05) -> pd.DataFrame:
    """Decompose mean(Y|group=a) − mean(Y|group=b).

    Returns one row per component: total_gap, explained, unexplained
    (+ per-covariate explained contributions), each with a delta-method
    stderr and normal CI where defined.
    """
    if reference not in ("A", "B", "pooled"):
        raise ValueError("reference must be 'A', 'B', or 'pooled'")
    if not X:
        raise ValueError("oaxaca_blinder needs at least one covariate")
    from fast_causal_inference_spark.operators.ols import ols_grouped

    g = F.expr(group)
    y = F.expr(Y).cast("double")
    work = (df.withColumn("__y", y)
              .withColumn("__g",
                          F.when(g == F.lit(group_a), "A")
                           .when(g == F.lit(group_b), "B"))
              .where(F.col("__g").isNotNull() & F.col("__y").isNotNull()))
    for e in X:
        work = work.where(F.expr(e).cast("double").isNotNull())
    rhs = "+".join(X)
    models = ols_grouped(work, f"__y ~ {rhs}", "__g")
    missing = [k for k in ("A", "B") if k not in models]
    if missing:
        raise ValueError(f"oaxaca_blinder: empty group(s) {missing}")
    mA, mB = models["A"], models["B"]
    k = len(X)

    # group means/covariances and the pooled fit all live inside the
    # sufficient statistics the grouped Gramian scan already shipped:
    # with an intercept, XtX = [[n, Σxᵀ], [Σx, ΣxxᵀT]] and
    # Xty = XtX·β̂, so NO further pass over the data is needed —
    # oaxaca_blinder is genuinely the one groupBy(group) scan its
    # docstring claims
    stats = {}
    gram = {}
    for gi, m in (("A", mA), ("B", mB)):
        XtX = np.linalg.inv(np.asarray(m.xtx_inv, dtype=float))
        Xty = XtX @ np.asarray(m.beta, dtype=float)
        n = float(m.n)
        mean = XtX[0, 1:] / n
        raw2 = XtX[1:, 1:] / n
        cov = raw2 - np.outer(mean, mean)
        stats[gi] = {"n": n, "mean": mean, "cov_mean": cov / n,
                     "ybar": Xty[0] / n}
        gram[gi] = (XtX, Xty, m)
    xA, xB = stats["A"]["mean"], stats["B"]["mean"]
    # design-order vectors (intercept first) for coefficient terms
    dA = np.concatenate([[1.0], xA])
    dB = np.concatenate([[1.0], xB])
    bA = np.asarray(mA.beta, dtype=float)
    bB = np.asarray(mB.beta, dtype=float)
    # a saturated group fit (n == p) has sigma2 = NaN, which would ride
    # silently through every stderr/CI while the point estimates look
    # valid — refuse with the actual problem named
    for g, m in (("A", mA), ("B", mB)):
        if m.n - len(m.beta) < 1 or not np.isfinite(m.sigma2):
            raise ValueError(
                f"oaxaca_blinder: group {g} has n={int(m.n)} rows for "
                f"{len(m.beta)} parameters — no residual degrees of "
                "freedom, its coefficient covariance is undefined")
    covA = mA.sigma2 * mA.xtx_inv
    covB = mB.sigma2 * mB.xtx_inv

    if reference == "A":
        bstar, cov_star = bA, covA
    elif reference == "B":
        bstar, cov_star = bB, covB
    else:
        # pooled fit = solve on the SUMMED group Gramians (Neumark) —
        # closed form on the driver, no refit scan: β_p solves
        # (XtX_A+XtX_B)β = Xty_A+Xty_B, and RSS_p recovers from each
        # group's RSS via y'y_g = RSS_g + β_g'Xty_g
        XtX_p = gram["A"][0] + gram["B"][0]
        Xty_p = gram["A"][1] + gram["B"][1]
        bstar = np.linalg.solve(XtX_p, Xty_p)
        yty = sum(m.sigma2 * max(m.n - len(m.beta), 1.0)
                  + np.asarray(m.beta, float) @ Xty
                  for (XtX, Xty, m) in (gram["A"], gram["B"]))
        n_p = stats["A"]["n"] + stats["B"]["n"]
        rss_p = max(float(yty - bstar @ Xty_p), 0.0)
        sigma2_p = rss_p / max(n_p - (k + 1), 1.0)
        cov_star = sigma2_p * np.linalg.inv(XtX_p)

    gap = stats["A"]["ybar"] - stats["B"]["ybar"]
    dx = xA - xB                                   # covariate gap
    # two-fold identity check: with a group reference, the intercept
    # difference lives in the unexplained term; gap always reconstructs
    # exactly because each group's OLS passes through (x̄, ȳ)
    bstar_x = bstar[1:]                            # slopes under reference
    explained = float(dx @ bstar_x)
    unexplained = gap - explained

    # delta-method SEs: Var(dxᵀβ*) ≈ β*ᵀ(VA+VB)β* + dxᵀ cov(β*) dx,
    # treating groups as independent; per-covariate terms analogous
    V_dx = stats["A"]["cov_mean"] + stats["B"]["cov_mean"]
    cov_star_x = cov_star[1:, 1:]
    se_explained = float(np.sqrt(max(
        bstar_x @ V_dx @ bstar_x + dx @ cov_star_x @ dx, 0.0)))
    # unexplained = dAᵀ(bA − β*) + dBᵀ(β* − bB); conservative SE from the
    # coefficient covariances (mean-vector noise is second order here)
    wA = dA
    wB = dB
    if reference == "A":
        var_unexp = float(wB @ (covA + covB) @ wB)
    elif reference == "B":
        var_unexp = float(wA @ (covA + covB) @ wA)
    else:
        var_unexp = float(wA @ covA @ wA + wB @ covB @ wB
                          + (wA - wB) @ cov_star @ (wA - wB))
    se_unexplained = float(np.sqrt(max(var_unexp, 0.0)))
    nA, nB = stats["A"]["n"], stats["B"]["n"]
    z = float(dist.norm_ppf(1 - alpha / 2))
    rows = [
        {"component": "total_gap", "value": gap, "stderr": np.nan,
         "lower": np.nan, "upper": np.nan},
        {"component": "explained", "value": explained,
         "stderr": se_explained, "lower": explained - z * se_explained,
         "upper": explained + z * se_explained},
        {"component": "unexplained", "value": unexplained,
         "stderr": se_unexplained,
         "lower": unexplained - z * se_unexplained,
         "upper": unexplained + z * se_unexplained},
    ]
    for i, name in enumerate(X):
        contrib = float(dx[i] * bstar_x[i])
        v = (bstar_x[i] ** 2 * V_dx[i, i]
             + dx[i] ** 2 * cov_star_x[i, i])
        se = float(np.sqrt(max(v, 0.0)))
        rows.append({"component": f"explained:{name}", "value": contrib,
                     "stderr": se, "lower": contrib - z * se,
                     "upper": contrib + z * se})
    out = pd.DataFrame(rows)
    out.attrs.update({"n_a": nA, "n_b": nB, "reference": reference,
                      "ybar_a": stats["A"]["ybar"],
                      "ybar_b": stats["B"]["ybar"]})
    return out
