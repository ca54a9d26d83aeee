"""Contingency-table tests: chi-square independence and Fisher's exact
test (2×2) — the categorical-outcome companions to ``srm`` (which is the
one-way goodness-of-fit chi-square).

Scale shape: ONE ``groupBy(x, y).count()`` — the contingency table is the
sufficient statistic (O(levels²) rows to the driver); all test math is
closed-form numpy on the driver.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fast_causal_inference_spark import stats_distributions as dist

__all__ = ["chi_square_independence", "cmh_test", "fisher_exact_2x2"]

_MAX_CELLS = 100_000


def _crosstab(df: DataFrame, x: str, y: str) -> pd.DataFrame:
    xcol = F.col(x) if x.isidentifier() else F.expr(x)
    ycol = F.col(y) if y.isidentifier() else F.expr(y)
    sub = (df.select(xcol.cast("string").alias("x"),
                     ycol.cast("string").alias("y"))
             .where(F.col("x").isNotNull() & F.col("y").isNotNull()))
    pdf = (sub.groupBy("x", "y").agg(F.count(F.lit(1)).alias("n"))
           .limit(_MAX_CELLS + 1).toPandas())
    if len(pdf) > _MAX_CELLS:
        raise ValueError(
            f"contingency table exceeds {_MAX_CELLS} cells; a test over "
            f"near-continuous categories is not meaningful — bucket first")
    return pdf.pivot_table(index="x", columns="y", values="n",
                           fill_value=0, aggfunc="sum")


def chi_square_independence(df: DataFrame, x: str, y: str,
                            correction: bool = False) -> pd.DataFrame:
    """Pearson chi-square test of independence of two categorical
    columns.  Returns one row: chi2, df, p_value, n, plus Cramér's V
    effect size.  ``correction`` applies Yates' continuity correction
    (2×2 only, scipy-compatible)."""
    tab = _crosstab(df, x, y).to_numpy(dtype=float)
    if tab.shape[0] < 2 or tab.shape[1] < 2:
        raise ValueError("both columns need at least 2 observed levels")
    n = tab.sum()
    exp = np.outer(tab.sum(axis=1), tab.sum(axis=0)) / n
    if (exp == 0).any():
        raise ValueError("degenerate margin (zero expected count)")
    diff = np.abs(tab - exp)
    if correction and tab.shape == (2, 2):
        diff = np.maximum(diff - 0.5, 0.0)
    chi2 = float((diff ** 2 / exp).sum())
    dof = (tab.shape[0] - 1) * (tab.shape[1] - 1)
    p = float(dist.chi2_sf(chi2, dof))
    k = min(tab.shape) - 1
    cramers_v = math.sqrt(chi2 / (n * k)) if n * k > 0 else float("nan")
    return pd.DataFrame([{
        "chi2": chi2, "df": float(dof), "p_value": p, "n": float(n),
        "cramers_v": cramers_v,
    }])


def fisher_exact_2x2(df: DataFrame, x: str, y: str,
                     alternative: str = "two-sided") -> pd.DataFrame:
    """Fisher's exact test on a 2×2 table (exact hypergeometric null —
    the small-count companion to the chi-square).  Returns odds_ratio and
    p_value; log-space factorials keep it stable for large counts."""
    tab = _crosstab(df, x, y)
    if tab.shape != (2, 2):
        raise ValueError(f"fisher_exact_2x2 needs a 2×2 table, got "
                         f"{tab.shape[0]}×{tab.shape[1]}")
    a, b = float(tab.iloc[0, 0]), float(tab.iloc[0, 1])
    c, d = float(tab.iloc[1, 0]), float(tab.iloc[1, 1])
    odds = (a * d) / (b * c) if b * c > 0 else float("inf")

    from math import lgamma

    def lchoose(nn: float, kk: float) -> float:
        return (lgamma(nn + 1) - lgamma(kk + 1) - lgamma(nn - kk + 1))

    r1, r2 = a + b, c + d
    c1 = a + c
    n = r1 + r2
    denom = lchoose(n, c1)

    def pmf(aa: int) -> float:
        return math.exp(lchoose(r1, aa) + lchoose(r2, c1 - aa) - denom)

    lo = int(max(0, c1 - r2))
    hi = int(min(r1, c1))
    probs = {aa: pmf(aa) for aa in range(lo, hi + 1)}
    p_obs = probs[int(a)]
    if alternative == "two-sided":
        # sum of all tables at most as probable as observed (scipy rule)
        p = sum(pv for pv in probs.values() if pv <= p_obs * (1 + 1e-9))
    elif alternative == "greater":
        p = sum(pv for aa, pv in probs.items() if aa >= a)
    elif alternative == "less":
        p = sum(pv for aa, pv in probs.items() if aa <= a)
    else:
        raise ValueError("alternative must be two-sided|greater|less")
    return pd.DataFrame([{
        "odds_ratio": odds, "p_value": float(min(p, 1.0)),
        "n": float(n),
    }])


def cmh_test(df: DataFrame, x: str, y: str, stratum: str) -> pd.DataFrame:
    """Cochran–Mantel–Haenszel test + MH common odds ratio over
    stratified 2×2 tables — the Simpson's-paradox-proof association test
    (condition on the stratum, pool evidence across strata).

    Sufficient statistic: one ``groupBy(stratum, x, y).count()`` pass;
    per-stratum 2×2 cells come to the driver (O(#strata) rows).  Uses the
    continuity-corrected CMH chi-square (the R ``mantelhaen.test``
    default) and the MH odds-ratio estimator."""
    xcol = F.col(x) if x.isidentifier() else F.expr(x)
    ycol = F.col(y) if y.isidentifier() else F.expr(y)
    scol = F.col(stratum) if stratum.isidentifier() else F.expr(stratum)
    pdf = (df.select(scol.cast("string").alias("s"),
                     xcol.cast("string").alias("x"),
                     ycol.cast("string").alias("y"))
           .where(F.col("s").isNotNull() & F.col("x").isNotNull()
                  & F.col("y").isNotNull())
           .groupBy("s", "x", "y").agg(F.count(F.lit(1)).alias("n"))
           .limit(_MAX_CELLS + 1).toPandas())
    if len(pdf) > _MAX_CELLS:
        raise ValueError(f"more than {_MAX_CELLS} stratum cells")
    xlv = sorted(pdf.x.unique())
    ylv = sorted(pdf.y.unique())
    if len(xlv) != 2 or len(ylv) != 2:
        raise ValueError(f"cmh_test needs binary x and y, got "
                         f"{len(xlv)}×{len(ylv)} levels")
    num = den = 0.0           # CMH statistic pieces
    or_num = or_den = 0.0     # MH odds ratio pieces
    n_strata = 0
    for _, grp in pdf.groupby("s"):
        cell = {(r.x, r.y): float(r.n) for r in grp.itertuples()}
        a = cell.get((xlv[0], ylv[0]), 0.0)
        b = cell.get((xlv[0], ylv[1]), 0.0)
        c = cell.get((xlv[1], ylv[0]), 0.0)
        d = cell.get((xlv[1], ylv[1]), 0.0)
        t = a + b + c + d
        if t == 0:
            continue
        n_strata += 1
        r1, c1 = a + b, a + c
        num += a - r1 * c1 / t
        den += (r1 * (t - r1) * c1 * (t - c1)) / (t * t * (t - 1)) \
            if t > 1 else 0.0
        or_num += a * d / t
        or_den += b * c / t
    if den <= 0:
        raise ValueError("degenerate strata (no within-stratum variance)")
    stat = (abs(num) - 0.5) ** 2 / den       # continuity-corrected
    p = float(dist.chi2_sf(stat, 1))
    mh_or = or_num / or_den if or_den > 0 else float("inf")
    return pd.DataFrame([{
        "statistic": float(stat), "df": 1.0, "p_value": p,
        "mh_odds_ratio": float(mh_or), "n_strata": float(n_strata),
    }])
