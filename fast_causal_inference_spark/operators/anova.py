"""Multi-arm tests: one-way ANOVA (classic + Welch), Bartlett's test.

The two-sample t-test family generalizes to k arms here; all three tests
consume the SAME sufficient statistic — one ``groupBy(arm)`` pass of
(n, mean, variance) — so cost is one map-side-combined aggregation and
O(k) driver math regardless of row count.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fast_causal_inference_spark import stats_distributions as dist

__all__ = ["anova_oneway", "bartlett_test"]


def _arm_stats(df: DataFrame, y: str, index: str) -> pd.DataFrame:
    ycol = F.expr(y).cast("double")
    idx = F.col(index) if index.isidentifier() else F.expr(index)
    out = (df.select(idx.cast("string").alias("arm"), ycol.alias("y"))
           .where(F.col("arm").isNotNull() & F.col("y").isNotNull())
           .groupBy("arm")
           .agg(F.count(F.lit(1)).cast("double").alias("n"),
                F.avg("y").alias("mean"),
                F.var_samp("y").alias("var"))
           .toPandas())
    if len(out) < 2:
        raise ValueError("need at least 2 arms")
    if (out.n < 2).any():
        raise ValueError("every arm needs at least 2 rows")
    return out


def anova_oneway(df: DataFrame, y: str, index: str,
                 equal_var: bool = True) -> pd.DataFrame:
    """One-way ANOVA across the levels of ``index``.

    ``equal_var=True`` → classic F-test (between/within mean squares);
    ``False`` → Welch's ANOVA (Welch 1951) with Satterthwaite-style
    denominator df — the k-arm generalization of the Welch t-test.
    Returns one row: f_stat, df_between, df_within, p_value, n, k,
    eta_squared (effect size, classic only)."""
    s = _arm_stats(df, y, index)
    k = len(s)
    n = float(s.n.sum())
    if equal_var:
        grand = float((s.n * s["mean"]).sum() / n)
        ss_between = float((s.n * (s["mean"] - grand) ** 2).sum())
        ss_within = float(((s.n - 1) * s["var"]).sum())
        df_b, df_w = float(k - 1), float(n - k)
        if ss_within <= 0 or df_w <= 0:
            raise ValueError("zero within-group variance")
        f = (ss_between / df_b) / (ss_within / df_w)
        p = float(dist.f_sf(f, df_b, df_w))
        eta2 = ss_between / (ss_between + ss_within)
        return pd.DataFrame([{
            "f_stat": f, "df_between": df_b, "df_within": df_w,
            "p_value": p, "n": n, "k": float(k), "eta_squared": eta2,
        }])
    # Welch: weights w_i = n_i / s_i², weighted grand mean
    if (s["var"] <= 0).any():
        raise ValueError("Welch ANOVA needs positive variance in every arm")
    w = (s.n / s["var"]).to_numpy()
    m = s["mean"].to_numpy()
    sw = w.sum()
    grand = float((w * m).sum() / sw)
    num = float((w * (m - grand) ** 2).sum()) / (k - 1)
    lam = float((((1 - w / sw) ** 2) / (s.n - 1)).sum())
    den = 1.0 + 2.0 * (k - 2) / (k * k - 1.0) * lam
    f = num / den
    df_b = float(k - 1)
    df_w = float((k * k - 1.0) / (3.0 * lam))
    p = float(dist.f_sf(f, df_b, df_w))
    return pd.DataFrame([{
        "f_stat": f, "df_between": df_b, "df_within": df_w,
        "p_value": p, "n": n, "k": float(k),
        "eta_squared": float("nan"),
    }])


def bartlett_test(df: DataFrame, y: str, index: str) -> pd.DataFrame:
    """Bartlett's test of equal variances across arms (the homogeneity
    check before a classic ANOVA)."""
    s = _arm_stats(df, y, index)
    if (s["var"] <= 0).any():
        raise ValueError("Bartlett needs positive variance in every arm")
    k = len(s)
    n = float(s.n.sum())
    sp2 = float(((s.n - 1) * s["var"]).sum() / (n - k))
    stat = float((n - k) * math.log(sp2)
                 - ((s.n - 1) * np.log(s["var"])).sum())
    c = 1.0 + (float((1.0 / (s.n - 1)).sum()) - 1.0 / (n - k)) \
        / (3.0 * (k - 1))
    stat /= c
    p = float(dist.chi2_sf(stat, k - 1))
    return pd.DataFrame([{
        "statistic": stat, "df": float(k - 1), "p_value": p,
        "n": n, "k": float(k),
    }])
