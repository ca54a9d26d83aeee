"""Interrupted time series — segmented regression with Newey-West SEs.

Completes the quasi-experimental toolbox (DiD, 2SLS, RDD, synthetic
control, event study, Callaway-Sant'Anna) with the single-series design:
y_t = β₀ + β₁·t + β₂·post_t + β₃·(t−t₀)·post_t, where β₂ is the level
change and β₃ the slope change at the intervention.

Scale design: the raw event relation collapses to the time grid with ONE
groupBy (the grid is bounded — daily/hourly buckets, not rows), and the
segmented OLS + HAC covariance run driver-side on that bounded grid.
Newey-West is the right variance here because a metric time series is
autocorrelated and the whole point of ITS inference is to not pretend
otherwise.  Cites reference scope: its ``lib/did.py`` ships DiD only —
ITS is the standard companion when no control series exists.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fast_causal_inference_spark import stats_distributions as dist

_FREQ = {"1 hour": "hour", "1 day": "day", "1 week": "week",
         "1 month": "month"}
_MAX_BUCKETS = 100_000


def interrupted_time_series(df: DataFrame, y: str, ts: str,
                            intervention: str, freq: str = "1 day",
                            agg: str = "avg",
                            nw_lags: int | None = None) -> pd.DataFrame:
    """Fit the 4-parameter segmented regression on the ``freq`` grid.

    ``intervention`` — timestamp literal (``'2024-03-01'``); buckets at
    or after it are post-period.  ``agg`` ∈ {avg, sum, count} collapses
    raw rows to one value per bucket.  ``nw_lags`` defaults to the
    Newey-West automatic ⌊4(T/100)^{2/9}⌋.

    Returns rows (Intercept)/trend/level_change/slope_change plus
    ``attributable_effect`` — the mean post-period effect
    β₂ + β₃·mean(t−t₀), with its HAC delta-method SE — each with
    coef/stderr/z/p_value.  attrs: n_buckets, n_pre, n_post, nw_lags.
    """
    if agg not in ("avg", "sum", "count"):
        raise ValueError("agg must be 'avg', 'sum' or 'count'")
    unit = _FREQ.get(freq)
    if unit is None:
        raise ValueError(f"freq must be one of {sorted(_FREQ)}")
    v = F.expr(y).cast("double")
    fagg = {"avg": F.avg(v), "sum": F.sum(v),
            "count": F.count(v).cast("double")}[agg]
    tcol = F.expr(ts).cast("timestamp")
    # NULL metric rows are dropped up front: a bucket whose rows are all
    # NULL would otherwise aggregate to y_t = NULL -> NaN in the design
    # solve, silently poisoning every coefficient (count(v) already
    # counts non-NULL only, so the count path is unchanged).  A bucket
    # with no surviving rows becomes a GRID GAP, which the calendar time
    # index below handles correctly.
    grid = (df.where(tcol.isNotNull() & v.isNotNull())
            .groupBy(F.date_trunc(unit, tcol).alias("bucket"))
            .agg(fagg.alias("y_t"))
            .orderBy("bucket"))
    rows = grid.limit(_MAX_BUCKETS + 1).collect()
    if len(rows) > _MAX_BUCKETS:
        raise ValueError(f"more than {_MAX_BUCKETS} {freq} buckets — "
                         f"coarsen freq")
    T = len(rows)
    if T < 8:
        raise ValueError(f"only {T} {freq} buckets — ITS needs a series")
    yv = np.array([r["y_t"] for r in rows], dtype=float)
    buckets = [r["bucket"] for r in rows]
    cut = pd.Timestamp(intervention)
    post = np.array([1.0 if pd.Timestamp(b) >= cut else 0.0
                     for b in buckets])
    n_post = int(post.sum())
    if n_post == 0 or n_post == T:
        raise ValueError(
            f"intervention {intervention!r} leaves no "
            f"{'post' if n_post == 0 else 'pre'} period on the grid")
    # CALENDAR time index, not the positional row index: with grid gaps
    # (weekends, outages, all-NULL buckets) np.arange silently
    # compresses the time axis, so 'trend' becomes per-observed-bucket
    # and the post-duration regressor miscounts — on a gapless grid the
    # two are identical (goldens unchanged)
    b0 = pd.Timestamp(buckets[0])
    if unit in ("month", "year"):
        step = 12 if unit == "year" else 1
        t = np.array([((pd.Timestamp(b).year - b0.year) * 12
                       + (pd.Timestamp(b).month - b0.month)) / step
                      for b in buckets], dtype=float)
    else:
        secs = {"hour": 3600.0, "day": 86400.0, "week": 604800.0}[unit]
        t = np.array([(pd.Timestamp(b) - b0).total_seconds() / secs
                      for b in buckets], dtype=float)
    t0 = float(t[int(np.argmax(post))])       # first post bucket's time
    X = np.column_stack([np.ones(T), t, post, (t - t0) * post])
    k = X.shape[1]

    XtX = X.T @ X
    beta = np.linalg.solve(XtX, X.T @ yv)
    e = yv - X @ beta
    L = nw_lags if nw_lags is not None \
        else int(math.floor(4.0 * (T / 100.0) ** (2.0 / 9.0)))
    if L < 0 or L >= T - 1:
        raise ValueError(
            f"nw_lags must lie in [0, {T - 1}) — got {L} with T={T}")
    Xe = X * e[:, None]
    S = Xe.T @ Xe                             # Γ0
    for lag in range(1, L + 1):
        w = 1.0 - lag / (L + 1.0)
        G = Xe[lag:].T @ Xe[:-lag]
        S += w * (G + G.T)
    XtX_inv = np.linalg.inv(XtX)
    cov = XtX_inv @ S @ XtX_inv * (T / max(T - k, 1))
    se = np.sqrt(np.maximum(np.diag(cov), 0.0))

    names = ["(Intercept)", "trend", "level_change", "slope_change"]
    est = list(beta)
    ses = list(se)
    # mean post-period effect: c'β with c = [0, 0, 1, mean(t−t0 | post)]
    c = np.array([0.0, 0.0, 1.0, float(((t - t0) * post).sum() / n_post)])
    est.append(float(c @ beta))
    ses.append(float(math.sqrt(max(c @ cov @ c, 0.0))))
    names.append("attributable_effect")
    est = np.asarray(est)
    ses = np.asarray(ses)
    with np.errstate(divide="ignore", invalid="ignore"):
        z = est / ses
    out = pd.DataFrame({
        "name": names, "coef": est, "stderr": ses, "z": z,
        "p_value": 2.0 * np.asarray(dist.norm_sf(np.abs(z)))})
    out.attrs.update({"n_buckets": T, "n_pre": T - n_post,
                      "n_post": n_post, "nw_lags": L,
                      "intervention_index": t0})
    return out
