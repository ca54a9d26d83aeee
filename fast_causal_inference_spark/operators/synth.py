"""Synthetic control (Abadie-Gardeazabal-Hainmueller) for panel data.

Beyond the reference (its quasi-experimental surface is DiD + IV; with
RDD in ``operators/rdd.py`` this completes the standard toolbox): one
treated unit, a donor pool, weights on the simplex chosen so the weighted
donors track the treated unit pre-intervention; the post-period gap is
the effect.  Inference is Abadie's in-space placebo permutation: refit
with each donor as pseudo-treated and rank effect sizes.

Spark shape: the panel collapses to a (unit × period) matrix via ONE
``groupBy(unit, time)`` aggregation — a synthetic-control donor pool is
small BY DESIGN (tens to hundreds of units; the method's bias bounds
degrade with donor count), so the driver-side matrix is bounded and
``max_cells`` enforces that explicitly.  The raw panel underneath can be
arbitrarily large (billions of rows aggregate to the cell level
map-side).  The simplex-constrained least squares solves with FISTA +
the Duchi simplex projection — deterministic, no seed, no scipy.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _project_simplex(v: np.ndarray) -> np.ndarray:
    """Euclidean projection onto the probability simplex (Duchi et al.
    2008): sort, find the threshold, clip.  Deterministic."""
    u = np.sort(v)[::-1]
    css = np.cumsum(u) - 1.0
    rho = np.nonzero(u * np.arange(1, len(v) + 1) > css)[0][-1]
    theta = css[rho] / (rho + 1.0)
    return np.maximum(v - theta, 0.0)


def _simplex_lsq(A: np.ndarray, b: np.ndarray, iters: int = 5000,
                 tol: float = 1e-12) -> np.ndarray:
    """min_w ||A w − b||² over the probability simplex — FISTA with the
    Duchi projection (Frank-Wolfe's O(1/k) zig-zag is too slow for
    interior optima; accelerated projected gradient reaches ~1e-8 in a
    few hundred steps at these sizes).  Deterministic: uniform start;
    the step uses L = tr(G) — a PROVABLE upper bound on λ_max for PSD G
    (a power-iteration estimate can under-shoot when the start vector is
    orthogonal to the top eigenvector, e.g. exactly anticorrelated
    donors, and FISTA then has no convergence guarantee); the ≤k×
    over-estimate just costs iterations, which 5000 covers at donor-pool
    sizes."""
    k = A.shape[1]
    G = A.T @ A
    L = float(np.trace(G)) + 1e-12
    Atb = A.T @ b
    w = np.full(k, 1.0 / k)
    z = w.copy()
    t = 1.0
    for _ in range(iters):
        w_new = _project_simplex(z - (G @ z - Atb) / L)
        t_new = (1.0 + np.sqrt(1.0 + 4.0 * t * t)) / 2.0
        z = w_new + ((t - 1.0) / t_new) * (w_new - w)
        if float(np.abs(w_new - w).max()) < tol:
            w = w_new
            break
        w, t = w_new, t_new
    return w


def synthetic_control(df: DataFrame, unit: str, time: str, Y: str,
                      treated_unit, treatment_time,
                      agg: str = "avg", placebos: bool = True,
                      screen_multiple: float | None = None,
                      max_cells: int = 100_000) -> dict:
    """Fit a synthetic control for ``treated_unit`` intervened at
    ``treatment_time`` (first treated period).

    ``agg`` — how row-level data collapses to (unit, period) cells
    (``'avg'`` or ``'sum'``).  Returns a dict:

    * ``weights`` — pandas (unit, weight) for the donor pool,
    * ``path`` — pandas (time, actual, synthetic, effect, is_post),
    * ``att`` — mean post-period effect,
    * ``pre_rmspe`` / ``post_rmspe`` — fit quality / effect size,
    * with ``placebos=True``: ``placebo_att`` per donor, ``p_value`` —
      the rank of the treated unit's post/pre RMSPE ratio among ALL
      units (Abadie's in-space permutation test), and ``rmspe_ratio``.
      ``screen_multiple`` (optional, e.g. 5.0) additionally drops donors
      whose pre-RMSPE exceeds that multiple of the treated unit's from
      the ranking — Abadie's poor-fit screen; it is OFF by default
      because a near-exact treated fit would screen out every donor and
      degenerate the p-value to 1.
    """
    if agg not in ("avg", "sum"):
        raise ValueError("agg must be 'avg' or 'sum'")
    aggfn = F.avg if agg == "avg" else F.sum
    # NULL unit/time keys drop (the _dml_residuals fold-key convention):
    # a NULL unit would otherwise pivot into a phantom NaN-labeled donor
    cells = (df.where(F.col(unit).isNotNull() & F.col(time).isNotNull())
             .groupBy(F.col(unit).alias("__u"), F.col(time).alias("__t"))
             .agg(aggfn(F.expr(Y).cast("double")).alias("__y"))
             .limit(max_cells + 1).collect())
    if len(cells) > max_cells:
        raise ValueError(
            f"panel has more than max_cells={max_cells} (unit, period) "
            f"cells — synthetic control wants a small donor pool; "
            f"pre-filter the donor units or raise max_cells")
    pdf = pd.DataFrame([(r["__u"], r["__t"], r["__y"]) for r in cells],
                       columns=["unit", "time", "y"])
    wide = pdf.pivot(index="time", columns="unit", values="y").sort_index()
    if treated_unit not in wide.columns:
        raise ValueError(f"treated unit {treated_unit!r} not in panel")
    if wide.isna().any().any():
        missing = wide.columns[wide.isna().any()].tolist()
        raise ValueError(
            f"unbalanced panel: units {missing[:5]} miss some periods — "
            f"synthetic control needs every unit observed every period")
    pre = np.asarray(wide.index < treatment_time)
    if pre.sum() < 2:
        raise ValueError("need at least 2 pre-treatment periods")
    if (~pre).sum() < 1:
        raise ValueError("no post-treatment periods after treatment_time")
    donors = [c for c in wide.columns if c != treated_unit]
    if not donors:
        raise ValueError("no donor units")

    def _fit(target):
        # Abadie's in-space placebo: a pseudo-treated donor is fit from
        # the OTHER DONORS ONLY — the actually-treated unit must never
        # enter a placebo pool, or its post-period treatment effect
        # leaks into every placebo's synthetic path and distorts the
        # permutation p-value
        pool = [c for c in wide.columns
                if c != target and c != treated_unit]
        A = wide.loc[pre, pool].to_numpy(dtype=float)
        b = wide.loc[pre, target].to_numpy(dtype=float)
        w = _simplex_lsq(A, b)
        synth = wide[pool].to_numpy(dtype=float) @ w
        actual = wide[target].to_numpy(dtype=float)
        eff = actual - synth
        pre_r = float(np.sqrt(np.mean(eff[pre] ** 2)))
        post_r = float(np.sqrt(np.mean(eff[~pre] ** 2)))
        return pool, w, actual, synth, eff, pre_r, post_r

    pool, w, actual, synth, eff, pre_r, post_r = _fit(treated_unit)
    path = pd.DataFrame({"time": wide.index, "actual": actual,
                         "synthetic": synth, "effect": eff,
                         "is_post": ~pre})
    att = float(eff[~pre].mean())
    out = {
        "weights": pd.DataFrame({"unit": pool, "weight": w})
        .sort_values("unit").reset_index(drop=True),
        "path": path, "att": att,
        "pre_rmspe": pre_r, "post_rmspe": post_r,
    }
    if placebos:
        ratios = {treated_unit: post_r / max(pre_r, 1e-12)}
        placebo_att = {}
        screen = []
        for d in donors:
            _, _, _, _, e_d, pre_d, post_d = _fit(d)
            placebo_att[d] = float(e_d[~pre].mean())
            if (screen_multiple is not None
                    and pre_d > screen_multiple * max(pre_r, 1e-12)):
                screen.append(d)
            else:
                ratios[d] = post_d / max(pre_d, 1e-12)
        vals = np.array(list(ratios.values()))
        out["placebo_att"] = pd.DataFrame(
            sorted(placebo_att.items()), columns=["unit", "att"])
        out["rmspe_ratio"] = ratios[treated_unit]
        out["p_value"] = float(
            (vals >= ratios[treated_unit] - 1e-12).sum() / len(vals))
        out["screened_out"] = screen
    return out
