"""Regression discontinuity designs (sharp and fuzzy).

Beyond the reference (its quasi-experimental toolbox stops at DiD and IV —
``dataframe/regression.py`` in the reference Python client): RDD is the
third standard observational design an experimentation platform gets asked
for, and it is exactly suff-stats shaped, so it fits this engine's ONE-scan
pattern.

Estimator: local-linear regression with a kernel weight inside a bandwidth
on each side of the cutoff (the modern default after Imbens-Lemieux 2008 /
Calonico-Cattaneo-Titiunik 2014 — a global polynomial is known-bad).  With
x = running − cutoff and weights w = K(x/h):

* each side fits WLS of Y on [1, x] — closed form from SIX weighted
  moments per side (Σw, Σwx, Σwx², Σwy, Σwxy, Σwy²),
* the sharp effect is the intercept jump τ = α_R − α_L,
* Var(α) uses the classical WLS convention σ̂² (X'WX)⁻¹ with
  σ̂² = Σw·e² / (n − 2) and n the side's in-bandwidth row count,
* the fuzzy effect divides the outcome jump by the treatment-probability
  jump (a local Wald/IV ratio) with a full delta-method SE including the
  within-side covariance of the two intercepts (the outcome and treatment
  fits share the same weights, so Cov(α_Y, α_T) comes from the joint
  moment Σw·y·t — no extra scan).

Spark shape: ONE ``agg`` over conditional weighted sums (pure Columns, no
UDF, partial-aggregated map-side — identical physique to the t-test
suff-stats scan, so it holds at any scale); the 2×2 solves run on the
driver.  The bandwidth is a required explicit parameter: data-driven
selectors (IK/CCT) are a separate concern and any choice can be passed in.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from fast_causal_inference_spark import stats_distributions as dist

_KERNELS = ("triangular", "rectangular", "epanechnikov")


def _kernel_weight(u: Column, kernel: str) -> Column:
    """K(u) on |u| ≤ 1, else 0 (u = x/h)."""
    a = F.abs(u)
    if kernel == "triangular":
        w = 1.0 - a
    elif kernel == "rectangular":
        w = F.lit(1.0)
    else:                                   # epanechnikov
        w = 1.0 - a * a
    return F.when(a <= 1.0, w).otherwise(F.lit(0.0))


def _side_moments(prefix: str, cond: Column, w: Column, x: Column,
                  y: Column, t: Column | None) -> list[Column]:
    """Conditional weighted moments for one side (NULL-safe: a row with a
    NULL outcome — or, in the fuzzy design, a NULL treatment — drops out
    of ALL moments, so the outcome and treatment fits share one row set;
    excluding NULL t only from the t-moments would solve inconsistent
    normal equations, silently imputing t=0)."""
    inarm = cond & w.isNotNull() & (w > 0) & y.isNotNull()
    if t is not None:
        inarm = inarm & t.isNotNull()
    wm = F.when(inarm, w)
    aggs = [
        F.count(wm).cast("double").alias(f"{prefix}_n"),
        F.sum(wm).alias(f"{prefix}_sw"),
        F.sum(wm * x).alias(f"{prefix}_swx"),
        F.sum(wm * x * x).alias(f"{prefix}_swxx"),
        F.sum(wm * y).alias(f"{prefix}_swy"),
        F.sum(wm * x * y).alias(f"{prefix}_swxy"),
        F.sum(wm * y * y).alias(f"{prefix}_swyy"),
    ]
    if t is not None:
        aggs += [
            F.sum(wm * t).alias(f"{prefix}_swt"),
            F.sum(wm * x * t).alias(f"{prefix}_swxt"),
            F.sum(wm * t * t).alias(f"{prefix}_swtt"),
            F.sum(wm * y * t).alias(f"{prefix}_swyt"),
        ]
    return aggs


def _wls_line(r: dict, p: str, yk: str = "y") -> dict:
    """Closed-form WLS of <yk> on [1, x] from one side's moments.

    Returns intercept a, slope b, D = Σw·Σwx²−(Σwx)², and the weighted
    residual sum Σw·e² (via the normal equations:
    Σwe² = Σwy² − aΣwy − bΣwxy)."""
    sw, swx, swxx = (float(r[f"{p}_sw"]), float(r[f"{p}_swx"]),
                     float(r[f"{p}_swxx"]))
    swy = float(r[f"{p}_sw{yk}"])
    swxy = float(r[f"{p}_swx{yk}"])
    swyy = float(r[f"{p}_sw{yk}{yk}"])
    d = sw * swxx - swx * swx
    if d <= 0:
        raise ValueError(
            f"degenerate design on the {'left' if p == 'l' else 'right'} "
            f"side: the running variable has (near-)zero weighted "
            f"variance inside the bandwidth — widen the bandwidth")
    a = (swxx * swy - swx * swxy) / d
    b = (sw * swxy - swx * swy) / d
    ssr = swyy - a * swy - b * swxy
    return {"a": a, "b": b, "d": d, "ssr": max(ssr, 0.0),
            "sw": sw, "swx": swx, "swxx": swxx}


def regression_discontinuity(df: DataFrame, Y: str, running: str,
                             cutoff: float, bandwidth: float,
                             treatment: str | None = None,
                             kernel: str = "triangular",
                             alpha: float = 0.05) -> pd.DataFrame:
    """Sharp (or, with ``treatment``, fuzzy) RDD at ``cutoff``.

    Sharp: τ = lim_{x↓c} E[Y|x] − lim_{x↑c} E[Y|x], estimated as the
    intercept jump of two kernel-weighted local-linear fits.  Fuzzy:
    τ = jump(Y) / jump(T) — the local Wald ratio — with a delta-method
    SE using the within-side covariance of the two intercept estimates.

    Returns one pandas row: estimate, stderr, t_stat, p_value, lower,
    upper, n_left, n_right, intercept_left, intercept_right,
    slope_left, slope_right [, jump_t for fuzzy].  The cutoff row itself
    (x == cutoff) belongs to the RIGHT (treated) side, the usual sharp
    convention.
    """
    if bandwidth <= 0:
        raise ValueError("bandwidth must be > 0")
    if kernel not in _KERNELS:
        raise ValueError(f"kernel must be one of {_KERNELS}")
    x = (F.expr(running).cast("double") - F.lit(float(cutoff)))
    y = F.expr(Y).cast("double")
    t = F.expr(treatment).cast("double") if treatment is not None else None
    w = _kernel_weight(x / F.lit(float(bandwidth)), kernel)
    aggs = (_side_moments("l", x < 0, w, x, y, t)
            + _side_moments("r", x >= 0, w, x, y, t))
    r = df.agg(*aggs).collect()[0].asDict()

    out: dict = {}
    sides = {}
    for p, nk in (("l", "n_left"), ("r", "n_right")):
        n = float(r[f"{p}_n"] or 0.0)
        if n < 3:
            raise ValueError(
                f"only {int(n)} rows with non-NULL outcome inside the "
                f"bandwidth on the {'left' if p == 'l' else 'right'} "
                f"side — local-linear RDD needs at least 3; widen the "
                f"bandwidth")
        fy = _wls_line(r, p)
        sigma2 = fy["ssr"] / (n - 2)
        fy["var_a"] = sigma2 * fy["swxx"] / fy["d"]
        fy["n"] = n
        sides[p] = fy
        out[nk] = n
    tau = sides["r"]["a"] - sides["l"]["a"]
    var = sides["r"]["var_a"] + sides["l"]["var_a"]
    out["intercept_left"] = sides["l"]["a"]
    out["intercept_right"] = sides["r"]["a"]
    out["slope_left"] = sides["l"]["b"]
    out["slope_right"] = sides["r"]["b"]

    if t is not None:
        jt = 0.0
        var_t = 0.0
        cov = 0.0
        for p, sgn in (("r", 1.0), ("l", -1.0)):
            ft = _wls_line(r, p, yk="t")
            n = sides[p]["n"]
            # joint second moments: Σw·e_y·e_t = Σwyt − a_yΣwt − b_yΣwxt
            # (normal equations again), so the intercept covariance is
            # σ̂_yt · Σwx²/D with σ̂_yt the weighted residual cross-moment
            s_yt = (float(r[f"{p}_swyt"])
                    - sides[p]["a"] * float(r[f"{p}_swt"])
                    - sides[p]["b"] * float(r[f"{p}_swxt"]))
            sigma_yt = s_yt / (n - 2)
            ft["var_a"] = (ft["ssr"] / (n - 2)) * ft["swxx"] / ft["d"]
            jt += sgn * ft["a"]
            var_t += ft["var_a"]
            cov += sigma_yt * ft["swxx"] / ft["d"]
        if abs(jt) < 1e-12:
            raise ValueError(
                "fuzzy RDD: the treatment-probability jump at the cutoff "
                "is ~0 — no first stage, the Wald ratio is undefined")
        est = tau / jt
        # delta method on g(a, b) = a/b
        var = (var / (jt * jt) + (tau * tau) * var_t / (jt ** 4)
               - 2.0 * tau * cov / (jt ** 3))
        out["jump_t"] = jt
        tau = est
    se = float(np.sqrt(max(var, 0.0)))
    z = tau / se if se > 0 else float("nan")
    zq = float(dist.norm_ppf(1 - alpha / 2))
    res = {"estimate": tau, "stderr": se, "t_stat": z,
           "p_value": float(2 * dist.norm_sf(abs(z))),
           "lower": tau - zq * se, "upper": tau + zq * se, **out}
    return pd.DataFrame([res])


def mccrary_density_test(df: DataFrame, running: str, cutoff: float,
                         bin_width: float, bandwidth: float,
                         kernel: str = "triangular",
                         alpha: float = 0.05) -> pd.DataFrame:
    """McCrary (2008) manipulation test: is the DENSITY of the running
    variable continuous at the cutoff?  A jump means units sorted
    themselves across the threshold and the RDD identification is suspect
    — the standard falsification check shipped next to every RDD readout.

    Two-step, both distributed: (1) a ``groupBy(floor((x−c)/bin))``
    histogram of the running variable (bins ALIGNED to the cutoff so no
    bin straddles it), normalized to a density estimate per bin center;
    (2) kernel-weighted local-linear fits of the per-bin density on each
    side — the same closed-form WLS as the outcome RDD, over the (tiny)
    bin relation on the driver.  Reported: log-density jump
    θ = ln f̂₊ − ln f̂₋ with the McCrary-style SE from the WLS intercept
    variances (binned-regression convention; the original's asymptotic SE
    differs by O(1) constants — documented, deterministic, testable).

    Returns one row: theta (log jump), f_left, f_right, stderr, t_stat,
    p_value, n, n_bins_left, n_bins_right.
    """
    if bin_width <= 0 or bandwidth <= 0:
        raise ValueError("bin_width and bandwidth must be > 0")
    if kernel not in _KERNELS:
        raise ValueError(f"kernel must be one of {_KERNELS}")
    x = F.expr(running).cast("double") - F.lit(float(cutoff))
    # out-of-bandwidth rows collapse into ONE overflow row (NULL bin): the
    # driver only ever holds the in-bandwidth bin relation plus one row,
    # not the histogram of the variable's whole (possibly huge) domain;
    # the overflow row still feeds the total-n normalizer
    reach = float(bandwidth) + float(bin_width)
    b = F.when(F.abs(x) <= reach,
               F.floor(x / F.lit(float(bin_width))))
    hist = (df.where(x.isNotNull()).groupBy(b.alias("bin"))
            .agg(F.count(F.lit(1)).alias("cnt")).collect())
    if not hist:
        raise ValueError("no non-NULL running-variable rows")
    n = float(sum(r["cnt"] for r in hist))
    counts = {int(r["bin"]): float(r["cnt"]) for r in hist
              if r["bin"] is not None}
    # the FULL equally-spaced grid inside the reach, empty bins at
    # density 0 — fitting only occupied bin centers overestimates the
    # boundary density of discrete/sparse running variables (a 1-in-5
    # occupancy would read 5× high)
    import math as _math

    b_lo = int(_math.floor(-reach / bin_width))
    b_hi = int(_math.ceil(reach / bin_width))
    rows = []
    for bi in range(b_lo, b_hi + 1):
        center = (bi + 0.5) * bin_width                # bin midpoint
        dens = counts.get(bi, 0.0) / (n * bin_width)
        rows.append((center, dens))

    def _side(mask_right: bool) -> dict:
        pts = [(c, d) for c, d in rows if (c >= 0) == mask_right]
        xs = np.array([c for c, _ in pts])
        ds = np.array([d for _, d in pts])
        w = np.clip(1.0 - np.abs(xs / bandwidth), 0.0, None) \
            if kernel == "triangular" else (
            (np.abs(xs) <= bandwidth).astype(float) if kernel ==
            "rectangular" else np.clip(1.0 - (xs / bandwidth) ** 2,
                                       0.0, None))
        m = w > 0
        xs, ds, w = xs[m], ds[m], w[m]
        k = len(xs)
        if k < 3:
            raise ValueError(
                f"only {k} histogram bins inside the bandwidth on the "
                f"{'right' if mask_right else 'left'} side — shrink "
                f"bin_width or widen bandwidth")
        X = np.column_stack([np.ones(k), xs])
        G = (X.T * w) @ X
        beta = np.linalg.solve(G, (X.T * w) @ ds)
        e = ds - X @ beta
        sigma2 = float(np.sum(w * e * e)) / (k - 2)
        var_a = sigma2 * np.linalg.inv(G)[0, 0]
        return {"f": float(beta[0]), "var": var_a, "k": k}

    left, right = _side(False), _side(True)
    fl, fr = left["f"], right["f"]
    if fl <= 0 or fr <= 0:
        raise ValueError(
            "estimated boundary density is non-positive on one side — "
            "the local-linear extrapolation left the support; shrink the "
            "bandwidth")
    theta = float(np.log(fr) - np.log(fl))
    se = float(np.sqrt(right["var"] / (fr * fr) + left["var"] / (fl * fl)))
    z = theta / se if se > 0 else float("nan")
    return pd.DataFrame([{
        "theta": theta, "f_left": fl, "f_right": fr, "stderr": se,
        "t_stat": z, "p_value": float(2 * dist.norm_sf(abs(z))),
        "n": n, "n_bins_left": float(left["k"]),
        "n_bins_right": float(right["k"]),
    }])
