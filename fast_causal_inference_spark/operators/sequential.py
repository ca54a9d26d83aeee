"""Group-sequential testing — Lan–DeMets alpha-spending boundaries and
a scheduled-looks two-sample z monitor.

The streaming module's mSPRT gives always-valid p-values for continuous
monitoring; this operator covers the OTHER standard experiment-platform
design: a fixed schedule of interim looks with an alpha-spending
function (O'Brien–Fleming-like or Pocock-like), the design used when
readouts happen at planned milestones.

Boundaries come from the exact recursive-integration construction
(Armitage 1969; Lan & DeMets 1983): the joint law of the sequential z
statistics is a Gaussian random walk in information time, so the
sub-density of "not yet crossed" paths is propagated on a grid and each
look's critical value is solved so the incremental crossing probability
equals the alpha spent on that look. This matches the published
Lan–DeMets tables to ~3 decimals (tested), unlike the naive
``Φ⁻¹(1 − a(t_k)/2)`` shortcut which ignores the correlation between
looks.

Spark's share is one sufficient-statistics aggregation per call —
``groupBy(look)`` counts/sums/squares, cumulated driver-side — so the
monitor scales exactly like ``ttest_2samp``.
"""

from __future__ import annotations

import math
import threading

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .. import stats_distributions as dist

__all__ = ["alpha_spending", "conditional_power",
           "group_sequential_boundaries", "group_sequential_ttest"]

_GRID = 2001          # sub-density grid points per look
_KERN_TLS = threading.local()  # reused _GRID x _GRID kernel buffer

# C-speed exact normal tails for the boundary recursion: the library
# erf routes through an iterative incomplete-gamma continued fraction
# (fine for scalars, ~3 s for the grid sweeps here); math.erfc is a
# double-precision libm call
def _erfc_vec(x: np.ndarray) -> np.ndarray:
    # element-wise libm erfc without ufunc boxing: ~6x faster than
    # frompyfunc(...).astype(float), bit-identical values (same libm call)
    x = np.asarray(x, dtype=np.float64)
    return np.fromiter(map(math.erfc, np.ravel(x).tolist()), np.float64,
                       count=x.size).reshape(x.shape)


def _nsf(x: np.ndarray) -> np.ndarray:
    """Vectorized exact norm_sf via libm erfc."""
    return 0.5 * _erfc_vec(np.asarray(x) / math.sqrt(2.0))


def alpha_spending(t: float, alpha: float = 0.05,
                   style: str = "obf") -> float:
    """Cumulative two-sided alpha spent by information fraction ``t``.

    ``style='obf'`` — Lan–DeMets O'Brien–Fleming-like:
    ``2 − 2Φ(z_{α/2}/√t)``; ``style='pocock'`` — Pocock-like:
    ``α·ln(1 + (e−1)·t)``."""
    if not 0.0 < t <= 1.0:
        raise ValueError("information fraction t must be in (0, 1]")
    if style == "obf":
        z = float(dist.norm_ppf(1 - alpha / 2))
        return float(2.0 - 2.0 * dist.norm_cdf(z / math.sqrt(t)))
    if style == "pocock":
        return float(alpha * math.log(1.0 + (math.e - 1.0) * t))
    raise ValueError(f"unknown spending style {style!r}")


def group_sequential_boundaries(info_fractions, alpha: float = 0.05,
                                style: str = "obf") -> np.ndarray:
    """Two-sided critical values z_k for looks at the given increasing
    information fractions, by exact recursive integration of the
    Brownian sub-density."""
    ts = [float(t) for t in info_fractions]
    if not ts or any(b <= a for a, b in zip(ts, ts[1:])) or ts[-1] > 1.0 \
            or ts[0] <= 0.0:
        raise ValueError("info_fractions must be increasing in (0, 1]")
    spends = [alpha_spending(t, alpha, style) for t in ts]
    bounds = []
    grid = None          # S-scale grid of surviving paths
    density = None       # sub-density on that grid
    t_prev = 0.0
    spent_prev = 0.0
    for t_k, spend_k in zip(ts, spends):
        tau = t_k - t_prev
        sd = math.sqrt(tau)
        inc = max(spend_k - spent_prev, 1e-12)

        if density is None:
            def tail(c):
                return 2.0 * float(_nsf(np.array([c / sd]))[0])
        else:
            g, f = grid, density
            dx = g[1] - g[0]

            def tail(c):
                up = _nsf((c - g) / sd)
                dn = _nsf((c + g) / sd)   # Φ(−c−g) = sf(c+g)
                return float(np.trapz(f * (up + dn), dx=dx))

        lo, hi = 0.0, 12.0
        for _ in range(60):
            mid = (lo + hi) / 2.0
            if tail(mid) > inc:
                lo = mid
            else:
                hi = mid
        c_k = (lo + hi) / 2.0     # S-scale critical value
        bounds.append(c_k / math.sqrt(t_k))

        # propagate the sub-density of survivors to the next look
        new_grid = np.linspace(-c_k, c_k, _GRID)
        if density is None:
            new_density = np.exp(-new_grid ** 2 / (2 * tau)) \
                / math.sqrt(2 * math.pi * tau)
        else:
            g, f = grid, density
            dx = g[1] - g[0]
            # in-place pipeline over ONE reused buffer: the broadcast
            # expression form allocates four _GRID x _GRID (32 MB)
            # temporaries per look, and under this kernel's expensive
            # first-touch faults the allocation churn — not the exps —
            # dominated the family's driver time (the bench's bimodal
            # 1.3 s / 10 s spread).  The thread-local buffer keeps the
            # pages faulted in across looks AND calls.  Each step below
            # is the same elementwise op on the same values (np.square is
            # ** 2, (-x)/c == -(x/c) in IEEE), so the kernel matrix and
            # every boundary derived from it are bit-identical.
            kern = getattr(_KERN_TLS, "buf", None)
            if kern is None or kern.shape != (len(new_grid), len(g)):
                kern = np.empty((len(new_grid), len(g)))
                _KERN_TLS.buf = kern
            np.subtract.outer(new_grid, g, out=kern)
            np.square(kern, out=kern)
            np.divide(kern, 2 * tau, out=kern)
            np.negative(kern, out=kern)
            np.exp(kern, out=kern)
            kern /= math.sqrt(2 * math.pi * tau)
            new_density = kern @ f * dx
        grid, density = new_grid, new_density
        t_prev, spent_prev = t_k, spend_k
    return np.array(bounds)


def group_sequential_ttest(df: DataFrame, y: str, index: str,
                           look: str, alpha: float = 0.05,
                           style: str = "obf",
                           treatment_values: tuple = (0, 1),
                           max_looks: int = 50,
                           total_info: float | None = None) -> pd.DataFrame:
    """Scheduled-looks two-sample monitor: one suff-stats pass grouped by
    the ``look`` column (an increasing period label — day, week, batch);
    per look the CUMULATIVE z statistic, the spending boundary at the
    realized information fraction, the crossing decision, and cumulative
    alpha spent.

    Information = cumulative ``1/(1/n0 + 1/n1)`` (the standard
    equal-variance metric; ≈ n/2 per arm at 50/50 split).

    **For INTERIM monitoring pass ``total_info``** — the information the
    experiment is PLANNED to reach at its final look (e.g.
    ``1/(1/N0 + 1/N1)`` from the designed per-arm sizes). The spending
    boundaries are then computed at the true fractions and the type-I
    guarantee holds across repeated interim calls. With
    ``total_info=None`` the latest look in the data is treated as final
    (fraction 1.0, full alpha spent) — correct ONLY for a one-shot
    retrospective analysis after the experiment ended; calling it that
    way every week reproduces naive repeated testing."""
    c_val, t_val = treatment_values
    yc = F.expr(y).cast("double")
    rows = (df.where(F.expr(index).isin(list(treatment_values))
                     & yc.isNotNull() & F.expr(look).isNotNull())
            .groupBy(F.expr(look).alias("__look"),
                     # 0/1 server-side: the raw collected value would
                     # miss the driver dict when the column's type
                     # differs from treatment_values (string '0' vs 0)
                     F.when(F.expr(index) == F.lit(treatment_values[0]), 0)
                     .otherwise(1).alias("__arm"))
            .agg(F.count(F.lit(1)).alias("n"), F.sum(yc).alias("s"),
                 F.sum(yc * yc).alias("ss"))
            .collect())
    looks = sorted({r["__look"] for r in rows})
    if len(looks) > max_looks:
        raise ValueError(
            f"{len(looks)} looks exceed max_looks={max_looks}; the look "
            f"column should be a coarse schedule label, not a timestamp")
    agg: dict = {}
    for r in rows:
        agg[(r["__look"], treatment_values[int(r["__arm"])])] = (
            float(r["n"]), float(r["s"]), float(r["ss"]))
    cum = {v: [0.0, 0.0, 0.0] for v in treatment_values}
    per_look = []
    for lk in looks:
        for v in treatment_values:
            n, s, ss = agg.get((lk, v), (0.0, 0.0, 0.0))
            cum[v][0] += n
            cum[v][1] += s
            cum[v][2] += ss
        (n0, s0, ss0), (n1, s1, ss1) = cum[c_val], cum[t_val]
        if n0 < 2 or n1 < 2:
            per_look.append((lk, n0, n1, np.nan, np.nan))
            continue
        m0, m1 = s0 / n0, s1 / n1
        # clamp: catastrophic cancellation on a constant metric can make
        # the subtraction go ~-1e-17, and sqrt(negative) killed the
        # whole monitor with a math-domain error before the se>0 guard
        v0 = max((ss0 - n0 * m0 * m0) / (n0 - 1), 0.0)
        v1 = max((ss1 - n1 * m1 * m1) / (n1 - 1), 0.0)
        se = math.sqrt(v0 / n0 + v1 / n1)
        z = (m1 - m0) / se if se > 0 else 0.0
        info = 1.0 / (1.0 / n0 + 1.0 / n1)
        per_look.append((lk, n0, n1, z, info))
    infos = [p[4] for p in per_look if not np.isnan(p[4])]
    if not infos:
        raise ValueError("no look has >= 2 rows per arm")
    if total_info is None:
        denom = infos[-1]
        fracs = [i / denom for i in infos]
        fracs[-1] = 1.0
    else:
        if total_info < infos[-1]:
            raise ValueError(
                f"total_info={total_info} is below the information "
                f"already accrued ({infos[-1]:.1f}); pass the PLANNED "
                f"final information")
        fracs = [min(i / float(total_info), 1.0) for i in infos]
    bounds = group_sequential_boundaries(fracs, alpha, style)
    # the conditional-power reference must be the boundary of the FULL
    # schedule's final analysis (t = 1), not the latest observed look:
    # in interim-monitoring mode (total_info given) fracs never reaches
    # 1, and bounds[-1] is an interim OBF boundary (e.g. 2.96 at t=0.5)
    # — CP against it is drastically understated and triggers false
    # futility stops
    if fracs[-1] >= 1.0:
        z_final = float(bounds[-1])
    else:
        z_final = float(group_sequential_boundaries(
            fracs + [1.0], alpha, style)[-1])
    out, bi = [], 0
    for lk, n0, n1, z, info in per_look:
        if np.isnan(z):
            out.append({"look": lk, "n0": n0, "n1": n1, "z": np.nan,
                        "info_fraction": np.nan, "boundary": np.nan,
                        "crossed": False, "alpha_spent": 0.0,
                        "conditional_power": np.nan})
            continue
        t_k = fracs[bi]
        # current-trend futility signal at a true interim (t < 1); the
        # final critical value is the last spending boundary
        cp = conditional_power(z, t_k, alpha,
                               z_final=z_final) if t_k < 1.0 else np.nan
        out.append({"look": lk, "n0": n0, "n1": n1, "z": z,
                    "info_fraction": t_k,
                    "boundary": float(bounds[bi]),
                    "crossed": bool(abs(z) >= bounds[bi]),
                    "alpha_spent": alpha_spending(t_k, alpha, style),
                    "conditional_power": cp})
        bi += 1
    return pd.DataFrame(out)


def conditional_power(z: float, info_fraction: float,
                      alpha: float = 0.05, z_final: float | None = None,
                      drift: float | None = None) -> float:
    """Probability of ending with |Z| past the final critical value,
    given the interim state — the standard futility monitor (stop for
    futility when CP under the current trend falls below ~0.1).

    The sequential score process is Brownian in information time:
    ``S_1 | S_t ~ N(S_t + θ(1−t), 1−t)`` with ``S_t = z·√t``.
    ``drift=None`` uses the CURRENT-TREND estimate ``θ̂ = S_t/t`` (the
    usual convention); pass ``drift=0.0`` for conditional power under
    H0 (the type-I view) or a design drift for the planning view.
    ``z_final`` defaults to the fixed-test z_{α/2}; pass the last
    spending boundary when monitoring against a group-sequential design.
    Crossing is evaluated in the trend's direction (the opposite tail is
    negligible in any non-degenerate case)."""
    t = float(info_fraction)
    if not 0.0 < t < 1.0:
        raise ValueError("info_fraction must be in (0, 1) at an interim")
    zc = float(z_final) if z_final is not None \
        else float(dist.norm_ppf(1 - alpha / 2))
    s_t = z * math.sqrt(t)
    theta = (s_t / t) if drift is None else float(drift)
    sd = math.sqrt(1.0 - t)
    mean_final = s_t + theta * (1.0 - t)
    if z >= 0:
        return float(dist.norm_sf((zc - mean_final) / sd))
    return float(dist.norm_cdf((-zc - mean_final) / sd))
