"""Distribution functions in pure numpy (no scipy in this environment).

Implements the regularized incomplete beta/gamma functions with the classic
continued-fraction / series expansions (Lentz's algorithm — standard public
formulas) and builds Student-t, chi-square, F, normal, and Kolmogorov
distributions on top. Vectorized over numpy arrays; accuracy ~1e-12, far below
the 1e-6 tolerance used by the golden tests.
"""

from __future__ import annotations

import math

import numpy as np

_EPS = 3e-16
_FPMIN = 1e-300


def _betacf(a, b, x):
    """Continued fraction for the incomplete beta function (vectorized)."""
    a = np.asarray(a, dtype=float)
    b = np.asarray(b, dtype=float)
    x = np.asarray(x, dtype=float)
    qab = a + b
    qap = a + 1.0
    qam = a - 1.0
    c = np.ones_like(x)
    d = 1.0 - qab * x / qap
    d = np.where(np.abs(d) < _FPMIN, _FPMIN, d)
    d = 1.0 / d
    h = d.copy()
    for m in range(1, 300):
        m2 = 2 * m
        aa = m * (b - m) * x / ((qam + m2) * (a + m2))
        d = 1.0 + aa * d
        d = np.where(np.abs(d) < _FPMIN, _FPMIN, d)
        c = 1.0 + aa / c
        c = np.where(np.abs(c) < _FPMIN, _FPMIN, c)
        d = 1.0 / d
        h = h * d * c
        aa = -(a + m) * (qab + m) * x / ((a + m2) * (qap + m2))
        d = 1.0 + aa * d
        d = np.where(np.abs(d) < _FPMIN, _FPMIN, d)
        c = 1.0 + aa / c
        c = np.where(np.abs(c) < _FPMIN, _FPMIN, c)
        d = 1.0 / d
        delta = d * c
        h = h * delta
        if np.all(np.abs(delta - 1.0) < _EPS):
            break
    return h


def betainc(a, b, x):
    """Regularized incomplete beta I_x(a, b), vectorized."""
    a = np.asarray(a, dtype=float)
    b = np.asarray(b, dtype=float)
    x = np.asarray(x, dtype=float)
    x = np.clip(x, 0.0, 1.0)
    # over='ignore' too: BOTH the direct and the symmetric branch are
    # computed for every element and the unused one may overflow exp —
    # its value is discarded by the np.where below, but the
    # RuntimeWarning would spam every executor log at scale
    with np.errstate(divide="ignore", invalid="ignore", over="ignore"):
        lbeta = (np.vectorize(math.lgamma, otypes=[float])(a + b)
                 - np.vectorize(math.lgamma, otypes=[float])(a)
                 - np.vectorize(math.lgamma, otypes=[float])(b))
        front = np.exp(lbeta + a * np.log(np.where(x > 0, x, 1.0))
                       + b * np.log1p(np.where(x < 1, -x, 0.0)))
    use_direct = x < (a + 1.0) / (a + b + 2.0)
    # direct: front * cf(a,b,x)/a ; symmetric: 1 - front * cf(b,a,1-x)/b
    direct = front * _betacf(a, b, np.where(use_direct, x, 0.5)) / a
    sym = 1.0 - front * _betacf(b, a, np.where(use_direct, 0.5, 1.0 - x)) / b
    out = np.where(use_direct, direct, sym)
    out = np.where(x <= 0.0, 0.0, out)
    out = np.where(x >= 1.0, 1.0, out)
    return out


def _gser(a, x):
    """Series expansion for lower incomplete gamma P(a,x), x < a+1."""
    a = np.asarray(a, dtype=float)
    x = np.asarray(x, dtype=float)
    ap = np.broadcast_to(a, x.shape).astype(float).copy()
    summ = 1.0 / ap
    delta = summ.copy()
    for _ in range(500):
        ap += 1.0
        delta = delta * x / ap
        summ += delta
        if np.all(np.abs(delta) < np.abs(summ) * _EPS):
            break
    lg = np.vectorize(math.lgamma, otypes=[float])(np.broadcast_to(a, x.shape))
    with np.errstate(divide="ignore", invalid="ignore"):
        out = summ * np.exp(-x + np.broadcast_to(a, x.shape)
                            * np.log(np.where(x > 0, x, 1.0)) - lg)
    return np.where(x <= 0, 0.0, out)


def _gcf(a, x):
    """Continued fraction for upper incomplete gamma Q(a,x), x >= a+1."""
    a = np.broadcast_to(np.asarray(a, dtype=float), np.asarray(x, dtype=float).shape)
    x = np.asarray(x, dtype=float)
    b = x + 1.0 - a
    c = np.full_like(x, 1.0 / _FPMIN)
    d = 1.0 / b
    h = d.copy()
    for i in range(1, 500):
        an = -i * (i - a)
        b = b + 2.0
        d = an * d + b
        d = np.where(np.abs(d) < _FPMIN, _FPMIN, d)
        c = b + an / c
        c = np.where(np.abs(c) < _FPMIN, _FPMIN, c)
        d = 1.0 / d
        delta = d * c
        h = h * delta
        if np.all(np.abs(delta - 1.0) < _EPS):
            break
    lg = np.vectorize(math.lgamma, otypes=[float])(a)
    with np.errstate(divide="ignore", invalid="ignore"):
        return np.exp(-x + a * np.log(np.where(x > 0, x, 1.0)) - lg) * h


def gammainc_lower(a, x):
    """Regularized lower incomplete gamma P(a, x), vectorized."""
    a = np.asarray(a, dtype=float)
    x = np.asarray(x, dtype=float)
    a, x = np.broadcast_arrays(a, x)
    use_series = x < a + 1.0
    ser = _gser(a, np.where(use_series, x, 0.0))
    cf = _gcf(a, np.where(use_series, a + 2.0, x))
    out = np.where(use_series, ser, 1.0 - cf)
    return np.clip(out, 0.0, 1.0)


# ---------------------------------------------------------------------------
# distributions
# ---------------------------------------------------------------------------

_SQRT2 = math.sqrt(2.0)


def erf(x):
    """Vectorized error function via the regularized incomplete gamma:
    erf(x) = sign(x) · P(1/2, x²).  Handles zero-length input (np.vectorize
    over math.erf raises on empty arrays unless otypes is given)."""
    x = np.asarray(x, dtype=float)
    if x.size == 0:
        return np.zeros_like(x)
    return np.where(x >= 0.0, 1.0, -1.0) * gammainc_lower(0.5, x * x)


def erfc(x):
    """Complementary error function 1 − erf(x) (≤1e-15 absolute error;
    relative accuracy in the far tail is limited by the subtraction, which
    is irrelevant at the 6-decimal gate precision)."""
    return 1.0 - erf(x)


def norm_cdf(z):
    z = np.asarray(z, dtype=float)
    if z.size == 0:
        return np.zeros_like(z)
    return 0.5 * (1.0 + erf(z / _SQRT2))


def norm_sf(z):
    return norm_cdf(-np.asarray(z, dtype=float))


def norm_ppf(p):
    """Inverse normal CDF via stdlib NormalDist (vectorized wrapper)."""
    from statistics import NormalDist

    nd = NormalDist()
    return np.vectorize(
        lambda q: nd.inv_cdf(min(max(q, 1e-300), 1 - 1e-16)), otypes=[float]
    )(np.asarray(p, dtype=float))


def t_sf(t, df):
    """P(T > t) for Student-t with ``df`` degrees of freedom."""
    t = np.asarray(t, dtype=float)
    df = np.asarray(df, dtype=float)
    t, df = np.broadcast_arrays(t, df)
    x = df / (df + t * t)
    tail = 0.5 * betainc(df / 2.0, 0.5, x)
    return np.where(t >= 0, tail, 1.0 - tail)


def t_cdf(t, df):
    return 1.0 - t_sf(t, df)


def t_ppf(p, df):
    """Inverse Student-t CDF (driver-side use).

    df > 2000 → Cornish-Fisher expansion around the normal quantile
    (error O(df⁻³), ≪1e-8 — and avoids the large-a ``betainc`` continued
    fraction, whose slow convergence at the bisection's extreme endpoints
    cost ~3 s per call at df ~10⁵); otherwise monotone bisection on t_cdf.
    """
    p = np.atleast_1d(np.asarray(p, dtype=float))
    df = np.broadcast_to(np.asarray(df, dtype=float), p.shape)
    out = np.empty_like(p)
    big = df > 2000
    if big.any():
        z = np.asarray(norm_ppf(p[big]), dtype=float)
        v = df[big]
        g1 = (z ** 3 + z) / 4.0
        g2 = (5 * z ** 5 + 16 * z ** 3 + 3 * z) / 96.0
        out[big] = z + g1 / v + g2 / (v * v)
    small = ~big
    if small.any():
        ps, dfs = p[small], df[small]
        # ADAPTIVE bracket: a fixed [-1e3, 1e3] silently clamps extreme
        # quantiles (t_ppf(1e-6, df=1) is ~-3.2e5) — double the bracket
        # until the cdf actually straddles every requested p
        lo = np.full_like(ps, -1e3)
        hi = np.full_like(ps, 1e3)
        for _ in range(60):
            grow_lo = t_cdf(lo, dfs) > ps
            grow_hi = t_cdf(hi, dfs) < ps
            if not (grow_lo.any() or grow_hi.any()):
                break
            lo = np.where(grow_lo, lo * 2.0, lo)
            hi = np.where(grow_hi, hi * 2.0, hi)
        for _ in range(200):
            mid = 0.5 * (lo + hi)
            c = t_cdf(mid, dfs)
            lo = np.where(c < ps, mid, lo)
            hi = np.where(c >= ps, mid, hi)
        out[small] = 0.5 * (lo + hi)
    return out if out.shape != (1,) else float(out[0])


def chi2_sf(x, df):
    """P(X > x) for chi-square with ``df`` degrees of freedom."""
    x = np.asarray(x, dtype=float)
    df = np.asarray(df, dtype=float)
    return 1.0 - gammainc_lower(df / 2.0, x / 2.0)


def f_sf(x, dfn, dfd):
    """P(X > x) for the F distribution."""
    x = np.asarray(x, dtype=float)
    dfn = np.asarray(dfn, dtype=float)
    dfd = np.asarray(dfd, dtype=float)
    x, dfn, dfd = np.broadcast_arrays(x, dfn, dfd)
    w = dfd / (dfd + dfn * np.where(x > 0, x, 0.0))
    out = betainc(dfd / 2.0, dfn / 2.0, w)
    out = np.where(x <= 0, 1.0, out)
    # NaN x fell into the x>0-False branch (w=1 -> p=1): a degenerate
    # fit's NaN statistic must surface as NaN, not a silent p=1 (t_sf
    # and chi2_sf both propagate NaN already)
    return np.where(np.isnan(x), np.nan, out)


def kolmogorov_sf(lam):
    """Asymptotic two-sample KS tail Q(λ) = 2 Σ (-1)^{k-1} exp(-2 k² λ²).

    For small λ the alternating series needs O(1/λ) terms (a fixed
    100-term truncation returned Q(0.005) ≈ 0.4 instead of ≈ 1), so
    λ < 0.4 switches to the Jacobi-theta dual form
    CDF(λ) = (√(2π)/λ) Σ exp(−(2k−1)²π²/(8λ²)), which converges in a
    couple of terms exactly where the direct series stalls."""
    lam = np.asarray(lam, dtype=float)
    safe = np.where(lam > 0, lam, 1.0)
    direct = np.zeros_like(safe)
    for k in range(1, 101):
        direct = direct + 2.0 * (-1.0) ** (k - 1) \
            * np.exp(-2.0 * k * k * safe * safe)
    cdf_dual = np.zeros_like(safe)
    for k in range(1, 11):
        cdf_dual = cdf_dual + np.exp(
            -((2 * k - 1) ** 2) * np.pi ** 2 / (8.0 * safe * safe))
    cdf_dual = np.sqrt(2.0 * np.pi) / safe * cdf_dual
    out = np.where(safe < 0.4, 1.0 - cdf_dual, direct)
    out = np.where(lam <= 0, 1.0, out)
    return np.clip(out, 0.0, 1.0)
