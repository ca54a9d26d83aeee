"""Function surface parity with the reference's ``dataframe/functions.py``.

Most names are thin aliases onto native ``pyspark.sql.functions`` (kept thin
on purpose — Catalyst sees the native expression). The few functions Spark
lacks (``erf``/``erfc``/``tgamma``, Student-t ``cdf``) are vectorized Arrow
UDFs over numpy/stdlib-math. Vector (array-column) operators are higher-order
functions, JVM-side.

Reference name map: ``functions.py:98-1882`` and ``cdf.cpp:39-96`` under
/root/reference.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

from fast_causal_inference_spark import stats_distributions as _dist

from fast_causal_inference_spark.serialization import ensure_udf_serializable


def bind_once(expr: Column, body) -> Column:
    """Let-bind an expression inside a higher-order lambda.

    A Python closure reference to ``expr`` inside a HOF lambda re-embeds
    the whole expression tree, and interpreted lambda evaluation has no
    common-subexpression elimination — Catalyst re-evaluates the closure
    per ELEMENT (an O(len) construction silently becomes O(len²); the
    tokenizing split inside ``word_ngrams`` measured ~1 ms/doc this way,
    9× the let-bound form, with identical values).  ``transform`` over a
    one-element wrapper array evaluates ``expr`` exactly once per row and
    passes the value to ``body`` as a bound lambda variable.  Works for
    scalars too (one-element array of the scalar)."""
    return F.transform(F.array(expr), body)[0]


# -- aggregates (§2.4) ------------------------------------------------------
count = F.count
sum = F.sum                                  # noqa: A001
avg = F.avg
mean = F.avg
max = F.max                                  # noqa: A001
min = F.min                                  # noqa: A001
any_value = F.any_value
anyLast = F.last
anyMin = F.min_by
anyMax = F.max_by
stddevPop = F.stddev_pop
stddevSamp = F.stddev_samp
varPop = F.var_pop
varSamp = F.var_samp
corr = F.corr
covarPop = F.covar_pop
covarSamp = F.covar_samp


def quantile(col, level: float, exact: bool = False) -> Column:
    """CH quantile / quantileExact → percentile_approx / exact percentile."""
    c = F.col(col) if isinstance(col, str) else col
    if exact:
        return F.percentile(c, F.lit(level))
    return F.percentile_approx(c, F.lit(level))


def quantiles(col, *levels: float, exact: bool = False) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    arr = F.array(*[F.lit(v) for v in levels])
    if exact:
        return F.percentile(c, arr)
    return F.percentile_approx(c, arr)


# -- scalar math (§2.5) -----------------------------------------------------
col = F.col
lit = F.lit
sqrt = F.sqrt
abs = F.abs                                  # noqa: A001
mod = F.pmod
floor = F.floor
ceil = F.ceil
power = F.pow
pow = F.pow                                  # noqa: A001
exp = F.exp
log = F.log
ln = F.log
log2 = F.log2
log10 = F.log10
cbrt = F.cbrt
round = F.round                              # noqa: A001
sin = F.sin
cos = F.cos
tan = F.tan
asin = F.asin
acos = F.acos
atan = F.atan
isnull = F.isnull
isnotnull = lambda c: ~F.isnull(c)           # noqa: E731
murmur_hash3_32 = F.hash                     # Spark's hash IS 32-bit Murmur3
xxhash64 = F.xxhash64

_M64_MASK = (1 << 64) - 1
_M64_C1 = 0x87C37B91114253D5
_M64_C2 = 0x4CF5AD432745937F


def _rotl64(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M64_MASK


def _fmix64(k: int) -> int:
    k ^= k >> 33
    k = (k * 0xFF51AFD7ED558CCD) & _M64_MASK
    k ^= k >> 33
    k = (k * 0xC4CEB9FE1A85EC53) & _M64_MASK
    k ^= k >> 33
    return k


def _murmur3_x64_128(data: bytes, seed: int = 0) -> tuple[int, int]:
    """MurmurHash3 x64 128-bit (Austin Appleby's public-domain algorithm)."""
    length = len(data)
    h1 = h2 = seed
    nblocks = length // 16
    for i in range(nblocks):
        k1 = int.from_bytes(data[i * 16:i * 16 + 8], "little")
        k2 = int.from_bytes(data[i * 16 + 8:i * 16 + 16], "little")
        k1 = (k1 * _M64_C1) & _M64_MASK
        k1 = _rotl64(k1, 31)
        k1 = (k1 * _M64_C2) & _M64_MASK
        h1 ^= k1
        h1 = _rotl64(h1, 27)
        h1 = (h1 + h2) & _M64_MASK
        h1 = (h1 * 5 + 0x52DCE729) & _M64_MASK
        k2 = (k2 * _M64_C2) & _M64_MASK
        k2 = _rotl64(k2, 33)
        k2 = (k2 * _M64_C1) & _M64_MASK
        h2 ^= k2
        h2 = _rotl64(h2, 31)
        h2 = (h2 + h1) & _M64_MASK
        h2 = (h2 * 5 + 0x38495AB5) & _M64_MASK
    tail = data[nblocks * 16:]
    k1 = k2 = 0
    if len(tail) > 8:
        k2 = int.from_bytes(tail[8:], "little")
        k2 = (k2 * _M64_C2) & _M64_MASK
        k2 = _rotl64(k2, 33)
        k2 = (k2 * _M64_C1) & _M64_MASK
        h2 ^= k2
    if tail:
        k1 = int.from_bytes(tail[:8], "little")
        k1 = (k1 * _M64_C1) & _M64_MASK
        k1 = _rotl64(k1, 31)
        k1 = (k1 * _M64_C2) & _M64_MASK
        h1 ^= k1
    h1 ^= length
    h2 ^= length
    h1 = (h1 + h2) & _M64_MASK
    h2 = (h2 + h1) & _M64_MASK
    h1 = _fmix64(h1)
    h2 = _fmix64(h2)
    h1 = (h1 + h2) & _M64_MASK
    h2 = (h2 + h1) & _M64_MASK
    return h1, h2


def murmur_hash3_64(c) -> Column:
    """64-bit MurmurHash3 of a string column — engine-exact parity with the
    reference's ``murmur_hash3_64`` (``functions.py:1058``; ClickHouse
    computes MurmurHash3_x64_128 and XORs the two 64-bit halves).

    Arrow-batched Python (the x64_128 variant has no JVM builtin); for new
    pipelines prefer the native, codegen-side :data:`xxhash64` — this
    function exists for bucket-assignment parity with engine deployments."""
    @F.pandas_udf("long")
    def _mh64(s: pd.Series) -> pd.Series:
        def one(v):
            if v is None:
                return None
            h1, h2 = _murmur3_x64_128(str(v).encode("utf-8"))
            x = h1 ^ h2
            return x - (1 << 64) if x >= (1 << 63) else x
        return s.map(one)

    ensure_udf_serializable()
    return _mh64(F.col(c) if isinstance(c, str) else c)


def exp2(c) -> Column:
    return F.pow(F.lit(2.0), F.col(c) if isinstance(c, str) else c)


def exp10(c) -> Column:
    return F.pow(F.lit(10.0), F.col(c) if isinstance(c, str) else c)


def intExp2(c) -> Column:
    return exp2(c).cast("long")


def intExp10(c) -> Column:
    return exp10(c).cast("long")


def gcd(a, b) -> Column:
    if not (isinstance(a, str) and isinstance(b, str)):
        raise TypeError("gcd takes column-name strings")
    return F.expr(f"gcd({a}, {b})")


def lcm(a, b) -> Column:
    if not (isinstance(a, str) and isinstance(b, str)):
        raise TypeError("lcm takes column-name strings")
    return F.expr(f"lcm({a}, {b})")


def _safe_lgamma(v: float) -> float:
    if v != v:
        return float("nan")
    try:
        return math.lgamma(v)
    except ValueError:            # poles at 0 and negative integers:
        return float("inf")       # C99 lgamma returns +inf, not a raise


def lgamma(c) -> Column:
    @F.pandas_udf("double")
    def _lg(s: pd.Series) -> pd.Series:
        return s.map(_safe_lgamma)

    ensure_udf_serializable()
    return _lg(F.col(c) if isinstance(c, str) else c)


def e() -> Column:
    return F.lit(math.e)


def pi() -> Column:
    return F.lit(math.pi)


def rand(seed: int | None = None) -> Column:
    return F.rand(seed) if seed is not None else F.rand()


rand_cannonical = rand   # reference's [0,1) variant — F.rand already is


def If(cond: Column, x, y) -> Column:
    return F.when(cond, x).otherwise(y)


# tgamma/lgamma/cdf need special functions with no closed Column form →
# Arrow UDFs; erf/erfc below are pure Column expressions -------------------

# erf/erfc as PURE Column expressions — W. J. Cody's rational-Chebyshev
# approximations (netlib specfun CALERF; the algorithm under glibc's
# erf), max observed error ≤ 3 ulp vs math.erf over [-8, 8] (validated
# in tests/test_round6_fixes.py).  These sit inside iterative
# probit/AME/Φ hot loops where the previous Arrow-UDF version paid a
# Python-worker roundtrip per scan per iteration; as plain expressions
# they stay in whole-stage codegen and cost the same as exp().

_CODY_A = (3.16112374387056560e0, 1.13864154151050156e2,
           3.77485237685302021e2, 3.20937758913846947e3,
           1.85777706184603153e-1)
_CODY_B = (2.36012909523441209e1, 2.44024637934444173e2,
           1.28261652607737228e3, 2.84423683343917062e3)
_CODY_C = (5.64188496988670089e-1, 8.88314979438837594e0,
           6.61191906371416295e1, 2.98635138197400131e2,
           8.81952221241769090e2, 1.71204761263407058e3,
           2.05107837782607147e3, 1.23033935479799725e3,
           2.15311535474403846e-8)
_CODY_D = (1.57449261107098347e1, 1.17693950891312499e2,
           5.37181101862009858e2, 1.62138957456669019e3,
           3.29079923573345963e3, 4.36261909014324716e3,
           3.43936767414372164e3, 1.23033935480374942e3)
_CODY_P = (3.05326634961232344e-1, 3.60344899949804439e-1,
           1.25781726111229246e-1, 1.60837851487422766e-2,
           6.58749161529837803e-4, 1.63153871373020978e-2)
_CODY_Q = (2.56852019228982242e0, 1.87295284992346047e0,
           5.27905102951428412e-1, 6.05183413124413191e-2,
           2.33520497626869185e-3)
_CODY_SQRPI = 5.6418958354775628695e-1


def _cody_small(x: Column) -> Column:
    """erf(x) for |x| <= 0.46875 (rational in x²; odd in x)."""
    z = x * x
    xnum = F.lit(_CODY_A[4]) * z
    xden = z
    for i in range(3):
        xnum = (xnum + F.lit(_CODY_A[i])) * z
        xden = (xden + F.lit(_CODY_B[i])) * z
    return x * (xnum + F.lit(_CODY_A[3])) / (xden + F.lit(_CODY_B[3]))


def _cody_erfc_mid(y: Column) -> Column:
    """erfc(y) for 0.46875 < y <= 4 (Cody branch 2; y positive)."""
    xnum = F.lit(_CODY_C[8]) * y
    xden = y
    for i in range(7):
        xnum = (xnum + F.lit(_CODY_C[i])) * y
        xden = (xden + F.lit(_CODY_D[i])) * y
    r = (xnum + F.lit(_CODY_C[7])) / (xden + F.lit(_CODY_D[7]))
    # split exp(-y²) = exp(-ysq²)·exp(-(y-ysq)(y+ysq)) with ysq = y
    # truncated to 1/16ths — Cody's trick to keep the argument of the
    # big exp exactly representable (cuts cancellation in y²)
    ysq = F.floor(y * 16.0) / 16.0
    return F.exp(-ysq * ysq) * F.exp(-(y - ysq) * (y + ysq)) * r


def _cody_erfc_tail(y: Column) -> Column:
    """erfc(y) for y > 4 (Cody branch 3; asymptotic in 1/y²)."""
    z = 1.0 / (y * y)
    xnum = F.lit(_CODY_P[5]) * z
    xden = z
    for i in range(4):
        xnum = (xnum + F.lit(_CODY_P[i])) * z
        xden = (xden + F.lit(_CODY_Q[i])) * z
    r = z * (xnum + F.lit(_CODY_P[4])) / (xden + F.lit(_CODY_Q[4]))
    r = (F.lit(_CODY_SQRPI) - r) / y
    ysq = F.floor(y * 16.0) / 16.0
    return F.exp(-ysq * ysq) * F.exp(-(y - ysq) * (y + ysq)) * r


def _cody_erfc_pos(y: Column) -> Column:
    """erfc(y) for y > 0.46875."""
    return F.when(y <= 4.0, _cody_erfc_mid(y)).otherwise(_cody_erfc_tail(y))


def erf(c) -> Column:
    x = (F.col(c) if isinstance(c, str) else c).cast("double")
    y = F.abs(x)
    # NULL input yields NaN, matching the Arrow-UDF contract this
    # replaced (a NULL would otherwise fall through every branch and
    # silently drop out of downstream sums; NaN poisons them loudly).
    # NaN next: Spark orders NaN GREATER than every number, so without
    # the guard NaN would take the y >= 6 clamp branch
    return (F.when(x.isNull(), F.lit(float("nan")))
            .when(F.isnan(x), x)
            .when(y <= 0.46875, _cody_small(x))
            # erf(6) rounds to 1.0 in double, so clamping at 6 is exact
            # and keeps ±inf finite (the branch arithmetic would give
            # inf - inf = NaN)
            .when(y >= 6.0, F.signum(x))
            .otherwise(F.signum(x) * (1.0 - _cody_erfc_pos(y))))


def erfc(c) -> Column:
    x = (F.col(c) if isinstance(c, str) else c).cast("double")
    y = F.abs(x)
    return (F.when(x.isNull(), F.lit(float("nan")))   # see erf()
            .when(F.isnan(x), x)
            .when(y <= 0.46875, 1.0 - _cody_small(x))
            # erfc(28) underflows to 0 and erfc(-6) rounds to 2.0 —
            # both exact in double, and the clamps keep ±inf finite
            .when(x >= 28.0, F.lit(0.0))
            .when(x <= -6.0, F.lit(2.0))
            .otherwise(F.when(x > 0, _cody_erfc_pos(y))
                       .otherwise(2.0 - _cody_erfc_pos(y))))


def _safe_gamma(v: float) -> float:
    """C99 tgamma edge semantics (math.gamma raises instead): +inf at
    the x=0 pole, NaN at negative integers, +inf on overflow (x >
    ~171.62) — a single poison value must not kill the whole job."""
    if v != v:
        return float("nan")
    try:
        return math.gamma(v)
    except OverflowError:
        return float("inf")
    except ValueError:
        return float("inf") if v == 0.0 else float("nan")


def tgamma(c) -> Column:
    @F.pandas_udf("double")
    def _g(s: pd.Series) -> pd.Series:
        vec = np.frompyfunc(_safe_gamma, 1, 1)
        return pd.Series(
            vec(s.to_numpy(dtype="float64")).astype("float64"),
            index=s.index)

    ensure_udf_serializable()
    return _g(F.col(c) if isinstance(c, str) else c)


def _tgamma_col(c: Column) -> Column:
    return tgamma(c)


def cdf(score, df: float = 120.0) -> Column:
    """Student-t CDF column (reference scalar ``cdf(score[, df])``,
    ``cdf.cpp:39-96`` — df defaults to 120)."""
    @F.pandas_udf("double")
    def _cdf(s: pd.Series) -> pd.Series:
        return pd.Series(_dist.t_cdf(s.to_numpy(dtype=float), df))

    ensure_udf_serializable()
    return _cdf(F.col(score) if isinstance(score, str) else score)


# -- vector ops on array columns (§2.5) -------------------------------------


def _c(v) -> Column:
    return F.col(v) if isinstance(v, str) else v


def L1Norm(v) -> Column:
    return F.aggregate(_c(v), F.lit(0.0), lambda a, x: a + F.abs(x))


def L2Norm(v) -> Column:
    return F.sqrt(F.aggregate(_c(v), F.lit(0.0), lambda a, x: a + x * x))


def LinfNorm(v) -> Column:
    return F.array_max(F.transform(_c(v), lambda x: F.abs(x)))


def LpNorm(v, p: float) -> Column:
    return F.pow(F.aggregate(_c(v), F.lit(0.0),
                             lambda a, x: a + F.pow(F.abs(x), p)),
                 1.0 / p)


def L1Distance(a, b) -> Column:
    return F.aggregate(F.zip_with(_c(a), _c(b), lambda x, y: F.abs(x - y)),
                       F.lit(0.0), lambda acc, v: acc + v)


def L2Distance(a, b) -> Column:
    return F.sqrt(L2SquaredDistance(a, b))


def L2SquaredDistance(a, b) -> Column:
    return F.aggregate(F.zip_with(_c(a), _c(b), lambda x, y: (x - y) * (x - y)),
                       F.lit(0.0), lambda acc, v: acc + v)


def LinfDistance(a, b) -> Column:
    return F.array_max(F.zip_with(_c(a), _c(b), lambda x, y: F.abs(x - y)))


def LpDistance(a, b, p: float) -> Column:
    return F.pow(F.aggregate(
        F.zip_with(_c(a), _c(b), lambda x, y: F.pow(F.abs(x - y), p)),
        F.lit(0.0), lambda acc, v: acc + v), 1.0 / p)


def _normalize_by(v, norm_fn) -> Column:
    # both the vector and its norm are let-bound: a closure reference to
    # the norm inside the per-element lambda would re-run the O(len)
    # norm aggregation per element (O(len²))
    return bind_once(_c(v), lambda vv: bind_once(
        norm_fn(vv), lambda n: F.transform(vv, lambda x: x / n)))


def L1Normalize(v) -> Column:
    return _normalize_by(v, L1Norm)


def L2Normalize(v) -> Column:
    return _normalize_by(v, L2Norm)


def LinfNormalize(v) -> Column:
    return _normalize_by(v, LinfNorm)


def LpNormalize(v, p: float) -> Column:
    return _normalize_by(v, lambda vv: LpNorm(vv, p))


def dotProduct(a, b) -> Column:
    return F.aggregate(F.zip_with(_c(a), _c(b), lambda x, y: x * y),
                       F.lit(0.0), lambda acc, v: acc + v)


def cosineSimilarity(a, b) -> Column:
    return dotProduct(a, b) / (L2Norm(a) * L2Norm(b))


def cosineDistance(a, b) -> Column:
    return 1.0 - cosineSimilarity(a, b)
