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


def lgamma(c) -> Column:
    @F.pandas_udf("double")
    def _lg(s: pd.Series) -> pd.Series:
        return s.map(lambda v: math.lgamma(v) if v == v else float("nan"))

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


# erf/erfc/tgamma/cdf need real special functions → Arrow UDFs ---------------


def _pandas_udf_double(fn):
    ensure_udf_serializable()
    return F.pandas_udf(fn, "double")


def erf(c) -> Column:
    @F.pandas_udf("double")
    def _erf(s: pd.Series) -> pd.Series:
        return s.map(lambda v: math.erf(v) if v == v else float("nan"))

    ensure_udf_serializable()
    return _erf(F.col(c) if isinstance(c, str) else c)


def erfc(c) -> Column:
    @F.pandas_udf("double")
    def _erfc(s: pd.Series) -> pd.Series:
        return s.map(lambda v: math.erfc(v) if v == v else float("nan"))

    ensure_udf_serializable()
    return _erfc(F.col(c) if isinstance(c, str) else c)


def tgamma(c) -> Column:
    @F.pandas_udf("double")
    def _g(s: pd.Series) -> pd.Series:
        return s.map(lambda v: math.gamma(v) if v == v else float("nan"))

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
