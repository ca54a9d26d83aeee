"""Sufficient-statistics kernel — the keystone of every statistical operator.

Replaces the reference's per-engine UDAF state (count + Σxᵢ + Σxᵢxⱼ, cf.
``delta_method.h:103-266`` under /root/reference) with a single declarative
``groupBy().agg()`` of native ``F.sum`` columns. Spark's partial aggregation
plays the role of the UDAFs' update/merge/serialize cycle, stays inside
whole-stage codegen, and shuffles only O(k²) doubles per group — which is what
makes one pass over 100 TB feasible.

Two finalization paths:

* **Columnar** (`StatView`): means / covariances / delta-method variances are
  rendered back as Column expressions — zero driver involvement, works for
  millions of groups.
* **Driver / pandas** (`rows_to_stats`): a collected Row (or pandas row) is
  unpacked to numpy ``(n, means, cov)`` for finalizers that need matrix
  inverses (CUPED, OLS, …).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
from pyspark.sql import Column
from pyspark.sql import functions as F

from fast_causal_inference_spark.formula import Node


def _pair_name(prefix: str, i: int, j: int) -> str:
    i, j = (i, j) if i <= j else (j, i)
    return f"{prefix}c{i}_{j}"


def suffstat_agg_columns(base_exprs: list[str], prefix: str = "",
                         cond: Column | None = None,
                         weight: Column | None = None) -> list[Column]:
    """Aggregate columns for (n, Σxᵢ, Σxᵢxⱼ) of the given SQL expressions.

    ``cond`` restricts the statistics to matching rows (used to compute both
    treatment arms of a two-sample test in ONE pass — no second shuffle).
    ``weight`` produces weighted sums (WLS; n becomes Σw).

    Rows where any base expression is NULL are skipped entirely (n excluded
    too), matching the reference UDAFs which drop null inputs — otherwise
    NULL*x silently leaves the sums but not the count, deflating means.
    """
    xs = [F.expr(e).cast("double") for e in base_exprs]
    one: Column = F.lit(1.0) if weight is None else weight.cast("double")
    guard: Column | None = cond
    for x in xs:
        nn = x.isNotNull()
        guard = nn if guard is None else (guard & nn)
    if guard is not None:
        one = F.when(guard, one)
    out = [F.sum(one).alias(f"{prefix}n")]
    for i, x in enumerate(xs):
        out.append(F.sum(one * x).alias(f"{prefix}s{i}"))
    for i in range(len(xs)):
        for j in range(i, len(xs)):
            out.append(F.sum(one * xs[i] * xs[j]).alias(_pair_name(prefix, i, j)))
    return out


@dataclass
class StatView:
    """Columnar view over aggregated sufficient statistics.

    All members return Column expressions referring to the aggregated columns
    produced by :func:`suffstat_agg_columns` with the same ``prefix``.
    """

    k: int
    prefix: str = ""

    @property
    def n(self) -> Column:
        return F.col(f"{self.prefix}n")

    def s(self, i: int) -> Column:
        return F.col(f"{self.prefix}s{i}")

    def c(self, i: int, j: int) -> Column:
        return F.col(_pair_name(self.prefix, i, j))

    def mu(self, i: int) -> Column:
        # nullif guards: ANSI mode (Spark 4 default) errors on x/0, and
        # sparse groups (empty or single-row arms) are routine at scale
        return self.s(i) / F.nullif(self.n, F.lit(0.0))

    def mus(self) -> list[Column]:
        return [self.mu(i) for i in range(self.k)]

    def cov(self, i: int, j: int) -> Column:
        """Sample covariance (n-1 denominator), matching the reference
        (``delta_method.h:174``); NULL for n ≤ 1 groups (ANSI-safe)."""
        return ((self.c(i, j) - self.s(i) * self.s(j)
                 / F.nullif(self.n, F.lit(0.0)))
                / F.nullif(self.n - 1, F.lit(0.0)))

    def var_of_formula_mean(self, node: Node) -> Column:
        """Delta-method Var[f(x̄)] = ∇fᵀ C ∇f / n as a Column expression."""
        mus = self.mus()
        grads = node.gradient(self.k)
        syms = sorted(node.symbols())
        out: Column | None = None
        for i in syms:
            gi = grads[i].value(mus)
            for j in syms:
                gj = grads[j].value(mus)
                term = gi * gj * self.cov(i, j)
                out = term if out is None else out + term
        if out is None:
            return F.lit(0.0)
        return out / F.nullif(self.n, F.lit(0.0))

    def cov_of_formula_means(self, a: Node, b: Node) -> Column:
        """Delta-method Cov[f(x̄), g(x̄)] as a Column expression."""
        mus = self.mus()
        ga = a.gradient(self.k)
        gb = b.gradient(self.k)
        out: Column | None = None
        for i in sorted(a.symbols()):
            for j in sorted(b.symbols()):
                term = ga[i].value(mus) * gb[j].value(mus) * self.cov(i, j)
                out = term if out is None else out + term
        if out is None:
            return F.lit(0.0)
        return out / F.nullif(self.n, F.lit(0.0))

    def value(self, node: Node) -> Column:
        return node.value(self.mus())


# ---------------------------------------------------------------------------
# driver-side unpacking
# ---------------------------------------------------------------------------


@dataclass
class NumStats:
    """numpy view of one group's sufficient statistics."""

    n: float
    means: np.ndarray      # (k,)
    cov: np.ndarray        # (k, k) sample covariance (n-1)

    def formula_value(self, node: Node) -> float:
        return float(node.value(list(self.means)))

    def formula_grad(self, node: Node, k: int) -> np.ndarray:
        return np.array([g.value(list(self.means)) for g in node.gradient(k)],
                        dtype=float)

    def delta_var(self, node: Node) -> float:
        """Var[f(x̄)] = ∇fᵀ C ∇f / n."""
        g = self.formula_grad(node, len(self.means))
        return float(g @ self.cov @ g / self.n)

    def delta_cov(self, a: Node, b: Node) -> float:
        ga = self.formula_grad(a, len(self.means))
        gb = self.formula_grad(b, len(self.means))
        return float(ga @ self.cov @ gb / self.n)


def _f(v) -> float:
    """NULL-safe float: conditional F.sum yields NULL on empty arms/groups —
    surface NaN instead of TypeError(float(None))."""
    return float(v) if v is not None else float("nan")


def row_to_stats(row, k: int, prefix: str = "") -> NumStats:
    """Unpack a collected Row / mapping into :class:`NumStats`."""
    n = _f(row[f"{prefix}n"])
    s = np.array([_f(row[f"{prefix}s{i}"]) for i in range(k)], dtype=float)
    c = np.empty((k, k), dtype=float)
    for i in range(k):
        for j in range(i, k):
            c[i, j] = c[j, i] = _f(row[_pair_name(prefix, i, j)])
    means = s / n if n > 0 else np.full(k, np.nan)   # n NaN/0 → NaN means
    # NaN covariance for n ≤ 1 — consistent with the columnar path's NULLs
    cov = ((c - np.outer(s, s) / n) / (n - 1.0) if n > 1
           else np.full((k, k), np.nan))
    return NumStats(n=n, means=means, cov=cov)


def _raw_cross(g: NumStats) -> np.ndarray:
    """Σ x xᵀ reconstructed from (n, means, cov) — well-defined for ANY
    n: a single-row group's cross-sum is outer(s, s)/n exactly even
    though its sample covariance is NaN (routing through `cov*(n-1)`
    would NaN-poison the merge: NaN * 0 is NaN in IEEE, so one
    single-row arm wiped the whole pooled covariance)."""
    s = g.means * g.n
    if g.n > 1:
        return g.cov * (g.n - 1.0) + np.outer(s, s) / g.n
    if g.n > 0:
        return np.outer(s, s) / g.n
    return np.zeros_like(np.outer(s, s))


def merge_stats(a: NumStats, b: NumStats) -> NumStats:
    """Pool two groups' statistics (exact merge of count/sums/cross-sums)."""
    n = a.n + b.n
    sa, sb = a.means * a.n, b.means * b.n
    s = np.where(a.n > 0, sa, 0.0) + np.where(b.n > 0, sb, 0.0)
    c = _raw_cross(a) + _raw_cross(b)
    means = s / n if n > 0 else np.full_like(s, np.nan)
    cov = ((c - np.outer(s, s) / n) / (n - 1.0) if n > 1
           else np.full_like(c, np.nan))
    return NumStats(n=n, means=means, cov=cov)
