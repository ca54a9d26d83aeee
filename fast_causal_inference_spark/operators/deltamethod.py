"""Delta-method variance of arbitrary metric formulas.

Semantics parity with the reference ``Deltamethod('x1/x2')(num, den)`` UDAF
(``src/udf/starrocks/be/src/exprs/agg/delta_method.h:200-217``): variance of
``f(x̄₁ … x̄ₙ)`` ≈ ∇f(μ)ᵀ C ∇f(μ) / n with C the sample covariance matrix.

Spark-first: ONE ``groupBy().agg()`` of sums/cross-products, then the variance
is rendered as a closed-form Column expression — no UDF, fully codegen'd,
valid for any number of groups.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fast_causal_inference_spark.formula import parse_formula
from fast_causal_inference_spark.operators.suffstats import StatView, suffstat_agg_columns


def delta_method(df: DataFrame, expr: str, std: bool = True,
                 group_cols: list[str] | None = None,
                 alias: str | None = None) -> DataFrame:
    """Var (or SE) of a formula of means, e.g. ``avg(x1)/avg(x2)``.

    Returns one row per group with the group columns plus a single ``var`` /
    ``std`` column (overridable via ``alias``).
    """
    node, base = parse_formula(expr)
    grouped = df.groupBy(*group_cols) if group_cols else df.groupBy()
    agged = grouped.agg(*suffstat_agg_columns(base))
    view = StatView(len(base))
    var = view.var_of_formula_mean(node)
    out = F.sqrt(var) if std else var
    name = alias or ("std" if std else "var")
    return agged.select(*(group_cols or []), out.alias(name))


def avg_metric(df: DataFrame, expr: str,
               group_cols: list[str] | None = None,
               alias: str = "metric") -> DataFrame:
    """Point estimate f(x̄) of a metric formula (companion to delta_method)."""
    node, base = parse_formula(expr)
    grouped = df.groupBy(*group_cols) if group_cols else df.groupBy()
    agged = grouped.agg(*suffstat_agg_columns(base))
    view = StatView(len(base))
    return agged.select(*(group_cols or []), view.value(node).alias(alias))
