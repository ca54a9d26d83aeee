"""Feature engineering: one-hot encoding, explicit/quantile binning.

Parity targets: reference ``features.py:17-282`` (OneHotEncoder / cut_bins /
Bucketizer with explicit edges or ``quantilesArray``) and ``lib/tools.py:608``.
Built on native Spark ML transformers / Column expressions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def one_hot_encode(df: DataFrame, cols: list[str],
                   drop_last: bool = False,
                   max_categories: int = 1000) -> DataFrame:
    """Distinct values → 0/1 indicator columns ``{col}_{value}``.

    Values are discovered with one distinct() per column (driver-side small);
    the indicators themselves are pure CASE WHEN columns — scoring-friendly
    and schema-explicit, unlike ML-pipeline vector output.

    ``max_categories`` guards against encoding an id-like column into
    millions of indicator columns (driver OOM + unusable schema).
    """
    out = df
    for c in cols:
        values = [r[0] for r in
                  df.select(c).where(F.col(c).isNotNull())
                  .distinct().orderBy(c)
                  .limit(max_categories + 1).collect()]
        if len(values) > max_categories:
            raise ValueError(
                f"column {c!r} has more than max_categories="
                f"{max_categories} distinct values; one-hot encoding an "
                f"id-like column is almost never intended — bucket or hash "
                f"it instead, or raise max_categories deliberately")
        if drop_last and len(values) > 1:
            values = values[:-1]
        for v in values:
            out = out.withColumn(
                f"{c}_{v}", (F.col(c) == F.lit(v)).cast("int"))
    return out


def cut_bins(col, bins: list[float], labels: list | None = None) -> Column:
    """Explicit bin edges → labels (reference cut_bins / cutbins macro).

    Bins are left-open/right-closed like the reference: value v falls in bin i
    when bins[i] < v <= bins[i+1]; outside → NULL.
    """
    c = F.col(col) if isinstance(col, str) else col
    if len(bins) < 2:
        raise ValueError(f"need at least 2 bin edges, got {len(bins)}")
    if labels is None:
        labels = [f"({bins[i]}, {bins[i+1]}]" for i in range(len(bins) - 1)]
    if len(labels) != len(bins) - 1:
        raise ValueError("need len(bins)-1 labels")
    expr = F.lit(None).cast("string")
    out = None
    for i in range(len(bins) - 1):
        cond = (c > bins[i]) & (c <= bins[i + 1])
        out = F.when(cond, str(labels[i])) if out is None \
            else out.when(cond, str(labels[i]))
    return out.otherwise(expr)


def bucketize(df: DataFrame, col: str, splits: list[float] | None = None,
              num_quantiles: int | None = None,
              output_col: str | None = None,
              relative_error: float = 1e-4) -> DataFrame:
    """Bucket index column from explicit splits or quantile edges.

    ``num_quantiles`` → edges from ``approxQuantile`` (sketch-based — no
    global sort, works at any scale; the reference's ``quantilesArray`` path).
    """
    output_col = output_col or f"{col}_bucket"
    if splits is None:
        if not num_quantiles:
            raise ValueError("need splits or num_quantiles")
        probs = [i / num_quantiles for i in range(1, num_quantiles)]
        edges = df.approxQuantile(col, probs, relative_error)
        splits = [float("-inf")] + sorted(set(edges)) + [float("inf")]
    from pyspark.ml.feature import Bucketizer

    b = Bucketizer(splits=splits, inputCol=col, outputCol=output_col,
                   handleInvalid="keep")
    return b.transform(df)


def winsorize(df: DataFrame, cols: list[str] | str,
              lower: float = 0.01, upper: float = 0.99,
              relative_error: float = 1e-4,
              suffix: str = "") -> DataFrame:
    """Quantile-clip metric columns (the standard experiment-metric
    capping that keeps one whale user from owning the variance).

    Bounds come from ONE multi-column ``approxQuantile`` sketch pass (no
    sort at any scale); clipping itself is a pure projection.  With
    ``suffix=''`` columns are replaced in place; otherwise the clipped
    copy is added as ``<col><suffix>``."""
    col_list = [cols] if isinstance(cols, str) else list(cols)
    if not 0.0 <= lower < upper <= 1.0:
        raise ValueError("need 0 <= lower < upper <= 1")
    bounds = df.approxQuantile(col_list, [lower, upper], relative_error)
    out = df
    for c, b in zip(col_list, bounds):
        if len(b) < 2:          # all-NULL column: empty sketch, no bounds
            out = out.withColumn(c + suffix, F.col(c).cast("double"))
            continue
        lo, hi = b
        v = F.col(c).cast("double")
        # greatest/least skip NULL args (a NULL metric would silently
        # become the lower bound) and order NaN GREATER than every
        # number (a NaN metric would silently become the upper cap) —
        # preserve both explicitly
        clipped = F.when(v.isNotNull() & ~F.isnan(v),
                         F.least(F.greatest(v, F.lit(lo)), F.lit(hi))) \
            .otherwise(v)
        out = out.withColumn(c + suffix, clipped)
    return out


def trim_outliers(df: DataFrame, cols: list[str] | str,
                  lower: float = 0.01, upper: float = 0.99,
                  relative_error: float = 1e-4) -> DataFrame:
    """Drop rows outside the [lower, upper] quantile band of EVERY given
    metric column (trimmed-sample analysis; winsorize keeps the rows and
    caps the values instead)."""
    col_list = [cols] if isinstance(cols, str) else list(cols)
    if not 0.0 <= lower < upper <= 1.0:
        raise ValueError("need 0 <= lower < upper <= 1")
    bounds = df.approxQuantile(col_list, [lower, upper], relative_error)
    out = df
    for c, b in zip(col_list, bounds):
        if len(b) < 2:          # all-NULL column: no band to trim by —
            continue            # (a NULL metric fails any >= filter anyway)
        lo, hi = b
        cc = F.col(c).cast("double")
        out = out.where((cc >= F.lit(lo)) & (cc <= F.lit(hi)))
    return out


def polynomial_features(x: str, k: int) -> list[str]:
    """Power-expansion expressions ``pow(x, 1..k)`` for flexible-form DML /
    OLS formulas (reference ``lib/linear_dml.py:7-16`` — its two extra
    placeholder lists are gateway-template internals with no Spark
    counterpart)."""
    return [f"pow({x},{i})" for i in range(1, k + 1)]


_BUCKET_TREE_MAX_EDGES = 128


def bucket_by_edges(col: Column | str, edges: list[float]) -> Column:
    """Bucket id = number of ``edges`` ≤ value; NULL/NaN values bucket to
    NULL on both execution paths.

    Up to ``_BUCKET_TREE_MAX_EDGES`` edges: a BALANCED nested-WHEN tree —
    ⌈log₂ n⌉ comparisons per row instead of a linear n-branch CASE chain,
    fully inside whole-stage codegen.  Beyond that the generated
    expression's NODE count (not its depth) blows Janino's method-size
    limit and Spark silently falls back to interpreted evaluation — so
    large edge lists switch to an Arrow-batched ``np.searchsorted``
    (one vectorized binary search per batch).  Shared by score-quantile
    bucketing and ROC-threshold binning."""
    from pyspark.sql import functions as F

    c = F.col(col) if isinstance(col, str) else col
    edges = sorted(edges)
    if not edges:
        return F.lit(0)
    invalid = c.isNull() | F.isnan(c.cast("double"))

    if len(edges) > _BUCKET_TREE_MAX_EDGES:
        import numpy as np
        import pandas as pd

        from fast_causal_inference_spark.serialization import (
            ensure_udf_serializable,
        )

        arr = np.asarray(edges, dtype=float)

        # no type hints: `from __future__ import annotations` stringifies
        # them, which pandas_udf's signature inference rejects when pandas
        # is not imported at module scope
        def _bucket(vals):
            v = vals.to_numpy(dtype=float)
            out = np.searchsorted(arr, v, side="right").astype("int32")
            res = pd.Series(out, dtype="Int32")
            res[vals.isna()] = None
            return res

        ensure_udf_serializable()
        return F.pandas_udf(_bucket, "int")(c.cast("double"))

    def build(lo: int, hi: int) -> Column:
        # bucket index restricted to edges[lo:hi]
        if lo == hi:
            return F.lit(lo)
        mid = (lo + hi) // 2
        return F.when(c >= edges[mid], build(mid + 1, hi)) \
                .otherwise(build(lo, mid))

    # NULL/NaN → NULL on BOTH paths (the bare tree would send NULL to
    # bucket 0 and NaN to the top bucket — a silent semantics change at
    # the path-switch threshold)
    return F.when(~invalid, build(0, len(edges)))
