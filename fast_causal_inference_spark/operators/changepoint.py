"""Drift / changepoint detection over ordered metric series: CUSUM and
EWMA control charts, batch form (the streaming twin lives in
``streaming/ops.py:streaming_cusum``).

Beyond the reference (it monitors experiments but ships no drift
detector): the two classical sequential charts every metrics platform
ends up needing — tabular CUSUM for step shifts, EWMA for slow drifts.

Scale design: CUSUM's recursion C_t = max(0, C_{t−1} + z_t − k) has the
closed form C_t = S_t − min(0, min_{s≤t} S_s) with S the prefix sum of
(z_t − k), so the whole chart is TWO window functions per direction —
pure SQL, no UDF, re-derivable by any engine.  Windows partition by the
series key and order by time: parallelism is across series, the
per-series scan is the irreducible sequential structure of the chart.
EWMA's recursion does not telescope stably ((1−λ)^{−t} overflows), so it
runs as one pandas ``ewm`` per series group under ``applyInPandas`` —
each series must fit one task, the same contract.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _zcol(df: DataFrame, value: str, keys: list[str],
          target: float | None, sd: float | None):
    """Standardized column + the (possibly per-key estimated) params."""
    v = F.expr(value).cast("double")
    if target is not None and sd is not None:
        if sd <= 0:
            raise ValueError("sd must be positive")
        return df, (v - F.lit(float(target))) / F.lit(float(sd))
    # in-control params estimated from the series itself (Phase-I use:
    # pass explicit target/sd for a true Phase-II monitor)
    stats = (df.groupBy(*[F.col(c) for c in keys])
             .agg(F.avg(v).alias("__mu"), F.stddev_samp(v).alias("__sd"))
             if keys else
             df.agg(F.avg(v).alias("__mu"), F.stddev_samp(v).alias("__sd")))
    if keys:
        # NULL-SAFE key equality: a NULL series key is a real monitored
        # series (the groupBy above computes its stats), but a plain
        # equi-join's NULL != NULL would silently drop its rows — that
        # series would never alarm
        sr = stats.select(*[F.col(c).alias(f"__sk_{c}") for c in keys],
                          "__mu", "__sd")
        cond = None
        for c in keys:
            e = F.col(c).eqNullSafe(F.col(f"__sk_{c}"))
            cond = e if cond is None else cond & e
        joined = df.join(F.broadcast(sr), cond) \
            .drop(*[f"__sk_{c}" for c in keys])
    else:
        joined = df.crossJoin(F.broadcast(stats))
    z = (v - F.col("__mu")) / F.when(F.col("__sd") > 0, F.col("__sd"))
    return joined, z


def cusum_detect(df: DataFrame, value: str, order_by: list[str] | str,
                 group_by: list[str] | str | None = None,
                 target: float | None = None, sd: float | None = None,
                 k: float = 0.5, h: float = 5.0,
                 two_sided: bool = True) -> DataFrame:
    """Tabular CUSUM chart over each series.

    ``k`` — slack (in SDs; 0.5 targets 1σ shifts), ``h`` — decision
    threshold (in SDs; 4-5 standard).  ``target``/``sd`` pin the
    in-control distribution; left None they are estimated per series
    (Phase-I).  Returns the input keys + order columns with
    ``cusum_pos``, ``cusum_neg`` (0 when one-sided) and ``alarm``.
    """
    keys = [group_by] if isinstance(group_by, str) else list(group_by or [])
    order = [order_by] if isinstance(order_by, str) else list(order_by)
    if not order:
        raise ValueError("order_by is required — CUSUM is sequential")
    if h <= 0 or k < 0:
        raise ValueError("need h > 0 and k >= 0")
    src, z = _zcol(df, value, keys, target, sd)
    w = (Window.partitionBy(*[F.col(c) for c in keys]) if keys
         else Window.partitionBy()) \
        .orderBy(*[F.col(c) for c in order]) \
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    def chart(sign: float) -> Column:
        s = F.sum(sign * z - F.lit(float(k))).over(w)
        return s - F.least(F.lit(0.0), F.min(s).over(w))

    pos = chart(1.0)
    neg = chart(-1.0) if two_sided else F.lit(0.0)
    out = (src.withColumn("cusum_pos", pos)
           .withColumn("cusum_neg", neg)
           .withColumn("alarm", (F.col("cusum_pos") > h)
                       | (F.col("cusum_neg") > h)))
    return out.drop("__mu", "__sd")


def cusum_alarms(df: DataFrame, value: str, order_by: list[str] | str,
                 group_by: list[str] | str | None = None,
                 **kw) -> DataFrame:
    """First-alarm summary per series: n_points, n_alarms, and the order
    key of the first crossing (NULL when the series never alarms)."""
    keys = [group_by] if isinstance(group_by, str) else list(group_by or [])
    order = [order_by] if isinstance(order_by, str) else list(order_by)
    chart = cusum_detect(df, value, order, keys or None, **kw)
    first = F.when(F.col("alarm"),
                   F.struct(*[F.col(c) for c in order]))
    aggs = [F.count(F.lit(1)).alias("n_points"),
            F.sum(F.col("alarm").cast("long")).alias("n_alarms"),
            F.round(F.max("cusum_pos"), 6).alias("max_cusum_pos"),
            F.round(F.max("cusum_neg"), 6).alias("max_cusum_neg"),
            F.min(first).alias("__first")]
    g = chart.groupBy(*[F.col(c) for c in keys]) if keys else chart.groupBy()
    out = g.agg(*aggs)
    for c in order:
        out = out.withColumn(f"first_alarm_{c}", F.col(f"__first.{c}"))
    return out.drop("__first")


def ewma_detect(df: DataFrame, value: str, order_by: list[str] | str,
                group_by: list[str] | str | None = None,
                target: float | None = None, sd: float | None = None,
                lam: float = 0.2, L: float = 3.0) -> DataFrame:
    """EWMA control chart: E_t = λz_t + (1−λ)E_{t−1}, alarm when |E_t|
    exceeds L·√(λ/(2−λ)·(1−(1−λ)^{2t})) — the drift-sensitive
    complement to CUSUM.  One ``applyInPandas`` per series (exact pandas
    ``ewm(adjust=False)`` recursion); each series must fit one task.
    """
    import pandas as pd

    from fast_causal_inference_spark.serialization import (
        ensure_udf_serializable,
    )

    if not 0 < lam <= 1:
        raise ValueError("lam must lie in (0, 1]")
    keys = [group_by] if isinstance(group_by, str) else list(group_by or [])
    order = [order_by] if isinstance(order_by, str) else list(order_by)
    src, z = _zcol(df, value, keys, target, sd)
    gcols = keys or []
    base = src.withColumn("__z", z)
    sel = base.select(*(gcols + order + ["__z"])) if gcols \
        else base.select(*(order + ["__z"])).withColumn("__g", F.lit(0))
    gb = gcols or ["__g"]
    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in sel.schema.fields if f.name != "__z") \
        + ", ewma double, ucl double, alarm boolean"

    lam_f, L_f = float(lam), float(L)

    def _chart(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as _np

        pdf = pdf.sort_values(order).reset_index(drop=True)
        # E₀ = 0 (the in-control target): prepend a zero so pandas'
        # adjust=False recursion yields E₁ = λz₁, matching the UCL's
        # variance ramp — raw ewm would set E₁ = z₁ and over-alarm the
        # first ~1/λ points
        z0 = pd.concat([pd.Series([0.0]), pdf["__z"]],
                       ignore_index=True)
        e = z0.ewm(alpha=lam_f, adjust=False).mean().iloc[1:]
        t = _np.arange(1, len(pdf) + 1, dtype=float)
        ucl = L_f * _np.sqrt(lam_f / (2 - lam_f)
                             * (1 - (1 - lam_f) ** (2 * t)))
        out = pdf.drop(columns="__z")
        out["ewma"] = e.to_numpy()
        out["ucl"] = ucl
        out["alarm"] = _np.abs(e.to_numpy()) > ucl
        return out

    ensure_udf_serializable()
    out = sel.groupBy(*gb).applyInPandas(_chart, schema)
    return out.drop("__g") if not gcols else out
