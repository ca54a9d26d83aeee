"""Structured Streaming experiment analytics.

The reference is batch-only (SURVEY.md §2.3: "no streaming of any kind");
this module is the Spark-native value-add: the SAME sufficient-statistics
kernel runs over event-time windows, so a live experiment readout
(estimate / SE / t / p per window per arm) is a standard
``withWatermark().groupBy(window(...)).agg(...)`` — incremental, late-data
tolerant, and restart-safe via checkpointing. All statistics are rendered as
closed-form Column expressions over the aggregated state (the columnar path —
no Python in the continuous query), with normal-approximation p-values via an
erf Arrow UDF in the output projection.
"""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from fast_causal_inference_spark.formula import parse_formulas
from fast_causal_inference_spark.operators.suffstats import (
    StatView,
    suffstat_agg_columns,
)


def _norm_sf_col(z: Column) -> Column:
    """P(Z > z) as a Column (Arrow UDF over math.erfc — projection only)."""
    from fast_causal_inference_spark.serialization import (
        ensure_udf_serializable,
    )

    @F.pandas_udf("double")
    def _sf(s: pd.Series) -> pd.Series:
        return s.map(lambda v: 0.5 * math.erfc(v / math.sqrt(2.0))
                     if v == v else float("nan"))

    ensure_udf_serializable()
    return _sf(z)


def streaming_metric(stream: DataFrame, Y: str, ts_col: str,
                     window_duration: str = "1 minute",
                     slide: str | None = None,
                     watermark: str = "2 minutes") -> DataFrame:
    """Windowed metric estimate + delta-method SE of a formula of means.

    Returns a streaming DataFrame (window, n, estimate, stderr) suitable for
    ``writeStream`` in update/append mode.
    """
    nodes, base = parse_formulas([Y])
    node = nodes[0]
    win = F.window(F.col(ts_col), window_duration, slide or window_duration)
    agged = (stream.withWatermark(ts_col, watermark)
             .groupBy(win.alias("window"))
             .agg(*suffstat_agg_columns(base)))
    view = StatView(len(base))
    return agged.select(
        "window", view.n.alias("n"),
        view.value(node).alias("estimate"),
        F.sqrt(view.var_of_formula_mean(node)).alias("stderr"))


def streaming_ttest_2samp(stream: DataFrame, Y: str, index: str, ts_col: str,
                          window_duration: str = "1 minute",
                          slide: str | None = None,
                          watermark: str = "2 minutes",
                          treatment_values: tuple = (0, 1),
                          with_p_value: bool = True) -> DataFrame:
    """Continuously-updating two-sample t-test per event-time window.

    One stateful windowed aggregation; estimate/stderr/t are closed-form
    columns over the window state.
    """
    nodes, base = parse_formulas([Y])
    node = nodes[0]
    idx = F.col(index) if index.isidentifier() else F.expr(index)
    v0, v1 = treatment_values
    win = F.window(F.col(ts_col), window_duration, slide or window_duration)
    aggs = (suffstat_agg_columns(base, "g0_", idx == F.lit(v0))
            + suffstat_agg_columns(base, "g1_", idx == F.lit(v1)))
    agged = (stream.withWatermark(ts_col, watermark)
             .groupBy(win.alias("window")).agg(*aggs))
    v0v = StatView(len(base), "g0_")
    v1v = StatView(len(base), "g1_")
    est = v1v.value(node) - v0v.value(node)
    se = F.sqrt(v0v.var_of_formula_mean(node) + v1v.var_of_formula_mean(node))
    t = est / F.nullif(se, F.lit(0.0))
    out = agged.select("window",
                       v0v.n.alias("n0"), v1v.n.alias("n1"),
                       v0v.value(node).alias("mean0"),
                       v1v.value(node).alias("mean1"),
                       est.alias("estimate"), se.alias("stderr"),
                       t.alias("t_stat"))
    if with_p_value:
        out = out.withColumn("p_value", 2.0 * _norm_sf_col(F.abs(F.col("t_stat"))))
    return out


def streaming_srm(stream: DataFrame, index: str, ts_col: str,
                  window_duration: str = "1 minute",
                  watermark: str = "2 minutes",
                  ratio: tuple = (1.0, 1.0),
                  treatment_values: tuple = (0, 1)) -> DataFrame:
    """Continuous sample-ratio-mismatch chi-square (2 arms) per window."""
    idx = F.col(index) if index.isidentifier() else F.expr(index)
    v0, v1 = treatment_values
    r0, r1 = float(ratio[0]), float(ratio[1])
    win = F.window(F.col(ts_col), window_duration)
    agged = (stream.withWatermark(ts_col, watermark)
             .groupBy(win.alias("window"))
             .agg(F.count(F.when(idx == F.lit(v0), 1)).alias("n0"),
                  F.count(F.when(idx == F.lit(v1), 1)).alias("n1")))
    tot = F.col("n0") + F.col("n1")
    e0 = tot * r0 / (r0 + r1)
    e1 = tot * r1 / (r0 + r1)
    chi2 = (F.col("n0") - e0) ** 2 / e0 + (F.col("n1") - e1) ** 2 / e1
    return agged.select("window", "n0", "n1",
                        e0.alias("expected0"), e1.alias("expected1"),
                        chi2.alias("chisquare"))


def run_to_memory(stream_out: DataFrame, query_name: str,
                  output_mode: str = "complete") -> None:
    """Drain an availableNow streaming query into an in-memory table
    (testing/demo helper)."""
    q = (stream_out.writeStream.format("memory").queryName(query_name)
         .outputMode(output_mode).trigger(availableNow=True).start())
    q.awaitTermination()
