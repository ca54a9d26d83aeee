"""Bootstrap and permutation resampling — replicated single-pass aggregation.

Parity targets: reference ``boot_strap`` table function /
``AggregateFunctionBootStrap`` (binomial per-chunk sampling seeded by
``DistributedNodeRowNumber``) and ``Permutation`` UDAFs; Python facades
``statistics.py:850-949``.

Spark-first: the classic Poisson-bootstrap trick. Each row is exploded into B
replica ids; a replica weight ~ Poisson(frac) is drawn via an inverse-CDF
``CASE WHEN`` chain over ``rand()`` — pure JVM codegen, no Python in the row
path — and ONE ``groupBy(replica)`` with map-side combine reduces everything
to B sufficient-statistics rows. Shuffle payload is O(B·partitions·k²)
doubles, independent of row count. No DistributedNodeRowNumber needed:
``rand(seed)`` is per-row deterministic given the partition layout.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from fast_causal_inference_spark.formula import parse_formula
from fast_causal_inference_spark.operators.suffstats import (
    StatView,
    suffstat_agg_columns,
)


def poisson_weight_column(lam: float, rand_col: Column,
                          max_k: int | None = None) -> Column:
    """Inverse-CDF Poisson(λ) draw from a uniform — a WHEN-chain Column.

    Exact CDF thresholds are precomputed on the driver; the per-row work is a
    handful of branch comparisons inside whole-stage codegen.
    """
    if max_k is None:
        max_k = max(10, int(lam + 8 * math.sqrt(max(lam, 1.0))))
    probs = []
    pk = math.exp(-lam)
    cum = pk
    probs.append(cum)
    for k in range(1, max_k + 1):
        pk = pk * lam / k
        cum += pk
        probs.append(cum)
    expr = F.lit(max_k + 1)
    # build from the top down: WHEN u < cdf(0) THEN 0 WHEN u < cdf(1) ...
    chain = F.when(rand_col < probs[0], 0)
    for k in range(1, max_k + 1):
        chain = chain.when(rand_col < probs[k], k)
    return chain.otherwise(expr)


def boot_strap(df: DataFrame, expr: str, n_resamples: int = 100,
               resample_frac: float = 1.0, seed: int = 42,
               group_cols: list[str] | None = None) -> DataFrame:
    """B Poisson-bootstrap replicas of a metric formula (e.g. ``avg(x)``,
    ``avg(num)/avg(den)``, ``sum(x)`` via ``avg(x)*count`` semantics below).

    Returns a DataFrame (group_cols…, replica_id, value) — feed into
    :func:`boot_strap_summary` for point estimate / SE / percentile CI.
    """
    group_cols = list(group_cols or [])
    node, base = parse_formula(expr)
    rep = F.explode(F.sequence(F.lit(0), F.lit(n_resamples - 1))).alias("replica_id")
    w = poisson_weight_column(resample_frac, F.rand(seed)).cast("double")
    exploded = df.select(*group_cols, *[F.expr(e).cast("double").alias(f"__b{i}")
                                        for i, e in enumerate(base)], rep) \
                 .withColumn("__w", w)
    view = StatView(len(base))
    aggs = suffstat_agg_columns([f"__b{i}" for i in range(len(base))],
                                weight=F.col("__w"))
    agged = exploded.groupBy(*group_cols, "replica_id").agg(*aggs)
    return agged.select(*group_cols, "replica_id",
                        view.value(node).alias("value"))


def boot_strap_summary(df: DataFrame, expr: str, n_resamples: int = 100,
                       resample_frac: float = 1.0, seed: int = 42,
                       alpha: float = 0.05,
                       group_cols: list[str] | None = None) -> pd.DataFrame:
    """Bootstrap mean / SE / percentile-CI of a metric formula."""
    group_cols = list(group_cols or [])
    reps = boot_strap(df, expr, n_resamples, resample_frac, seed, group_cols)
    out = (reps.groupBy(*group_cols)
           .agg(F.avg("value").alias("estimate"),
                F.stddev_samp("value").alias("stderr"),
                F.percentile_approx("value", alpha / 2, 10000).alias("lower"),
                F.percentile_approx("value", 1 - alpha / 2, 10000).alias("upper"),
                F.count("*").alias("n_resamples")))
    return out.toPandas()


def permutation(df: DataFrame, expr: str, index: str,
                permutation_num: int = 100, seed: int = 42,
                treatment_values: tuple = (0, 1),
                mde: float = 0.0) -> pd.DataFrame:
    """Permutation test of the between-arm difference of a metric formula.

    Re-randomizes treatment B times (Bernoulli with the observed arm share —
    the reference's shuffled-label semantics at scale), recomputes the metric
    difference per replica in ONE aggregation pass, and reports the
    permutation p-value of the observed difference (optionally shifted by
    ``mde`` for power probing).
    """
    node, base = parse_formula(expr)
    idx = F.col(index) if index.isidentifier() else F.expr(index)
    v0, v1 = treatment_values
    sub = df.where(idx.isin([v0, v1])) \
            .select((idx == F.lit(v1)).cast("int").alias("__t"),
                    *[F.expr(e).cast("double").alias(f"__b{i}")
                      for i, e in enumerate(base)])
    k = len(base)
    view0 = StatView(k, "g0_")
    view1 = StatView(k, "g1_")
    bcols = [f"__b{i}" for i in range(k)]

    # observed difference
    obs_row = sub.agg(*(suffstat_agg_columns(bcols, "g0_", F.col("__t") == 0)
                        + suffstat_agg_columns(bcols, "g1_", F.col("__t") == 1)
                        + [F.avg(F.col("__t").cast("double")).alias("p1__")])) \
                 .select((view1.value(node) - view0.value(node)).alias("diff"),
                         F.col("p1__")).collect()[0]
    observed = float(obs_row["diff"])
    p1 = float(obs_row["p1__"])

    rep = F.explode(F.sequence(F.lit(0), F.lit(permutation_num - 1))) \
        .alias("replica_id")
    exploded = sub.select(*bcols, rep) \
                  .withColumn("__t", (F.rand(seed) < p1).cast("int"))
    aggs = (suffstat_agg_columns(bcols, "g0_", F.col("__t") == 0)
            + suffstat_agg_columns(bcols, "g1_", F.col("__t") == 1))
    reps = exploded.groupBy("replica_id").agg(*aggs) \
        .select((view1.value(node) - view0.value(node)).alias("diff"))
    diffs = np.array([r["diff"] for r in reps.collect()], dtype=float)
    shifted = abs(observed) - abs(mde)
    p_val = float((np.abs(diffs) >= shifted).mean())
    return pd.DataFrame([{
        "observed_diff": observed, "p_value": p_val,
        "n_permutations": len(diffs),
        "perm_mean": float(diffs.mean()), "perm_std": float(diffs.std(ddof=1)),
    }])
