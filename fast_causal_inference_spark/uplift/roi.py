"""ROI / iROI / target-rate uplift evaluation suite (reference parity).

Parity target: the reference's own PySpark evaluation module
``lib/spark_evaluation.py`` (``_estimate_metrics`` :51-199, ``_compute_ci``
:202-299, ``estimate_ate`` :422, ``estimate_roi`` :487, ``estimate_iroi``
:543, per-bucket/per-quantile variants :611-1255, ``estimate_cate_lift``
:1388, ``estimate_qini`` :1581, ``compute_auuc`` :1810,
``compute_qini_coefficient`` :1823, ``estimate_cum_iroi`` :1839).  The
metric definitions are reproduced; the implementation is fresh and
re-shaped for Spark scale:

* The reference multiplies the row count by ``n_bootstraps`` with a
  non-deterministic ``posexplode`` UDF.  Here the Poisson bootstrap rides
  the repo's codegen WHEN-chain (`operators/resample.poisson_weight_column`)
  under one ``explode(sequence(...))`` — seeded, no Python in the row path,
  map-side combine reduces every task to ≤ (buckets × B) rows before the
  single exchange.
* The reference computes CIs with three extra Spark jobs
  (filter/join/percentile_approx over the replica relation).  The replica
  aggregate here is at most (buckets × (B+1)) rows, so CI finalization is
  exact numpy on the driver — zero extra jobs, exact quantiles.
* Replica 0 is the unweighted point estimate (reference semantics: the 0th
  bootstrap carries the original data with weight 1).

All public functions return pandas DataFrames (the aggregate is K×B cells —
driver-sized at any data scale) with the reference's column names.
"""

from __future__ import annotations

import warnings
from typing import Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fast_causal_inference_spark.operators.resample import poisson_weight_column

__all__ = [
    "assign_score_buckets",
    "estimate_metrics",
    "estimate_ate",
    "estimate_roi",
    "estimate_iroi",
    "estimate_target_rate_per_bucket",
    "estimate_target_rate_per_quantile",
    "estimate_cate_per_bucket",
    "estimate_cate_per_quantile",
    "estimate_iroi_per_bucket",
    "estimate_iroi_per_quantile",
    "estimate_cate_lift",
    "estimate_qini",
    "estimate_cum_iroi",
    "estimate_economics",
    "compute_auuc",
    "compute_qini_coefficient",
]

_METRIC_TYPES = ("ate", "roi", "iroi", "target_rate", "all")


def assign_score_buckets(df: DataFrame, n_buckets: int = 30,
                         score_colname: str = "score",
                         bucket_colname: str = "bucket",
                         add_labels: bool = False,
                         relative_error: float = 1e-5) -> DataFrame:
    """Quantile-bucket a model-score column (QuantileDiscretizer semantics,
    reference ``_assign_bucket`` :368-419): bucket ids 0..k-1 ascending in
    score, a ``threshold`` column carrying each bucket's left split, rows
    with NULL/NaN scores dropped (``handleInvalid='skip'``).

    Implemented with one ``approxQuantile`` sketch + a codegen WHEN-chain —
    no MLlib fit, no extra pass beyond the sketch."""
    clean = df.filter(F.col(score_colname).isNotNull() &
                      ~F.isnan(F.col(score_colname).cast("double")))
    from fast_causal_inference_spark.functions.features import (
        bucket_by_edges,
    )

    probs = [i / n_buckets for i in range(1, n_buckets)]
    splits = clean.approxQuantile(score_colname, probs, relative_error)
    edges = sorted(set(splits))
    # bucket = number of interior edges at or below the score — a
    # balanced WHEN tree (log₂ comparisons per row)
    out = clean.withColumn(
        bucket_colname,
        bucket_by_edges(F.col(score_colname), edges).cast("double"))
    lo = [float("-inf")] + edges
    thr_map = F.map_from_arrays(
        F.array(*[F.lit(float(i)) for i in range(len(lo))]),
        F.array(*[F.lit(v) for v in lo]))
    out = out.withColumn("threshold", thr_map[F.col(bucket_colname)])
    if add_labels:
        hi = edges + [float("inf")]
        labels = [f"[{a:.2f}, {b:.2f})" for a, b in zip(lo, hi)]
        lbl_map = F.map_from_arrays(
            F.array(*[F.lit(float(i)) for i in range(len(labels))]),
            F.array(*[F.lit(s) for s in labels]))
        out = out.withColumn(bucket_colname, lbl_map[F.col(bucket_colname)])
    return out


def _aggregate(df: DataFrame, metric_type: str, target_colname: str,
               benefit_colname: str, cost_colname: str,
               treatment_colname: str, treatment_value, control_value,
               bucket_colname: str | None, bootstrap: bool,
               n_bootstraps: int, seed: int,
               carry_threshold: bool = False) -> pd.DataFrame:
    """ONE Spark aggregation producing every sufficient sum the requested
    metric needs, per (bucket × replica) cell; replica 0 unweighted.
    ``carry_threshold`` rides the assign_score_buckets threshold column
    through the groupBy — only set by the per-quantile wrappers (a
    user-supplied frame may coincidentally carry a row-level column named
    'threshold'; silently grouping on it would fracture the buckets)."""
    # Internal replica/weight names and the output aliases 'count'/'fraction'
    # are reserved: a user frame already carrying them would make the
    # grouping ambiguous (same guard idea as carry_threshold for
    # 'threshold'). Role columns may not use reserved names; mere bystander
    # columns with those names are dropped (they don't feed any sum).
    reserved = {"bootstrap", "__u", "__w"}
    roles = {x for x in (bucket_colname, target_colname, benefit_colname,
                         cost_colname, treatment_colname) if x is not None}
    if carry_threshold and "threshold" in df.columns:
        roles.add("threshold")
    bad = reserved & roles
    if bad:
        raise ValueError(
            f"column name(s) {sorted(bad)} are reserved for internal "
            f"bootstrap state; rename the input column(s)")
    if bucket_colname in ("count", "fraction"):
        raise ValueError(
            f"bucket column may not be named {bucket_colname!r}: it would "
            f"collide with the aggregate output of the same name")
    clash = [c for c in df.columns if c in reserved]
    if clash:
        df = df.drop(*clash)

    group_cols: list[str] = []
    if bucket_colname is not None:
        group_cols.append(bucket_colname)
        if carry_threshold and "threshold" in df.columns:
            group_cols.append("threshold")

    if bootstrap:
        # project the role columns BEFORE the (B+1)x explode — every
        # extra input column is replicated into each replica row and fed
        # through the hash aggregate for nothing
        keep = [c for c in {bucket_colname, "threshold" if carry_threshold
                            and "threshold" in df.columns else None,
                            target_colname, benefit_colname, cost_colname,
                            treatment_colname} if c and c in df.columns]
        rep = F.explode(
            F.sequence(F.lit(0), F.lit(n_bootstraps))).alias("bootstrap")
        df = df.select(*keep, rep).withColumn("__u", F.rand(seed))
        w = F.when(F.col("bootstrap") == 0, F.lit(1)).otherwise(
            poisson_weight_column(1.0, F.col("__u"))).cast("double")
        group_cols.append("bootstrap")
    else:
        w = F.lit(1.0)
    df = df.withColumn("__w", w)
    if bootstrap:
        df = df.drop("__u")

    is_t = F.col(treatment_colname) == F.lit(treatment_value)
    is_c = F.col(treatment_colname) == F.lit(control_value)
    wsum = lambda cond, c: F.sum(
        F.when(cond, F.col(c).cast("double") * F.col("__w")).otherwise(0.0))
    aggs = [F.sum("__w").alias("count")]
    if metric_type == "all":
        # every sufficient sum for ate + roi + iroi + target_rate in ONE
        # aggregation — the one-scan economics report
        aggs += [F.sum(F.when(is_t, F.col("__w")).otherwise(0.0)).alias("treatment_count"),
                 F.sum(F.when(is_c, F.col("__w")).otherwise(0.0)).alias("control_count"),
                 wsum(is_t, target_colname).alias("treatment_target"),
                 wsum(is_c, target_colname).alias("control_target"),
                 F.sum(F.col(benefit_colname).cast("double") * F.col("__w")).alias("tot_benefit"),
                 F.sum(F.col(cost_colname).cast("double") * F.col("__w")).alias("tot_cost"),
                 wsum(is_t, benefit_colname).alias("treatment_benefit"),
                 wsum(is_c, benefit_colname).alias("control_benefit"),
                 wsum(is_t, cost_colname).alias("treatment_cost"),
                 wsum(is_c, cost_colname).alias("control_cost"),
                 F.sum(F.col(target_colname).cast("double") * F.col("__w")).alias("tot_target")]
    elif metric_type == "ate":
        aggs += [F.sum(F.when(is_t, F.col("__w")).otherwise(0.0)).alias("treatment_count"),
                 F.sum(F.when(is_c, F.col("__w")).otherwise(0.0)).alias("control_count"),
                 wsum(is_t, target_colname).alias("treatment_target"),
                 wsum(is_c, target_colname).alias("control_target")]
    elif metric_type == "roi":
        aggs += [F.sum(F.col(benefit_colname).cast("double") * F.col("__w")).alias("tot_benefit"),
                 F.sum(F.col(cost_colname).cast("double") * F.col("__w")).alias("tot_cost")]
    elif metric_type == "iroi":
        aggs += [F.sum(F.when(is_t, F.col("__w")).otherwise(0.0)).alias("treatment_count"),
                 F.sum(F.when(is_c, F.col("__w")).otherwise(0.0)).alias("control_count"),
                 wsum(is_t, benefit_colname).alias("treatment_benefit"),
                 wsum(is_c, benefit_colname).alias("control_benefit"),
                 wsum(is_t, cost_colname).alias("treatment_cost"),
                 wsum(is_c, cost_colname).alias("control_cost")]
    elif metric_type == "target_rate":
        aggs += [F.sum(F.col(target_colname).cast("double") * F.col("__w")).alias("tot_target")]
    else:
        raise ValueError(f"metric_type must be one of {_METRIC_TYPES}")
    return df.groupBy(*group_cols).agg(*aggs).toPandas()


def _finalize(pdf: pd.DataFrame, metric_type: str, bucket_colname: str | None,
              cumulative: bool) -> pd.DataFrame:
    """Driver-side: fraction, (optional) descending-bucket cumulation of the
    raw sums, then the final ratio metrics — reference order of operations
    (cumulate sums first, divide after)."""
    group_cols = [c for c in (bucket_colname, "threshold", "bootstrap")
                  if c is not None and c in pdf.columns]
    metric_cols = [c for c in pdf.columns if c not in group_cols]

    by_rep = ["bootstrap"] if "bootstrap" in pdf.columns else []
    if bucket_colname is None:
        pdf["fraction"] = 1.0
    else:
        tot = (pdf.groupby(by_rep)["count"].transform("sum") if by_rep
               else pdf["count"].sum())
        pdf["fraction"] = pdf["count"] / tot
    metric_cols.append("fraction")

    if cumulative:
        order_col = bucket_colname if bucket_colname is not None else "count"
        pdf = pdf.sort_values(by_rep + [order_col],
                              ascending=[True] * len(by_rep) + [False])
        if by_rep:
            pdf[metric_cols] = pdf.groupby(by_rep)[metric_cols].cumsum()
        else:
            pdf[metric_cols] = pdf[metric_cols].cumsum()

    with np.errstate(divide="ignore", invalid="ignore"):
        if metric_type == "all":
            pdf["target_rate_treated"] = pdf.treatment_target / pdf.treatment_count
            pdf["target_rate_control"] = pdf.control_target / pdf.control_count
            pdf["ate"] = pdf.target_rate_treated - pdf.target_rate_control
            pdf["roi"] = pdf.tot_benefit / pdf.tot_cost
            sf = pdf.treatment_count / pdf.control_count
            pdf["incremental_benefit"] = pdf.treatment_benefit - pdf.control_benefit * sf
            pdf["incremental_cost"] = pdf.treatment_cost - pdf.control_cost * sf
            pdf["iroi"] = pdf.incremental_benefit / pdf.incremental_cost
            n_neg = int((pdf.incremental_cost < 0).sum())
            if n_neg:
                warnings.warn(
                    f"{n_neg} cells had negative incremental cost; "
                    "iROI is unreliable there.", stacklevel=3)
            pdf["target_rate"] = pdf.tot_target / pdf["count"]
        elif metric_type == "ate":
            pdf["target_rate_treated"] = pdf.treatment_target / pdf.treatment_count
            pdf["target_rate_control"] = pdf.control_target / pdf.control_count
            pdf["ate"] = pdf.target_rate_treated - pdf.target_rate_control
        elif metric_type == "roi":
            pdf["roi"] = pdf.tot_benefit / pdf.tot_cost
        elif metric_type == "iroi":
            sf = pdf.treatment_count / pdf.control_count
            pdf["incremental_benefit"] = pdf.treatment_benefit - pdf.control_benefit * sf
            pdf["incremental_cost"] = pdf.treatment_cost - pdf.control_cost * sf
            pdf["iroi"] = pdf.incremental_benefit / pdf.incremental_cost
            n_neg = int((pdf.incremental_cost < 0).sum())
            if n_neg:
                warnings.warn(
                    f"{n_neg} cells had negative incremental cost; "
                    "iROI is unreliable there.", stacklevel=3)
        elif metric_type == "target_rate":
            pdf["target_rate"] = pdf.tot_target / pdf["count"]
    return pdf


def _basic_bootstrap_ci(pdf: pd.DataFrame, relevant_cols: Sequence[str],
                        bucket_colname: str | None,
                        ci_quantiles: Sequence[float]) -> pd.DataFrame:
    """Basic (reverse-percentile) bootstrap CI + bootstrap SE, reference
    ``_compute_ci`` semantics (lower = pe − q_hi(delta), upper = pe −
    q_lo(delta), se = √mean(delta²)) with exact quantiles — the replica
    relation is driver-sized so no percentile_approx is needed."""
    keys = [c for c in (bucket_colname,) if c is not None]
    pe = pdf[pdf.bootstrap == 0]
    reps = pdf[pdf.bootstrap != 0]
    if keys:
        merged = reps.merge(pe[keys + list(relevant_cols)], on=keys,
                            suffixes=("", "_pe"))
    else:
        merged = reps.assign(**{f"{c}_pe": float(pe[c].iloc[0])
                                for c in relevant_cols})
    out = pe.drop(columns=["bootstrap"]).reset_index(drop=True)
    grp = merged.groupby(keys[0]) if keys else [(None, merged)]
    rows = {}
    for key, g in grp:
        stats = {}
        for c in relevant_cols:
            delta = (g[c] - g[f"{c}_pe"]).to_numpy(dtype=float)
            delta = delta[np.isfinite(delta)]
            if delta.size == 0:
                stats[f"{c}_lower"] = stats[f"{c}_upper"] = np.nan
                stats[f"{c}_std_error"] = np.nan
                continue
            q_lo, q_hi = np.quantile(delta, [ci_quantiles[0], ci_quantiles[1]])
            stats[f"{c}_lower"] = -q_hi
            stats[f"{c}_upper"] = -q_lo
            stats[f"{c}_std_error"] = float(np.sqrt(np.mean(delta ** 2)))
        rows[key] = stats
    for c in relevant_cols:
        for suffix in ("lower", "upper", "std_error"):
            col = f"{c}_{suffix}"
            if keys:
                vals = out[keys[0]].map(lambda k: rows.get(k, {}).get(col, np.nan))
            else:
                vals = rows[None][col]
            out[col] = vals
    for c in relevant_cols:
        out[f"{c}_lower"] = out[c] + out[f"{c}_lower"]
        out[f"{c}_upper"] = out[c] + out[f"{c}_upper"]
    return out


def estimate_metrics(df: DataFrame, metric_type: str = "ate",
                     target_colname: str = "outcome",
                     benefit_colname: str = "revenue",
                     cost_colname: str = "cost",
                     treatment_colname: str = "treatment",
                     treatment_value=1, control_value=0,
                     bucket_colname: str | None = None,
                     cumulative: bool = False,
                     bootstrap: bool = False, n_bootstraps: int = 100,
                     ci_quantiles: Sequence[float] | None = None,
                     seed: int = 42,
                     carry_threshold: bool = False) -> pd.DataFrame:
    """General engine behind every estimator in this module (the reference's
    ``_estimate_metrics`` + ``_compute_ci``, fused into one Spark job)."""
    relevant = {"ate": ["ate"], "roi": ["roi"], "iroi": ["iroi"],
                "target_rate": ["target_rate"],
                "all": ["ate", "roi", "iroi", "target_rate"]}[metric_type]
    pdf = _aggregate(df, metric_type, target_colname, benefit_colname,
                     cost_colname, treatment_colname, treatment_value,
                     control_value, bucket_colname, bootstrap,
                     n_bootstraps, seed, carry_threshold)
    pdf = _finalize(pdf, metric_type, bucket_colname, cumulative)
    if bootstrap:
        pdf = _basic_bootstrap_ci(pdf, relevant, bucket_colname,
                                  ci_quantiles or [0.025, 0.975])
    sort_keys = ([bucket_colname] if bucket_colname else [])
    if sort_keys:
        pdf = pdf.sort_values(sort_keys, ascending=not cumulative)
    return pdf.reset_index(drop=True)


def estimate_ate(df: DataFrame, target_colname: str = "outcome",
                 treatment_colname: str = "treatment", treatment_value=1,
                 control_value=0, bootstrap: bool = False,
                 n_bootstraps: int = 100,
                 ci_quantiles: Sequence[float] | None = None,
                 seed: int = 42) -> pd.DataFrame:
    """Population diff-in-means ATE (+ optional Poisson-bootstrap CI)."""
    return estimate_metrics(df, "ate", target_colname=target_colname,
                            treatment_colname=treatment_colname,
                            treatment_value=treatment_value,
                            control_value=control_value, bootstrap=bootstrap,
                            n_bootstraps=n_bootstraps,
                            ci_quantiles=ci_quantiles, seed=seed)


def estimate_roi(df: DataFrame, benefit_colname: str = "revenue",
                 cost_colname: str = "cost", bootstrap: bool = False,
                 n_bootstraps: int = 100,
                 ci_quantiles: Sequence[float] | None = None,
                 seed: int = 42) -> pd.DataFrame:
    """Pooled return on investment: Σbenefit / Σcost."""
    return estimate_metrics(df, "roi", benefit_colname=benefit_colname,
                            cost_colname=cost_colname, bootstrap=bootstrap,
                            n_bootstraps=n_bootstraps,
                            ci_quantiles=ci_quantiles, seed=seed)


def estimate_iroi(df: DataFrame, benefit_colname: str = "revenue",
                  cost_colname: str = "cost",
                  treatment_colname: str = "treatment", treatment_value=1,
                  control_value=0, bootstrap: bool = False,
                  n_bootstraps: int = 100,
                  ci_quantiles: Sequence[float] | None = None,
                  seed: int = 42) -> pd.DataFrame:
    """Incremental ROI: (B_t − B_c·n_t/n_c) / (C_t − C_c·n_t/n_c)."""
    return estimate_metrics(df, "iroi", benefit_colname=benefit_colname,
                            cost_colname=cost_colname,
                            treatment_colname=treatment_colname,
                            treatment_value=treatment_value,
                            control_value=control_value, bootstrap=bootstrap,
                            n_bootstraps=n_bootstraps,
                            ci_quantiles=ci_quantiles, seed=seed)


def estimate_target_rate_per_bucket(df: DataFrame,
                                    bucket_colname: str = "bucket",
                                    target_colname: str = "outcome",
                                    bootstrap: bool = False,
                                    n_bootstraps: int = 100,
                                    ci_quantiles: Sequence[float] | None = None,
                                    seed: int = 42,
                                    carry_threshold: bool = False) -> pd.DataFrame:
    """Per-bucket mean outcome (target rate) over an existing bucket column."""
    return estimate_metrics(df, "target_rate", target_colname=target_colname,
                            bucket_colname=bucket_colname,
                            bootstrap=bootstrap, n_bootstraps=n_bootstraps,
                            ci_quantiles=ci_quantiles, seed=seed,
                            carry_threshold=carry_threshold)


def estimate_target_rate_per_quantile(df: DataFrame, n_buckets: int = 30,
                                      score_colname: str = "score",
                                      target_colname: str = "outcome",
                                      bootstrap: bool = False,
                                      n_bootstraps: int = 100,
                                      ci_quantiles: Sequence[float] | None = None,
                                      seed: int = 42) -> pd.DataFrame:
    """Target rate per model-score quantile bucket."""
    b = assign_score_buckets(df, n_buckets, score_colname, "bucket")
    return estimate_target_rate_per_bucket(
        b, "bucket", target_colname, bootstrap, n_bootstraps,
        ci_quantiles, seed, carry_threshold=True)


def estimate_cate_per_bucket(df: DataFrame, bucket_colname: str = "bucket",
                             target_colname: str = "outcome",
                             treatment_colname: str = "treatment",
                             treatment_value=1, control_value=0,
                             bootstrap: bool = False, n_bootstraps: int = 100,
                             ci_quantiles: Sequence[float] | None = None,
                             seed: int = 42,
                             carry_threshold: bool = False) -> pd.DataFrame:
    """Per-bucket diff-in-means CATE over an existing bucket column."""
    return estimate_metrics(df, "ate", target_colname=target_colname,
                            treatment_colname=treatment_colname,
                            treatment_value=treatment_value,
                            control_value=control_value,
                            bucket_colname=bucket_colname,
                            bootstrap=bootstrap, n_bootstraps=n_bootstraps,
                            ci_quantiles=ci_quantiles, seed=seed,
                            carry_threshold=carry_threshold)


def estimate_cate_per_quantile(df: DataFrame, n_buckets: int = 30,
                               score_colname: str = "cate_outcome",
                               target_colname: str = "outcome",
                               treatment_colname: str = "treatment",
                               treatment_value=1, control_value=0,
                               bootstrap: bool = False, n_bootstraps: int = 100,
                               ci_quantiles: Sequence[float] | None = None,
                               seed: int = 42) -> pd.DataFrame:
    """CATE per model-score quantile bucket (model calibration view)."""
    b = assign_score_buckets(df, n_buckets, score_colname, "bucket")
    return estimate_cate_per_bucket(
        b, "bucket", target_colname, treatment_colname, treatment_value,
        control_value, bootstrap, n_bootstraps, ci_quantiles, seed,
        carry_threshold=True)


def estimate_iroi_per_bucket(df: DataFrame, bucket_colname: str = "bucket",
                             benefit_colname: str = "revenue",
                             cost_colname: str = "cost",
                             treatment_colname: str = "treatment",
                             treatment_value=1, control_value=0,
                             bootstrap: bool = False, n_bootstraps: int = 100,
                             ci_quantiles: Sequence[float] | None = None,
                             seed: int = 42,
                             carry_threshold: bool = False) -> pd.DataFrame:
    """Per-bucket incremental ROI over an existing bucket column."""
    return estimate_metrics(df, "iroi", benefit_colname=benefit_colname,
                            cost_colname=cost_colname,
                            treatment_colname=treatment_colname,
                            treatment_value=treatment_value,
                            control_value=control_value,
                            bucket_colname=bucket_colname,
                            bootstrap=bootstrap, n_bootstraps=n_bootstraps,
                            ci_quantiles=ci_quantiles, seed=seed,
                            carry_threshold=carry_threshold)


def estimate_iroi_per_quantile(df: DataFrame, n_buckets: int = 30,
                               score_colname: str = "cate_outcome",
                               benefit_colname: str = "revenue",
                               cost_colname: str = "cost",
                               treatment_colname: str = "treatment",
                               treatment_value=1, control_value=0,
                               bootstrap: bool = False, n_bootstraps: int = 100,
                               ci_quantiles: Sequence[float] | None = None,
                               seed: int = 42) -> pd.DataFrame:
    """iROI per model-score quantile bucket."""
    b = assign_score_buckets(df, n_buckets, score_colname, "bucket")
    return estimate_iroi_per_bucket(
        b, "bucket", benefit_colname, cost_colname, treatment_colname,
        treatment_value, control_value, bootstrap, n_bootstraps,
        ci_quantiles, seed, carry_threshold=True)


def estimate_cate_lift(df: DataFrame, n_buckets: int = 30,
                       score_colname: str = "cate_outcome",
                       target_colname: str = "outcome",
                       treatment_colname: str = "treatment",
                       treatment_value=1, control_value=0,
                       bootstrap: bool = False, n_bootstraps: int = 100,
                       ci_quantiles: Sequence[float] | None = None,
                       seed: int = 42,
                       bucket_colname: str | None = None) -> pd.DataFrame:
    """Cumulative CATE over descending score buckets ('if we target the top
    x% by model score, what uplift do we realize?').  Columns: bucket,
    count, fraction, cum_cate[(_lower/_upper/_std_error)].

    ``bucket_colname`` — use an existing bucket column (higher id = higher
    score) instead of quantile-assigning from ``score_colname``."""
    if bucket_colname is not None:
        b = df.withColumnRenamed(bucket_colname, "bucket") \
            if bucket_colname != "bucket" else df
        if "threshold" in b.columns:
            b = b.drop("threshold")
    else:
        b = assign_score_buckets(df, n_buckets, score_colname, "bucket") \
            .drop("threshold")
    pdf = estimate_metrics(b, "ate", target_colname=target_colname,
                           treatment_colname=treatment_colname,
                           treatment_value=treatment_value,
                           control_value=control_value,
                           bucket_colname="bucket", cumulative=True,
                           bootstrap=bootstrap, n_bootstraps=n_bootstraps,
                           ci_quantiles=ci_quantiles, seed=seed)
    keep = ["bucket", "count", "fraction"] + \
        [c for c in pdf.columns if c.startswith("ate")]
    pdf = pdf[keep].rename(
        columns={c: c.replace("ate", "cum_cate") for c in keep
                 if c.startswith("ate")})
    return pdf.sort_values("bucket", ascending=False).reset_index(drop=True)


def estimate_qini(df: DataFrame, n_buckets: int = 30,
                  score_colname: str = "cate_outcome",
                  treatment_colname: str = "treatment",
                  target_colname: str = "outcome",
                  treatment_value=1, control_value=0,
                  bootstrap: bool = False, n_bootstraps: int = 100,
                  ci_quantiles: Sequence[float] | None = None,
                  seed: int = 42,
                  bucket_colname: str | None = None) -> pd.DataFrame:
    """Qini curve points (cumulative CATE × cumulative fraction per
    descending score bucket), with the (0, 0) anchor row prepended.

    ``bucket_colname`` — use an existing bucket column (higher id = higher
    score) instead of quantile-assigning from ``score_colname``."""
    if bucket_colname is not None:
        b = df.withColumnRenamed(bucket_colname, "bucket") \
            if bucket_colname != "bucket" else df
        if "threshold" not in b.columns:
            b = b.withColumn("threshold", F.lit(float("nan")))
        else:
            # a pre-existing ROW-level threshold column would fracture
            # the (bucket, threshold) grouping below; collapse it to the
            # per-bucket minimum (a no-op for assign_score_buckets-style
            # per-bucket-constant thresholds)
            from pyspark.sql import Window as _W

            b = b.withColumn(
                "threshold", F.min("threshold").over(_W.partitionBy("bucket")))
    else:
        b = assign_score_buckets(df, n_buckets, score_colname, "bucket")
    pdf = _aggregate(b, "ate", target_colname, "", "", treatment_colname,
                     treatment_value, control_value, "bucket",
                     bootstrap, n_bootstraps, seed, carry_threshold=True)
    pdf = _finalize(pdf, "ate", "bucket", cumulative=True)
    pdf["ate"] = pdf["ate"] * pdf["fraction"]
    if bootstrap:
        pdf = _basic_bootstrap_ci(pdf, ["ate"], "bucket",
                                  ci_quantiles or [0.025, 0.975])
    keep = ["bucket", "count", "fraction", "threshold"] + \
        [c for c in pdf.columns if c.startswith("ate")]
    pdf = (pdf[keep].sort_values("bucket", ascending=False)
           .reset_index(drop=True))
    zero = {c: 0.0 for c in pdf.columns}
    zero["threshold"] = np.inf
    zero["bucket"] = np.nan
    return pd.concat([pd.DataFrame(zero, index=[0]), pdf],
                     ignore_index=True)


def estimate_cum_iroi(df: DataFrame, n_buckets: int = 30,
                      score_colname: str = "cate_outcome",
                      benefit_colname: str = "revenue",
                      cost_colname: str = "cost",
                      treatment_colname: str = "treatment",
                      treatment_value=1, control_value=0,
                      bootstrap: bool = False, n_bootstraps: int = 100,
                      ci_quantiles: Sequence[float] | None = None,
                      seed: int = 42,
                      bucket_colname: str | None = None) -> pd.DataFrame:
    """Cumulative iROI over descending score buckets.

    ``bucket_colname`` — use an existing bucket column (higher id = higher
    score) instead of quantile-assigning from ``score_colname``."""
    if bucket_colname is not None:
        b = df.withColumnRenamed(bucket_colname, "bucket") \
            if bucket_colname != "bucket" else df
        if "threshold" not in b.columns:
            b = b.withColumn("threshold", F.lit(float("nan")))
        else:
            # see estimate_qini: defracture row-level thresholds
            from pyspark.sql import Window as _W

            b = b.withColumn(
                "threshold", F.min("threshold").over(_W.partitionBy("bucket")))
    else:
        b = assign_score_buckets(df, n_buckets, score_colname, "bucket")
    pdf = estimate_metrics(b, "iroi", benefit_colname=benefit_colname,
                           cost_colname=cost_colname,
                           treatment_colname=treatment_colname,
                           treatment_value=treatment_value,
                           control_value=control_value,
                           bucket_colname="bucket", cumulative=True,
                           bootstrap=bootstrap, n_bootstraps=n_bootstraps,
                           ci_quantiles=ci_quantiles, seed=seed,
                           carry_threshold=True)
    keep = ["bucket", "count", "fraction", "threshold"] + \
        [c for c in pdf.columns if c.startswith("iroi")]
    return (pdf[keep].sort_values("bucket", ascending=False)
            .reset_index(drop=True))


def compute_auuc(df_qini: pd.DataFrame) -> float:
    """Area under the uplift curve — trapezoid over (fraction, qini·value)
    points of :func:`estimate_qini` output."""
    order = np.argsort(df_qini["fraction"].to_numpy(dtype=float))
    x = df_qini["fraction"].to_numpy(dtype=float)[order]
    y = np.nan_to_num(df_qini["ate"].to_numpy(dtype=float)[order])
    return float(np.trapz(y, x))


def compute_qini_coefficient(df_qini: pd.DataFrame) -> float:
    """AUUC minus the random-targeting straight-line area (the triangle
    between the first and last curve points)."""
    auuc = compute_auuc(df_qini)
    order = np.argsort(df_qini["fraction"].to_numpy(dtype=float))
    x = df_qini["fraction"].to_numpy(dtype=float)[order]
    y = np.nan_to_num(df_qini["ate"].to_numpy(dtype=float)[order])
    random_auc = float(np.trapz([y[0], y[-1]], [x[0], x[-1]]))
    return auuc - random_auc


def estimate_economics(df: DataFrame, target_colname: str = "outcome",
                       benefit_colname: str = "revenue",
                       cost_colname: str = "cost",
                       treatment_colname: str = "treatment",
                       treatment_value=1, control_value=0,
                       bucket_colname: str | None = None,
                       cumulative: bool = False,
                       bootstrap: bool = False, n_bootstraps: int = 100,
                       ci_quantiles: Sequence[float] | None = None,
                       seed: int = 42,
                       carry_threshold: bool = False) -> pd.DataFrame:
    """The combined experiment-economics report: ATE, ROI, iROI and
    target rate (with all their component sums) from ONE aggregation —
    where calling the four estimators separately would scan the data four
    times.  Same bucket/cumulative/bootstrap semantics as
    :func:`estimate_metrics`."""
    return estimate_metrics(df, "all", target_colname=target_colname,
                            benefit_colname=benefit_colname,
                            cost_colname=cost_colname,
                            treatment_colname=treatment_colname,
                            treatment_value=treatment_value,
                            control_value=control_value,
                            bucket_colname=bucket_colname,
                            cumulative=cumulative, bootstrap=bootstrap,
                            n_bootstraps=n_bootstraps,
                            ci_quantiles=ci_quantiles, seed=seed,
                            carry_threshold=carry_threshold)
