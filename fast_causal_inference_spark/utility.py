"""Data-prep / diagnostics utilities (reference ``lib/`` parity).

Parity targets: ``lib/spark_utility.py`` (simulate_randomized_trial :36-115,
get_num_cat_feat :117-169, get_cat_feat_one_hot :171-195,
assemble_into_features :271-344, get_num_smd :466-517, feature_process
:519-600), ``lib/tools.py`` (data_split :197, find_correlation_matrix :489,
regression_string :557, preprocess_na :578, histplot/boxplot :plotting) and
``lib/ml_spark.py`` (ROC_curve :21-70).  Implementations are fresh and
re-shaped for Spark scale:

* ``simulate_randomized_trial`` generates DISTRIBUTED data with
  ``spark.range(n)`` + codegen rand/randn columns (the reference builds a
  driver-side numpy frame — a non-starter past ~10M rows).
* ``get_num_smd`` and ``find_correlation_matrix`` each run ONE aggregation
  over all requested columns (the reference loops one Spark job per
  feature / correlation cell).
* ``roc_curve`` bins scores once and takes cumulative counts over the
  ~n_thresholds-row aggregate (the reference ARRAY JOINs every row against
  1000 thresholds — a ×1000 row amplification).
* Feature assembly uses plain ``array<double>`` columns (house format of
  every operator here), not MLlib vectors.
"""

from __future__ import annotations

import math
import warnings
from typing import Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from fast_causal_inference_spark.functions.features import one_hot_encode

__all__ = [
    "simulate_randomized_trial",
    "get_num_cat_feat",
    "get_cat_feat_one_hot",
    "get_num_smd",
    "feature_process",
    "assemble_into_features",
    "data_split",
    "preprocess_na",
    "find_correlation_matrix",
    "regression_string",
    "roc_curve",
    "hist_data",
    "box_stats",
]


def simulate_randomized_trial(spark: SparkSession, n: int = 1000, p: int = 5,
                              sigma: float = 1.0,
                              binary_outcome: bool = False,
                              add_cost_benefit: bool = False,
                              seed: int = 42) -> DataFrame:
    """Synthetic randomized trial with heterogeneous effects — Setup B of
    Nie & Wager (2018), 'Quasi-Oracle Estimation of Heterogeneous Treatment
    Effects' (the reference's generator, ``lib/spark_utility.py:36-115``).

    Columns: treatment, outcome, propensity, expected_outcome, actual_cate,
    feature_1..feature_p [, benefit, cost].  X_j ~ N(0,1); baseline
    b = max(0, X1+X2+X3) + max(0, X4+X5); e = 0.5; effect
    tau = X1 + log(1+exp(X2)); y = b + (w−0.5)·tau + sigma·eps.
    Generated fully distributed (codegen randn over ``spark.range``)."""
    if p < 5:
        raise ValueError("p must be >= 5 (effect heterogeneity uses X1..X5)")
    df = spark.range(n)
    # WIDE seed spacing: Spark seeds each partition with seed +
    # partitionIndex, so consecutive seeds make feature_{j+1} in
    # partition i the SAME value stream as feature_j in partition i+1
    # (confirmed: randn(43) in partition 0 == randn(42) in partition 1)
    feats = [F.randn(seed + j * (1 << 20)).alias(f"feature_{j + 1}")
             for j in range(p)]
    df = df.select("id", *feats)
    x = [F.col(f"feature_{j + 1}") for j in range(p)]
    b = (F.greatest(F.lit(0.0), x[0] + x[1] + x[2])
         + F.greatest(F.lit(0.0), x[3] + x[4]))
    tau = x[0] + F.log1p(F.exp(x[1]))
    w = (F.rand(seed + p * (1 << 20)) < 0.5).cast("int")
    df = (df.withColumn("expected_outcome", b)
            .withColumn("actual_cate", tau)
            .withColumn("propensity", F.lit(0.5))
            .withColumn("treatment", w))
    eps1 = F.randn(seed + (p + 1) * (1 << 20)) * sigma
    if binary_outcome:
        # potential outcomes through a logistic link, observed per arm.
        # NB reference parity: actual_cate here is sig(y1)−sig(y0) on the
        # NOISE-REALIZED latents (the reference's definition) — an
        # individual treatment effect, not the noise-integrated CATE the
        # continuous branch's tau column carries.  Evaluate calibration
        # against bucket means, not per-row values.
        eps0 = F.randn(seed + (p + 2) * (1 << 20)) * sigma
        y1 = b + 0.5 * tau + eps1
        y0 = b - 0.5 * tau + eps0
        sig = lambda c: F.lit(1.0) / (F.lit(1.0) + F.exp(-c))
        df = (df.withColumn("__y1", (sig(y1) > 0.5).cast("int"))
                .withColumn("__y0", (sig(y0) > 0.5).cast("int"))
                .withColumn("outcome",
                            F.when(F.col("treatment") == 1, F.col("__y1"))
                            .otherwise(F.col("__y0")).cast("double"))
                .withColumn("actual_cate", sig(y1) - sig(y0))
                .drop("__y1", "__y0"))
    else:
        df = df.withColumn(
            "outcome", b + (w.cast("double") - 0.5) * tau + eps1)
    if add_cost_benefit:
        # Gamma(3, 1) = sum of three Exp(1) draws — codegen-only, no UDF
        g = -(F.log(F.rand(seed + (p + 3) * (1 << 20)))
              + F.log(F.rand(seed + (p + 4) * (1 << 20)))
              + F.log(F.rand(seed + (p + 5) * (1 << 20))))
        df = (df.withColumn("benefit",
                            F.when(F.col("outcome") == 0, 0.0).otherwise(g))
                .withColumn("cost",
                            F.when(F.col("treatment") == 0, 0.0)
                            .otherwise(F.col("benefit") * 0.25)))
    front = ["treatment", "outcome", "propensity", "expected_outcome",
             "actual_cate"]
    rest = [c for c in df.columns if c not in front + ["id"]]
    return df.select(*front, *rest)


_NUMERIC_PREFIXES = ("big", "dec", "double", "int", "float", "small", "tiny")


def get_num_cat_feat(df: DataFrame,
                     exclude_list: Sequence[str] = ()) -> tuple[list[str], list[str]]:
    """Split columns into (numeric, categorical-string) feature lists,
    skipping timestamps/dates and ``exclude_list`` — reference
    ``get_num_cat_feat`` semantics, warnings instead of prints."""
    exclude = set(exclude_list)
    ts = {c for c, t in df.dtypes if t.lower().startswith(("time", "date"))}
    strings = [c for c, t in df.dtypes
               if t.lower().startswith("string") and c not in exclude | ts]
    numerics = [c for c, t in df.dtypes
                if t.lower().startswith(_NUMERIC_PREFIXES)
                and c not in exclude | ts]
    covered = ts | exclude | set(strings) | set(numerics)
    missed = [c for c in df.columns if c not in covered]
    if missed:
        warnings.warn(f"columns not categorized (unsupported dtypes): {missed}",
                      stacklevel=2)
    return numerics, strings


def get_cat_feat_one_hot(df: DataFrame, cat_cols: Sequence[str],
                         num: int = 30) -> list[str]:
    """Categorical columns with cardinality ≤ ``num`` (one-hot candidates).
    ONE aggregation computes every distinct count (the reference runs one
    ``.distinct().count()`` job per column)."""
    if not cat_cols:
        return []
    counts = df.agg(*[F.countDistinct(c).alias(c) for c in cat_cols]) \
               .collect()[0].asDict()
    return [c for c in cat_cols if counts[c] <= num]


def get_num_smd(matched_df: DataFrame, treatment: str,
                num_fea_list: Sequence[str]) -> pd.DataFrame:
    """Standardized mean difference per numeric feature between arms:
    smd = (mean₁ − mean₀) / √(½(var₁ + var₀)), values rounded to 4 like the
    reference.  ONE groupBy(treatment) aggregation covers every feature
    (the reference unions one job per feature)."""
    aggs = []
    for c in num_fea_list:
        aggs += [F.round(F.mean(c), 4).alias(f"__m_{c}"),
                 F.round(F.variance(c), 4).alias(f"__v_{c}")]
    pdf = (matched_df.groupBy(F.col(treatment).cast("double").alias("__t"))
           .agg(*aggs).toPandas().set_index("__t"))
    missing = {1.0, 0.0} - set(pdf.index)
    if missing:
        raise ValueError(
            f"get_num_smd: treatment column {treatment!r} has no rows for "
            f"arm(s) {sorted(missing)}; arms present: "
            f"{sorted(pdf.index.tolist())} (expected 0/1 coding)")
    rows = []

    def _f(v):
        # a single-row arm has NULL variance, an all-NULL feature a NULL
        # mean — both arrive as None and would TypeError in the
        # arithmetic below; smd is honestly undefined there
        return float("nan") if v is None else float(v)

    for c in num_fea_list:
        m1, m0 = _f(pdf.loc[1.0, f"__m_{c}"]), _f(pdf.loc[0.0, f"__m_{c}"])
        v1, v0 = _f(pdf.loc[1.0, f"__v_{c}"]), _f(pdf.loc[0.0, f"__v_{c}"])
        half = 0.5 * (v1 + v0)
        denom = math.sqrt(half) if half == half and half >= 0 else float("nan")
        rows.append((c, round((m1 - m0) / denom, 4) if denom else float("nan")))
    return pd.DataFrame(rows, columns=["variable", "smd"])


def assemble_into_features(df: DataFrame, num_cols: Sequence[str],
                           cat_cols: Sequence[str] = (),
                           output_col: str = "features",
                           max_categories: int = 30) -> tuple[DataFrame, list[str]]:
    """One-hot the categorical columns and pack everything into ONE
    ``array<double>`` feature column (house vector format; the reference
    assembles an MLlib vector).  Returns (df, assembled_input_names)."""
    out = df
    names: list[str] = list(num_cols)
    if cat_cols:
        before = set(out.columns)
        out = one_hot_encode(out, list(cat_cols), max_categories=max_categories)
        names += [c for c in out.columns if c not in before]
    out = out.withColumn(
        output_col,
        F.array(*[F.coalesce(F.col(c).cast("double"), F.lit(0.0))
                  for c in names]))
    return out, names


def feature_process(df: DataFrame, label: str,
                    exclude_list: Sequence[str] = (),
                    scale_method: str = "minmax",
                    one_hot_enc: bool = False,
                    one_hot_threshold: int = 30) -> DataFrame:
    """End-to-end model-ready frame: dtype split, double-cast, NA fill,
    optional cardinality-capped one-hot, min-max scaling of numerics, and
    a packed ``features`` array column — reference ``feature_process``
    semantics with ONE min/max aggregation for every numeric column."""
    numerics, strings = get_num_cat_feat(df, exclude_list)
    if label not in numerics:
        raise ValueError("label must be a numeric column")
    numerics = [c for c in numerics if c != label]
    for c in numerics:
        df = df.withColumn(c, F.col(c).cast("double"))
    df = df.na.fill(0.0, subset=numerics).na.fill("NA", subset=strings)
    cat_cols: list[str] = []
    if one_hot_enc:
        cat_cols = get_cat_feat_one_hot(df, strings, one_hot_threshold)
    if scale_method == "minmax" and numerics:
        mm = df.agg(*[F.min(c).alias(f"__lo_{c}") for c in numerics],
                    *[F.max(c).alias(f"__hi_{c}") for c in numerics]) \
               .collect()[0].asDict()
        for c in numerics:
            lo, hi = mm[f"__lo_{c}"], mm[f"__hi_{c}"]
            if lo is None or hi is None:    # empty frame: nothing to scale
                continue
            span = (hi - lo) or 1.0
            df = df.withColumn(c, (F.col(c) - F.lit(lo)) / F.lit(span))
    elif scale_method not in ("minmax", None, "none"):
        raise ValueError(f"unknown scale_method {scale_method!r}")
    out, _ = assemble_into_features(df, numerics, cat_cols,
                                    max_categories=one_hot_threshold)
    return out


def data_split(df: DataFrame, test_size: float = 0.5,
               seed: int = 42) -> tuple[DataFrame, DataFrame]:
    """Train/test split — reference ``lib/tools.py:197`` (rand threshold)
    via native ``randomSplit``."""
    train, test = df.randomSplit([1.0 - test_size, test_size], seed=seed)
    return train, test


def preprocess_na(df: DataFrame, str_replace: str = "-1",
                  numeric_replace: float = 0) -> DataFrame:
    """Fill NA: strings → ``str_replace``, numerics → ``numeric_replace``
    (reference ``lib/tools.py:578``)."""
    strings = [c for c, t in df.dtypes if t == "string"]
    numerics = [c for c, t in df.dtypes
                if t.lower().startswith(_NUMERIC_PREFIXES)]
    if strings:
        df = df.na.fill(str_replace, subset=strings)
    if numerics:
        df = df.na.fill(numeric_replace, subset=numerics)
    return df


def find_correlation_matrix(df: DataFrame,
                            cov_list: Sequence[str]) -> np.ndarray:
    """Pearson correlation matrix over ``cov_list`` — ONE aggregation of
    all n(n−1)/2 ``corr`` pairs (the reference also batches into one SQL
    select).  Deviation from the reference: the diagonal is 1.0 (the
    reference leaves it 0)."""
    n = len(cov_list)
    aggs = [F.corr(cov_list[i], cov_list[j]).alias(f"c_{i}_{j}")
            for i in range(n) for j in range(i + 1, n)]
    mat = np.eye(n)
    if aggs:
        row = df.agg(*aggs).collect()[0].asDict()
        for i in range(n):
            for j in range(i + 1, n):
                v = row[f"c_{i}_{j}"]
                mat[i, j] = mat[j, i] = float("nan") if v is None else v
    return mat


def regression_string(Y: str, X: Sequence[str]) -> str:
    """Formula helper ``'y~x1+x2'`` accepted by :func:`ols` (the reference
    emits the comma form its gateway grammar uses)."""
    return Y + "~" + "+".join(X)


def _roc_binned_counts(df: DataFrame, label: str, score: str,
                       thresholds: list[float]) -> DataFrame:
    """The single binned aggregation behind :func:`roc_curve` — factored
    so plan tests assert the REAL query shape (one map-side-combined
    groupBy, no threshold cross join).  Rows with NULL/NaN scores get a
    NULL bucket and are excluded from the curve (they cannot be
    ranked)."""
    from fast_causal_inference_spark.functions.features import (
        bucket_by_edges,
    )

    # bucket b = number of thresholds <= score: a balanced WHEN tree up
    # to 128 thresholds, an Arrow-batched searchsorted above (the
    # default 1000 takes the UDF path — a 1000-node CASE blows Janino's
    # method-size limit)
    bucket = bucket_by_edges(F.col(score), thresholds)
    lab = F.col(label).cast("double")
    return (df.withColumn("__b", bucket)
            .groupBy("__b")
            .agg(F.sum(F.when(lab == 1, 1).otherwise(0)).alias("pos"),
                 F.sum(F.when(lab == 0, 1).otherwise(0)).alias("neg")))


def roc_curve(df: DataFrame, label: str, score: str,
              n_thresholds: int = 1000,
              thresholds: Sequence[float] | None = None) -> pd.DataFrame:
    """ROC curve points (threshold, fpr, tpr) — reference
    ``lib/ml_spark.ROC_curve`` semantics (TPR/FPR at score-quantile
    thresholds, prediction positive when score ≥ threshold).

    Scale shape: thresholds from one quantile sketch; each row is assigned
    its threshold bucket in codegen; ONE groupBy over ≤ n_thresholds cells;
    cumulative TP/FP via suffix sums on the driver-sized aggregate — the
    data is scanned once (the reference explodes every row × 1000
    thresholds).  Pass ``thresholds`` explicitly to pin the operating
    points (otherwise they come from the quantile sketch)."""
    if thresholds is None:
        probs = [i / n_thresholds for i in range(n_thresholds + 1)]
        thresholds = df.approxQuantile(score, probs, 1e-4)
    thresholds = sorted(set(float(t) for t in thresholds))
    agg = (_roc_binned_counts(df, label, score, thresholds)
           .toPandas().set_index("__b").sort_index())
    full = agg.reindex(range(len(thresholds) + 1), fill_value=0)
    p_tot, n_tot = full.pos.sum(), full.neg.sum()
    # rows with bucket >= b have score >= thresholds[b-1]
    tp = full.pos[::-1].cumsum()[::-1]
    fp = full.neg[::-1].cumsum()[::-1]
    out = pd.DataFrame({
        "threshold": thresholds,
        "tp": tp.iloc[1:].to_numpy(dtype=float),
        "fp": fp.iloc[1:].to_numpy(dtype=float),
    })
    out["fn"] = p_tot - out.tp
    out["tn"] = n_tot - out.fp
    out["tpr"] = out.tp / p_tot if p_tot else float("nan")
    out["fpr"] = out.fp / n_tot if n_tot else float("nan")
    return out[["threshold", "fpr", "tpr", "tp", "fp", "tn", "fn"]]


def hist_data(df: DataFrame, col: str, bins: int = 50,
              lo: float | None = None,
              hi: float | None = None) -> pd.DataFrame:
    """Histogram-ready binned counts (plot-free stand-in for the
    reference's matplotlib ``histplot``): ONE agg for the range (unless
    given), one width_bucket groupBy."""
    explicit_hi = hi is not None
    # NaN is not NULL: Spark sorts NaN ABOVE every value, so an
    # auto-computed hi on a NaN-bearing column becomes NaN and every bin
    # edge with it — exclude NaN like NULL (it cannot be binned either)
    finite = (F.col(col).isNotNull()
              & ~F.isnan(F.col(col).cast("double")))
    if lo is None or hi is None:
        r = (df.where(finite)
             .agg(F.min(col).alias("lo"), F.max(col).alias("hi"))
             .collect()[0])
        lo = r["lo"] if lo is None else lo
        hi = r["hi"] if hi is None else hi
    if lo is None or hi is None:            # empty / all-NULL column
        return pd.DataFrame({"bin": [], "left": [], "right": [],
                             "count": []})
    if hi < lo:
        # an explicit bound on the wrong side of the data: width_bucket
        # would silently build a DESCENDING bucket range and the edge
        # arithmetic below a negative-width histogram
        raise ValueError(f"hist_data: hi ({hi}) < lo ({lo})")
    if lo == hi:
        hi = lo + 1.0
    c = F.col(col)
    # width_bucket assigns values == hi to bucket bins+1; fold ONLY the
    # boundary value into the last bin (right-closed like numpy).  With
    # an EXPLICIT hi, values strictly above it are out of range and must
    # be dropped, not folded into the top bin
    bucket = F.width_bucket(c, F.lit(float(lo)), F.lit(float(hi)),
                            F.lit(bins))
    bucket = F.when(c == F.lit(float(hi)), F.lit(bins)).otherwise(bucket)
    work = df.where(finite & (c >= F.lit(float(lo))))
    if explicit_hi:
        work = work.where(c <= F.lit(float(hi)))
    agg = (work.groupBy(bucket.alias("bin"))
           .agg(F.count(F.lit(1)).alias("count"))
           .toPandas().set_index("bin").sort_index())
    width = (hi - lo) / bins
    idx = range(1, bins + 1)
    counts = agg["count"].reindex(idx, fill_value=0)
    return pd.DataFrame({
        "bin": list(idx),
        "left": [lo + (i - 1) * width for i in idx],
        "right": [lo + i * width for i in idx],
        "count": counts.to_numpy(),
    })


def box_stats(df: DataFrame, cols: Sequence[str],
              relative_error: float = 1e-4) -> pd.DataFrame:
    """Boxplot-ready five-number summaries + IQR whiskers for many columns
    from ONE multi-column quantile sketch pass."""
    qs = df.approxQuantile(list(cols), [0.0, 0.25, 0.5, 0.75, 1.0],
                           relative_error)
    rows = []
    nan = float("nan")
    for c, q in zip(cols, qs):
        if len(q) < 5:                      # all-NULL column: empty sketch
            rows.append((c, nan, nan, nan, nan, nan, nan, nan))
            continue
        mn, q1, med, q3, mx = q
        iqr = q3 - q1
        rows.append((c, mn, q1, med, q3, mx,
                     max(mn, q1 - 1.5 * iqr), min(mx, q3 + 1.5 * iqr)))
    return pd.DataFrame(rows, columns=["column", "min", "q1", "median", "q3",
                                       "max", "whisker_lo", "whisker_hi"])
