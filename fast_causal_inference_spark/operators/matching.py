"""Propensity-score matching: caliper / exact matching, SMD balance check.

Parity targets (reference under /root/reference): ``match.py:13-226``,
``caliper_matching_info.h:45-337`` + scalar ``caliper_matching.cpp``,
``ExactMatchingParser.java:28-160``.

The reference needs a two-phase UDAF (pair-count info, then a scalar assigning
pair ids). In Spark the whole thing is a window computation over matching
cells: bucket the score by caliper width, count both arms per
(bucket, exact-keys) cell, give every row a random rank within its
(cell, arm), and keep ranks below the cell quota — rank ties the treated row
to its control(s). One shuffle on the cell key; no driver state; works for
any number of cells.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def caliper_matching(df: DataFrame, score: str, index: str,
                     caliper: float = 0.05, exacts: list[str] | None = None,
                     k: int = 1, seed: int = 42,
                     treatment_values: tuple = (0, 1),
                     match_col: str = "match_index") -> DataFrame:
    """1:k caliper matching on a (propensity) score.

    Adds ``match_col``: a pair id shared by a treated row and its k matched
    controls within a caliper bucket (+ exact keys); NULL for unmatched rows.
    """
    if caliper <= 0:
        raise ValueError("caliper must be > 0")
    exacts = list(exacts or [])
    idx = F.col(index) if index.isidentifier() else F.expr(index)
    v0, v1 = treatment_values
    t = F.when(idx == F.lit(v1), 1).when(idx == F.lit(v0), 0)
    bucket = F.floor(F.expr(score).cast("double") / F.lit(float(caliper)))

    out = df.withColumn("__t", t).withColumn("__bucket", bucket)
    cell = ["__bucket", *exacts]
    w_cell = Window.partitionBy(*cell)
    cnt1 = F.sum(F.when(F.col("__t") == 1, 1).otherwise(0)).over(w_cell)
    cnt0 = F.sum(F.when(F.col("__t") == 0, 1).otherwise(0)).over(w_cell)
    quota = F.least(cnt1, F.floor(cnt0 / k))
    w_arm = Window.partitionBy(*cell, "__t").orderBy(F.rand(seed))
    rn = F.row_number().over(w_arm)

    pair_local = (F.when((F.col("__t") == 1) & (rn <= quota), rn)
                  .when((F.col("__t") == 0) & (rn <= quota * k),
                        F.ceil(rn / k).cast("int")))
    # globally-unique, deterministic pair id from the cell key + local rank
    pair_id = F.when(
        pair_local.isNotNull(),
        F.xxhash64(F.concat_ws("\x1f", F.col("__bucket").cast("string"),
                               *[F.col(c).cast("string") for c in exacts],
                               pair_local.cast("string"))))
    return (out.withColumn(match_col, pair_id)
               .drop("__t", "__bucket"))


def exact_matching(df: DataFrame, index: str, exacts: list[str],
                   k: int = 1, seed: int = 42,
                   treatment_values: tuple = (0, 1),
                   match_col: str = "match_index") -> DataFrame:
    """Exact matching on key columns only (reference exactMatching macro)."""
    if not exacts:
        raise ValueError("exact_matching needs at least one key column")
    # a constant pseudo-score puts every row in bucket 0
    const = df.withColumn("__score", F.lit(0.0))
    out = caliper_matching(const, "__score", index, caliper=1.0,
                           exacts=exacts, k=k, seed=seed,
                           treatment_values=treatment_values,
                           match_col=match_col)
    return out.drop("__score")


def smd(df: DataFrame, index: str, cols: list[str],
        treatment_values: tuple = (0, 1)) -> pd.DataFrame:
    """Standardized mean differences (balance table) per covariate
    (reference ``match.py:159-226``): (m1 − m0) / √((v0 + v1)/2)."""
    idx = F.col(index) if index.isidentifier() else F.expr(index)
    v0, v1 = treatment_values
    aggs = []
    for c in cols:
        x = F.expr(c).cast("double")
        for tag, v in (("0", v0), ("1", v1)):
            cond = F.when(idx == F.lit(v), x)
            aggs += [F.avg(cond).alias(f"{c}__m{tag}"),
                     F.var_samp(cond).alias(f"{c}__v{tag}")]
    row = df.agg(*aggs).collect()[0]
    recs = []
    for c in cols:
        m0, m1 = row[f"{c}__m0"], row[f"{c}__m1"]
        vv0, vv1 = row[f"{c}__v0"], row[f"{c}__v1"]
        pooled = np.sqrt((vv0 + vv1) / 2.0) if vv0 is not None else float("nan")
        recs.append({"covariate": c, "mean0": m0, "mean1": m1,
                     "smd": (m1 - m0) / pooled if pooled else float("nan")})
    return pd.DataFrame(recs)


def prognostic_score_matching(df: DataFrame, outcome: str, index: str,
                              covariates: list[str], caliper: float = 0.05,
                              k: int = 1, seed: int = 42,
                              treatment_values: tuple = (0, 1)) -> DataFrame:
    """PSM on a prognostic score: OLS of the outcome fit on CONTROLS only,
    scored on everyone, then caliper matching on the prediction
    (reference ``match.py:299-438``)."""
    from fast_causal_inference_spark.operators.ols import ols

    idx = F.col(index) if index.isidentifier() else F.expr(index)
    v0, _ = treatment_values
    controls = df.where(idx == F.lit(v0))
    model = ols(controls, f"{outcome} ~ {' + '.join(covariates)}")
    scored = df.withColumn("__prognostic", model.predict_column())
    out = caliper_matching(scored, "__prognostic", index, caliper=caliper,
                           k=k, seed=seed, treatment_values=treatment_values)
    return out
