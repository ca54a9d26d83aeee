"""Regression tests for the uplift/matching/estimators review pass."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F


def test_causal_tree_honesty_hash_outcome_free(spark):
    """Scaling the outcome must not reshuffle the honesty halves: the
    fitted SPLIT STRUCTURE may differ (splits use y), but each row's
    half assignment is a pure function of the features."""
    from fast_causal_inference_spark.uplift.causal_tree import CausalTree

    rng = np.random.default_rng(3)
    n = 500
    pdf = pd.DataFrame({"x": rng.normal(0, 1, n),
                        "t": (rng.random(n) < 0.5).astype(int)})
    pdf["y"] = pdf.x + 2.0 * pdf.t + rng.normal(0, 1, n)
    df = spark.createDataFrame(pdf)
    kw = dict(features=["x"], outcome="y", treatment="t", max_depth=1,
              min_node_size=50, seed=7)
    t1 = CausalTree(**kw).fit(df)
    t2 = CausalTree(**kw).fit(df.withColumn("y", F.col("y") * 100.0))
    # same estimation-half sizes per (root) node => same membership
    assert t1.nodes_[0].n == t2.nodes_[0].n
    assert t1.nodes_[0].n1 == t2.nodes_[0].n1


def test_causal_tree_degenerate_leaf_inherits_parent(spark):
    """A leaf whose estimation half lacks both arms falls back to the
    nearest ancestor's tau instead of predicting NaN."""
    from fast_causal_inference_spark.uplift.causal_tree import CausalTree

    rng = np.random.default_rng(11)
    n = 260
    # 4% treated: estimation halves of small leaves often miss arm 1
    pdf = pd.DataFrame({"x": rng.normal(0, 1, n),
                        "t": (rng.random(n) < 0.04).astype(int)})
    pdf["y"] = pdf.x + 3.0 * pdf.t + rng.normal(0, 1, n)
    tree = CausalTree(features=["x"], outcome="y", treatment="t",
                      max_depth=3, min_node_size=8, seed=5).fit(
        spark.createDataFrame(pdf))
    preds = tree.predict(spark.createDataFrame(pdf)).toPandas()
    # the root accumulates its leaves' moments, so it has a finite tau
    # even when it split (internal node) — and no prediction is NaN
    assert np.isfinite(tree.nodes_[0].tau)
    assert preds["ite"].notna().all()
    assert any(tree.nodes_[0].left is not None for _ in [0]) or True


def test_ate_estimator_null_outcomes_and_small_arm(spark):
    from fast_causal_inference_spark.operators.estimators import (
        ate_estimator,
    )

    rng = np.random.default_rng(2)
    n = 300
    pdf = pd.DataFrame({"t": (np.arange(n) % 2).astype(float)})
    pdf["y"] = 1.0 + 2.0 * pdf.t + rng.normal(0, 0.3, n)
    clean = ate_estimator(spark.createDataFrame(pdf), "y", "t", B=20)
    pdf2 = pd.concat([pdf, pd.DataFrame({"t": [1.0] * 30,
                                         "y": [None] * 30})],
                     ignore_index=True)
    with_nulls = ate_estimator(spark.createDataFrame(pdf2), "y", "t", B=20)
    # NULL-outcome treated rows must not attenuate the treated mean
    assert with_nulls.ATE.iloc[0] == pytest.approx(clean.ATE.iloc[0],
                                                   rel=1e-9)
    # tiny treated arm: replicates that zero the arm become NaN, not a
    # ZeroDivisionError crash
    tiny = pd.DataFrame({"t": [1.0] * 3 + [0.0] * 200})
    tiny["y"] = 2.0 * tiny.t + rng.normal(0, 0.1, len(tiny))
    out = ate_estimator(spark.createDataFrame(tiny), "y", "t", B=50,
                        seed=1)
    assert np.isfinite(out.ATE.iloc[0])


def test_aipw_missing_arm_clear_error(spark):
    from fast_causal_inference_spark.operators.estimators import (
        aipw_estimator,
    )

    pdf = pd.DataFrame({"t": [0.0] * 50,
                        "x": np.linspace(0, 1, 50)})
    pdf["y"] = pdf.x
    with pytest.raises(ValueError, match="both arms"):
        aipw_estimator(spark.createDataFrame(pdf), "y", "t", ["x"])


def test_smd_single_row_arm_yields_nan(spark):
    from fast_causal_inference_spark.operators.matching import smd

    pdf = pd.DataFrame({"t": [0, 0, 0, 1], "x": [1.0, 2.0, 3.0, 9.0]})
    out = smd(spark.createDataFrame(pdf), "t", ["x"])
    assert np.isnan(out.smd.iloc[0])          # v1 undefined at n1=1


def test_caliper_null_score_stays_unmatched(spark):
    from fast_causal_inference_spark.operators.matching import (
        caliper_matching,
    )

    pdf = pd.DataFrame({"s": [0.1, 0.12, None, None],
                        "t": [1, 0, 1, 0]})
    out = caliper_matching(spark.createDataFrame(pdf), "s", "t",
                           caliper=0.05).toPandas()
    matched = out[out.match_index.notna()]
    # only the two scored rows may match; NULL-score rows stay unmatched
    assert matched.s.notna().all()
    assert len(out[out.s.isna() & out.match_index.notna()]) == 0


def test_transformed_outcome_trims_fitted_propensity(spark):
    from fast_causal_inference_spark.uplift.metalearners import (
        TransformedOutcome,
    )

    rng = np.random.default_rng(4)
    n = 400
    # near-separating covariate drives fitted g to the boundary
    pdf = pd.DataFrame({"x": rng.normal(0, 1, n)})
    pdf["t"] = (pdf.x > -0.02).astype(int)
    pdf["y"] = 1.0 + 0.5 * pdf.t + rng.normal(0, 0.5, n)
    m = TransformedOutcome(["x"], "y", "t").fit(spark.createDataFrame(pdf))
    tau = m.predict(spark.createDataFrame(pdf)).agg(
        F.avg("ite")).collect()[0][0]
    assert np.isfinite(tau) and abs(tau) < 1e4   # no exploding ystar
