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


def test_wls_df_resid_complete_case(spark):
    """NULL-y rows must not inflate a weighted fit's residual df (they
    contribute nothing to the Gramian): stderr with nulls == stderr on
    the complete-case frame."""
    from fast_causal_inference_spark.operators.ols import wls

    rng = np.random.default_rng(8)
    n = 200
    pdf = pd.DataFrame({"x": rng.normal(0, 1, n),
                        "w": rng.uniform(0.5, 2.0, n)})
    pdf["y"] = 1.0 + 2.0 * pdf.x + rng.normal(0, 1, n)
    pdf2 = pd.concat([pdf, pd.DataFrame({"x": rng.normal(0, 1, n),
                                         "w": np.ones(n),
                                         "y": [None] * n})],
                     ignore_index=True)
    m_clean = wls(spark.createDataFrame(pdf), "y ~ x", weight="w")
    m_nulls = wls(spark.createDataFrame(pdf2), "y ~ x", weight="w")
    assert m_nulls.stderr[1] == pytest.approx(m_clean.stderr[1], rel=1e-12)
    assert m_nulls.n == m_clean.n


def test_iv_complete_case_and_paren_instruments(spark):
    from fast_causal_inference_spark.operators.ols import iv_regression

    rng = np.random.default_rng(12)
    n = 400
    pdf = pd.DataFrame({"z1": rng.normal(0, 1, n),
                        "z2": rng.normal(0, 1, n)})
    pdf["t"] = 0.8 * pdf.z1 + 0.3 * pdf.z2 + rng.normal(0, 0.5, n)
    pdf["y"] = 2.0 * pdf.t + rng.normal(0, 1, n)
    # instrument expression containing '+' inside a function call
    m = iv_regression(spark.createDataFrame(pdf),
                      "y ~ (t ~ pow(z1+z2, 1) + z2)")
    assert m.beta[m.names.index("t")] == pytest.approx(2.0, abs=0.3)
    # NULL y rows: coefficients must match the complete-case frame
    pdf2 = pd.concat([pdf, pd.DataFrame({"z1": [0.0] * 50,
                                         "z2": [0.0] * 50,
                                         "t": [0.0] * 50,
                                         "y": [None] * 50})],
                     ignore_index=True)
    m2 = iv_regression(spark.createDataFrame(pdf2), "y ~ (t ~ z1 + z2)")
    m1 = iv_regression(spark.createDataFrame(pdf), "y ~ (t ~ z1 + z2)")
    assert m2.beta[1] == pytest.approx(m1.beta[1], rel=1e-12)
    assert m2.stderr[1] == pytest.approx(m1.stderr[1], rel=1e-12)


def test_cluster_robust_df_survives_json(spark):
    from fast_causal_inference_spark.operators.ols import (
        OlsModel,
        cluster_robust_ols,
    )

    rng = np.random.default_rng(6)
    n = 300
    pdf = pd.DataFrame({"g": np.arange(n) % 12,
                        "x": rng.normal(0, 1, n)})
    pdf["y"] = 1.0 + pdf.x + rng.normal(0, 1, n)
    m = cluster_robust_ols(spark.createDataFrame(pdf), "y ~ x", "g")
    back = OlsModel.from_json(m.to_json())
    assert back.df_override == m.df_override == 11.0
    assert np.allclose(back.p_values, m.p_values)
