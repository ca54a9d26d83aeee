"""Regression tests for the statistical-core review pass (dml / xexpt /
causal_forest)."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F


def _arm_df(spark, n=400, seed=0):
    rng = np.random.default_rng(seed)
    pdf = pd.DataFrame({"x1": rng.normal(0, 1, n),
                        "x2": rng.normal(0, 1, n),
                        "u": np.arange(n)})
    pdf["t"] = (rng.random(n) < 0.5).astype(int)
    pdf["y"] = 1.0 + pdf.x1 + 2.0 * pdf.t + rng.normal(0, 1, n)
    return spark.createDataFrame(pdf)


def test_xexpt_covariate_with_plus_inside_parens(spark):
    """X='avg(x1+x2)/avg(d)' must parse as ONE covariate, not shred at
    the inner '+'."""
    from fast_causal_inference_spark.operators.xexpt import (
        xexpt_ttest_2samp,
    )

    df = _arm_df(spark).withColumn("d", F.lit(1.0)) \
        .withColumn("num", F.col("y"))
    out = xexpt_ttest_2samp(df, "num", "d", "t", "u",
                            X="avg(x1+x2)/avg(d)")
    assert len(out) == 1 and np.isfinite(out.iloc[0]["diff_relative"] if
                                         "diff_relative" in out.columns
                                         else out.iloc[0, 2])


def test_xexpt_null_arm_raises_not_nan(spark):
    """A NULL-valued index must be excluded from arm discovery and the
    call must fail loudly when only one real arm remains."""
    from fast_causal_inference_spark.operators.xexpt import (
        xexpt_ttest_2samp,
    )

    df = _arm_df(spark).withColumn(
        "t2", F.when(F.col("t") == 1, F.lit(None)).otherwise(F.lit("a"))) \
        .withColumn("d", F.lit(1.0))
    with pytest.raises(ValueError, match="non-NULL"):
        xexpt_ttest_2samp(df, "y", "d", "t2", "u")


def test_nonparam_dml_requires_controls(spark):
    from fast_causal_inference_spark.operators.dml import non_param_dml

    with pytest.raises(ValueError, match="control covariate"):
        non_param_dml(_arm_df(spark), "y", "t", X=[])


def test_nonparam_dml_unidentified_raises(spark):
    """Controls that predict T perfectly leave no usable rows — a clear
    error, not TypeError(None/None)."""
    from fast_causal_inference_spark.operators.dml import non_param_dml

    df = _arm_df(spark).withColumn("tx", F.col("t").cast("double"))
    # fold on the row id so the earlier fold-population guard passes and
    # the degenerate case reaches the final-stage moment
    with pytest.raises(ValueError, match="unidentified|no usable rows"):
        non_param_dml(df, "y", "t", X=["tx"], fold_expr="u")


def test_nonparam_dml_single_scan_sandwich_value(spark):
    """The fused one-scan sandwich SE equals the two-scan expansion."""
    from fast_causal_inference_spark.operators.dml import non_param_dml

    df = _arm_df(spark, seed=3)
    res = non_param_dml(df, "y", "t", X=["x1"])
    # recompute from collected residual columns
    from fast_causal_inference_spark.operators.dml import (
        _dml_residuals,
        _fold_column,
    )

    w = _fold_column(df, 3, "__fold", 42, None, hash_cols=["x1"])
    w = _dml_residuals(w, "y", "t", ["x1"], 3, "__fold").toPandas()
    w = w[np.abs(w.__res_t) > 1e-12]
    wt = w.__res_t ** 2
    r = w.__res_y / w.__res_t
    theta = float((wt * r).sum() / wt.sum())
    se = float(np.sqrt(((wt * (r - theta)) ** 2).sum()) / wt.sum())
    assert res.theta[0] == pytest.approx(theta, rel=1e-10)
    assert res.stderr[0] == pytest.approx(se, rel=1e-10)


def test_linear_dml_grouped_nan_group_key(spark):
    """One NaN-keyed segment must come back as ONE row, not fragment or
    vanish."""
    from fast_causal_inference_spark.operators.dml import linear_dml_grouped

    rng = np.random.default_rng(9)
    n = 900
    pdf = pd.DataFrame({"x1": rng.normal(0, 1, n),
                        "g": np.where(np.arange(n) % 3 == 0,
                                      np.nan, np.arange(n) % 3 * 1.0)})
    pdf["t"] = (rng.random(n) < 0.5).astype(int)
    pdf["y"] = 1.0 + pdf.x1 + 2.0 * pdf.t + rng.normal(0, 1, n)
    out = linear_dml_grouped(spark.createDataFrame(pdf), "y", "t",
                             X=["x1"], group_cols=["g"])
    nan_rows = out[out.g.isna()]
    assert len(nan_rows) == 1
    assert np.isfinite(nan_rows.theta.iloc[0])
    assert nan_rows.theta.iloc[0] == pytest.approx(2.0, abs=0.6)


def test_causal_forest_rejects_non_binary_treatment(spark):
    from fast_causal_inference_spark.uplift.causal_forest import (
        CausalForest,
    )

    df = _arm_df(spark).withColumn("t12", F.col("t") + 1)  # coded 1/2
    cf = CausalForest(features=["x1", "x2"], outcome="y",
                      treatment="t12", num_trees=2, max_depth=2,
                      ci_group_size=1)
    with pytest.raises(ValueError, match="both arms"):
        cf.fit(df)


def test_causal_forest_hash_is_outcome_free(spark):
    """Two frames differing ONLY in outcome values must produce the
    same subsample/half assignment (same __h), i.e. fitted structure
    responds to y only through the moments, not through membership."""
    from fast_causal_inference_spark.uplift.causal_forest import (
        CausalForest,
    )

    df = _arm_df(spark, seed=5)
    kw = dict(features=["x1", "x2"], outcome="y", treatment="t",
              num_trees=2, max_depth=1, ci_group_size=1, seed=11)
    cf1 = CausalForest(**kw).fit(df)
    cf2 = CausalForest(**kw).fit(df.withColumn("y", F.col("y") * 0 + 1.0))
    # same membership -> same per-node counts at the root split search;
    # compare the split FEATURE choice domain: both fits drew identical
    # feature subsets (seeded) and identical row halves, so the split
    # threshold grids coincide
    for t in range(2):
        assert cf1.trees_[t][0].feats == cf2.trees_[t][0].feats


def test_kaplan_meier_ignores_null_times_keeps_null_group(spark):
    from fast_causal_inference_spark.operators.survival import kaplan_meier

    pdf = pd.DataFrame({"t": [1.0, 2.0, None, 3.0, 1.0, 2.0],
                        "e": [1, 1, 1, 0, 1, 1],
                        "g": ["a", "a", "a", None, None, None]})
    km = kaplan_meier(spark.createDataFrame(pdf), "t", "e", group="g")
    # the NULL-time row is excluded: group 'a' has 2 subjects, both events
    a = km[km.g == "a"].sort_values("time")
    assert list(a.n_risk) == [2.0, 1.0]
    assert a.survival.iloc[-1] == pytest.approx(0.0)
    # the NULL group is ITS OWN stratum, not dropped
    assert km.g.isna().any()


def test_welch_ttest_degenerate_arm_yields_nan_not_crash(spark):
    from fast_causal_inference_spark.operators.ttest import welch_ttest

    pdf = pd.DataFrame({"y": [1.0, 2.0, 3.0, 9.0], "t": [0, 0, 0, 1]})
    out = welch_ttest(spark.createDataFrame(pdf), "y", "t")
    r = out.toPandas().iloc[0] if hasattr(out, "toPandas") else out.iloc[0]
    assert r["n1"] == 1 and np.isnan(r["stderr"]) and np.isnan(r["p_value"])


def test_permutation_infinite_replicas_filtered(spark):
    """A ratio metric with a zero-denominator replica arm must not leak
    inf into the permutation distribution."""
    from fast_causal_inference_spark.operators.resample import permutation

    # two nonzero denominators over a 2-2 split: permutations that put
    # both in one arm make the other arm's avg(den)=0 -> inf replica,
    # the rest are valid — the inf ones must be filtered, not pollute
    pdf = pd.DataFrame({"num": [1.0, 2.0, 3.0, 4.0],
                        "den": [1.0, 1.0, 0.0, 0.0],
                        "t": [0, 0, 1, 1]})
    out = permutation(spark.createDataFrame(pdf), "avg(num)/avg(den)",
                      "t", permutation_num=12, seed=3)
    r = out.iloc[0]
    # finite replicas exist AND the summary stats are finite — inf
    # replicas were filtered rather than averaged in
    assert r["n_permutations"] >= 1
    assert np.isfinite(r["perm_mean"])


def test_cox_ph_converged_attr(spark):
    from fast_causal_inference_spark.operators.survival import cox_ph

    rng = np.random.default_rng(2)
    n = 300
    pdf = pd.DataFrame({"x": rng.normal(0, 1, n)})
    pdf["t"] = np.round(rng.exponential(np.exp(-0.5 * pdf.x)), 1) + 0.1
    pdf["e"] = (rng.random(n) < 0.8).astype(int)
    out = cox_ph(spark.createDataFrame(pdf), "t", "e", ["x"])
    assert out.attrs.get("converged") is True


def test_boot_strap_delegates_value_identical(spark):
    """boot_strap(expr) must equal boot_strap_multi([expr]).value_0."""
    from fast_causal_inference_spark.operators.resample import (
        boot_strap,
        boot_strap_multi,
    )

    rng = np.random.default_rng(4)
    df = spark.createDataFrame(pd.DataFrame({"x": rng.normal(0, 1, 500)}))
    a = boot_strap(df, "avg(x)", n_resamples=7, seed=9).toPandas() \
        .sort_values("replica_id").reset_index(drop=True)
    b = boot_strap_multi(df, ["avg(x)"], n_resamples=7, seed=9).toPandas() \
        .sort_values("replica_id").reset_index(drop=True)
    assert np.allclose(a.value.to_numpy(), b.value_0.to_numpy())
