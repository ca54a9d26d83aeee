"""Matching / group_set invariants vs pandas oracles."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from fast_causal_inference_spark.operators.groupset import group_set
from fast_causal_inference_spark.operators.matching import (
    caliper_matching,
    exact_matching,
    prognostic_score_matching,
    smd,
)


def test_caliper_matching_invariants(spark, ab_df):
    matched = caliper_matching(ab_df, "weight", "treatment", caliper=0.1)
    got = matched.where(F.col("match_index").isNotNull()) \
        .groupBy("match_index") \
        .agg(F.sum("treatment").alias("t"), F.count("*").alias("c"),
             F.min(F.floor(F.col("weight") / 0.1)).alias("bmin"),
             F.max(F.floor(F.col("weight") / 0.1)).alias("bmax")).collect()
    assert len(got) > 0
    for r in got:
        assert r["c"] == 2 and r["t"] == 1        # exactly one treated + one control
        assert r["bmin"] == r["bmax"]             # same caliper bucket


def test_caliper_matching_quota(spark, ab_df, ab_pdf):
    matched = caliper_matching(ab_df, "weight", "treatment", caliper=0.1,
                               seed=1).toPandas()
    pdf = ab_pdf.assign(bucket=np.floor(ab_pdf.weight / 0.1))
    for b, cell in pdf.groupby("bucket"):
        quota = min((cell.treatment == 1).sum(), (cell.treatment == 0).sum())
        cellm = matched[np.floor(matched.weight / 0.1) == b]
        assert cellm.match_index.notna().sum() == 2 * quota


def test_caliper_matching_1k(spark, ab_df):
    matched = caliper_matching(ab_df, "weight", "treatment", caliper=0.2, k=2)
    got = matched.where(F.col("match_index").isNotNull()) \
        .groupBy("match_index") \
        .agg(F.sum("treatment").alias("t"), F.count("*").alias("c")).collect()
    for r in got:
        assert r["t"] == 1 and r["c"] == 3        # 1 treated : 2 controls


def test_exact_matching(spark, ab_df):
    df = ab_df.withColumn("cat", (F.col("x3") > 1).cast("int"))
    matched = exact_matching(df, "treatment", ["cat"])
    got = matched.where(F.col("match_index").isNotNull()) \
        .groupBy("match_index") \
        .agg(F.sum("treatment").alias("t"), F.count("*").alias("c"),
             F.countDistinct("cat").alias("k")).collect()
    for r in got:
        assert r["c"] == 2 and r["t"] == 1 and r["k"] == 1


def test_smd(spark, ab_pdf, ab_df):
    out = smd(ab_df, "treatment", ["x1", "y"]).set_index("covariate")
    for c in ("x1", "y"):
        g0 = ab_pdf[ab_pdf.treatment == 0][c]
        g1 = ab_pdf[ab_pdf.treatment == 1][c]
        want = (g1.mean() - g0.mean()) / np.sqrt((g0.var() + g1.var()) / 2)
        assert out.loc[c, "smd"] == pytest.approx(want, rel=1e-9)
    # y has a real treatment effect, x1 doesn't
    assert abs(out.loc["y", "smd"]) > 5 * abs(out.loc["x1", "smd"])


def test_prognostic_matching_runs(spark, ab_df):
    out = prognostic_score_matching(ab_df, "y", "treatment", ["x1", "x2"],
                                    caliper=0.5)
    n_matched = out.where(F.col("match_index").isNotNull()).count()
    assert n_matched > 0 and n_matched % 2 == 0


def test_group_set(spark, ab_pdf, ab_df):
    df = ab_df.withColumn("g1", (F.col("x1") > 0).cast("int")) \
              .withColumn("g2", (F.col("x2") > 0).cast("int"))
    out = group_set(df, "y", "treatment", ["g1", "g2"]).toPandas()
    pdf = ab_pdf.assign(g1=(ab_pdf.x1 > 0).astype(int),
                        g2=(ab_pdf.x2 > 0).astype(int))
    assert len(out) == 8  # 2 cols × 2 values × 2 treatments
    for _, r in out.iterrows():
        cell = pdf[(pdf[r["column"]] == int(r["value"]))
                   & (pdf.treatment == r["treatment"])]
        assert r["cnt"] == len(cell)
        assert r["sum"] == pytest.approx(cell.y.sum(), rel=1e-9)
        assert r["sum2"] == pytest.approx((cell.y**2).sum(), rel=1e-9)


def test_matching_plot_densities(spark, ab_df):
    from fast_causal_inference_spark.operators.matching import matching_plot

    out = matching_plot(ab_df, "treatment", "x1", bins=20)
    assert len(out) == 20
    # densities integrate to ~1 over the binning
    w = out.bin_right - out.bin_left
    assert (out.density_control * w).sum() == pytest.approx(1.0, abs=1e-6)
    assert (out.density_treatment * w).sum() == pytest.approx(1.0, abs=1e-6)
    # randomized assignment: the two densities overlap heavily
    assert np.abs(out.density_control - out.density_treatment).mean() < 0.15


def test_aipw_debiases_confounding(spark):
    import numpy as np
    import pandas as pd

    from fast_causal_inference_spark.operators.estimators import (
        aipw_estimator,
    )

    rng = np.random.default_rng(0)
    n = 20000
    x1, x2 = rng.normal(0, 1, n), rng.normal(0, 1, n)
    e = 1 / (1 + np.exp(-0.8 * x1))          # confounded assignment
    t = rng.binomial(1, e)
    y = 1.0 + 2.0 * t + 1.5 * x1 + 0.5 * x2 + rng.normal(0, 1, n)
    df = spark.createDataFrame(
        pd.DataFrame({"t": t, "y": y, "x1": x1, "x2": x2}))
    naive = float(df.toPandas().groupby("t").y.mean().diff().iloc[-1])
    assert naive > 2.5                         # confounding bias is real
    for pm in ("logistic", "linear"):
        out = aipw_estimator(df, "y", "t", ["x1", "x2"], propensity=pm)
        assert out.ATE.iloc[0] == pytest.approx(2.0, abs=0.1)
        assert out.lower.iloc[0] < 2.0 < out.upper.iloc[0]
    with pytest.raises(ValueError, match="propensity"):
        aipw_estimator(df, "y", "t", ["x1"], propensity="forest")


def test_matched_pairs_ttest(spark):
    """Pairing absorbs the confounder-driven variance: the paired test on
    caliper-matched pairs matches a numpy paired-diff oracle."""
    import numpy as np
    import pandas as pd

    from fast_causal_inference_spark.operators.matching import (
        caliper_matching,
        matched_pairs_ttest,
    )

    rng = np.random.default_rng(107)
    n = 3000
    score = rng.uniform(0, 1, n)
    arm = rng.integers(0, 2, n)
    y = 5 * score + arm * 0.4 + rng.normal(0, 0.3, n)
    pdf = pd.DataFrame({"s": score, "arm": arm, "y": y})
    df = spark.createDataFrame(pdf)
    m = caliper_matching(df, "s", "arm", caliper=0.05)
    out = matched_pairs_ttest(m, "y", "arm").toPandas().iloc[0]

    mp = m.where("match_index is not null") \
        .select("match_index", "arm", "y").toPandas()
    g = mp.pivot_table(index="match_index", columns="arm", values="y",
                       aggfunc="mean")
    d = (g[1] - g[0]).dropna().to_numpy()
    assert float(out.estimate) == pytest.approx(d.mean(), rel=1e-9)
    assert float(out.stderr) == pytest.approx(
        d.std(ddof=1) / np.sqrt(len(d)), rel=1e-9)
    # detects the +0.4 effect
    assert float(out.estimate) == pytest.approx(0.4, abs=0.1)
    assert float(out.p_value) < 1e-6


def test_matched_pairs_null_policy_and_contract(spark):
    import numpy as np
    import pandas as pd

    from fast_causal_inference_spark.operators.matching import (
        matched_pairs_ttest,
    )

    pdf = pd.DataFrame({
        "match_index": [1, 1, 2, 2, 3, 3, None],
        "arm":         [1, 0, 1, 0, 1, 0, 1],
        "y":           [5.0, 3.0, None, 4.0, 7.0, None, 9.0],
    })
    df = spark.createDataFrame(pdf)
    out = matched_pairs_ttest(df, "y", "arm").toPandas().iloc[0]
    # pair 2 (treated Y NULL) and pair 3 (no non-null control) drop;
    # only pair 1's diff = 2.0 remains
    assert float(out.n) == 1
    assert float(out.estimate) == pytest.approx(2.0)
    with pytest.raises(ValueError, match="ROW-LEVEL"):
        matched_pairs_ttest(df, "avg(y)", "arm")
