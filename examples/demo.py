"""End-to-end demo — the reference's documented workflow, Spark-first.

Run: python examples/demo.py  (uses /root/testdata/sf0.001 if present,
else synthesizes the test_data_small fixture).
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import functions as F                           # noqa: E402

import fast_causal_inference_spark as fcis                       # noqa: E402
from fast_causal_inference_spark.testing import make_test_data_small  # noqa: E402


def main():
    spark = fcis.get_session("fcis-demo")
    spark.sparkContext.setLogLevel("ERROR")
    df = make_test_data_small(spark, n=10000, seed=0).cache()
    cdf = fcis.readSparkDf(df)

    print("== delta method ==")
    cdf.delta_method("avg(numerator)/avg(denominator)").show()

    print("== two-sample t-test with CUPED ==")
    cdf.ttest_2samp("avg(numerator)/avg(denominator)", "treatment",
                    X="avg(numerator_pre)/avg(denominator_pre)").show()

    print("== xexpt experiment report ==")
    print(cdf.xexpt_ttest_2samp("numerator", "denominator", "treatment",
                                "id").T)

    print("== OLS (R-style summary) ==")
    print(fcis.ols(df, "y ~ x1 + x2 + x3").summary())

    print("== bootstrap of OLS coefficients ==")
    print(cdf.boot_strap_ols("y ~ x1 + x2", n_resamples=50))

    print("== exact permutation test ==")
    print(fcis.permutation(df, "avg(y)", "treatment", permutation_num=200))

    print("== uplift: T-learner + lift/gain ==")
    from fast_causal_inference_spark.uplift.metalearners import TLearner

    scored = TLearner(["x1", "x2"], "y", "treatment").fit(df).predict(df)
    print(fcis.readSparkDf(scored).get_lift_gain("ite", "y", "treatment", k=5))

    print("== multi-arm / categorical family (round 4) ==")
    cdf3 = fcis.readSparkDf(
        df.withColumn("arm3", (F.col("x3") > 1).cast("int")
                      + F.col("treatment")))
    print(cdf3.anova_oneway("y", "arm3"))
    print(cdf3.kruskal_wallis_test("y", "arm3"))
    print(fcis.readSparkDf(df).chi_square_independence(
        "treatment", "x3 > 1"))
    print(fcis.readSparkDf(df).proportion_ztest("y > 2", "treatment"))

    print("== robust OLS inference (round 4) ==")
    print(fcis.robust_ols(df, "y ~ x1 + x2").coef_table())
    print(fcis.cluster_robust_ols(
        df.withColumn("cl", (F.col("x3") * 3).cast("int")),
        "y ~ x1", "cl").coef_table())

    print("== power / effect size (round 4) ==")
    print(fcis.effect_size(df, "y", "treatment"))
    print("n per arm for d=0.1:", fcis.sample_size_ttest(0.1, 1.0))

    print("== Bayesian A/B readout (round 4) ==")
    bdf = cdf.withColumn("converted", (df.numerator > df.denominator * 2)
                         .cast("int"))
    print(bdf.bayes_ab_binary("converted", "treatment")[
        ["arm", "posterior_mean", "p_beats_other", "expected_loss"]])

    print("== group-sequential monitor (round 4) ==")
    wk = cdf.withColumn("week", (F.abs(F.xxhash64("id")) % 4 + 1)
                        .cast("int"))
    print(wk.group_sequential_ttest(
        "numerator", "treatment", "week")[
        ["look", "z", "boundary", "crossed", "alpha_spent"]])

    print("== CUPAC: ML-adjusted variance reduction (round 5) ==")
    cdf.cupac_ttest_2samp("numerator", "treatment",
                          ["x1", "x2", "pow(x2,2)"]) \
        .select("estimate", "stderr", "p_value").show()

    print("== uplift economics: ROI / iROI / Qini (round 5) ==")
    from fast_causal_inference_spark.uplift import (
        compute_auuc,
        compute_qini_coefficient,
        estimate_iroi,
        estimate_qini,
    )

    econ = (df.withColumn("revenue", F.abs(F.col("y")))
              .withColumn("cost", F.abs(F.col("y")) * 0.25 + 0.01)
              .withColumn("outcome", F.col("y")))
    print(estimate_iroi(econ)[
        ["incremental_benefit", "incremental_cost", "iroi"]])
    qini = estimate_qini(scored.withColumnRenamed("ite", "cate_outcome")
                         .withColumnRenamed("y", "outcome"), n_buckets=5)
    print(f"auuc={compute_auuc(qini):.4f} "
          f"qini_coeff={compute_qini_coefficient(qini):.4f}")

    print("== trial simulation + diagnostics (round 5) ==")
    trial = fcis.simulate_randomized_trial(spark, n=20000, p=5,
                                           add_cost_benefit=True)
    print(fcis.get_num_smd(trial, "treatment",
                           ["feature_1", "feature_2"]))
    roc = fcis.roc_curve(
        trial.withColumn("lbl", (F.col("outcome") > 0).cast("int")),
        "lbl", "expected_outcome", n_thresholds=50)
    print(f"ROC points: {len(roc)}  (tpr@mid {roc.tpr.iloc[len(roc)//2]:.3f})")

    print("== cluster-randomized analysis (round 5) ==")
    cdf_cl = cdf.withColumn("cl", F.abs(F.xxhash64("id")) % 40) \
                .withColumn("carm", (F.col("cl") % 2).cast("int"))
    cdf_cl.cluster_ttest_2samp("avg(numerator)", "carm", "cl") \
        .select("n0", "n1", "estimate", "stderr", "p_value") \
        .show(truncate=False)
    icc = fcis.icc_oneway(cdf_cl.toSparkDf(), "numerator", "cl")
    print(f"ICC={icc['icc']:.4f}; 20-per-cluster design: "
          f"{fcis.sample_size_cluster_ttest(0.1, 1.0, m=20, icc=max(icc['icc'], 0.0))}")

    print("== quantile treatment effects (round 5) ==")
    print(cdf.quantile_treatment_effect(
        "numerator", "treatment", quantiles=(0.25, 0.5, 0.9)))

    print("== DML: cross-fitted debiased effect in 2 scans (round 5) ==")
    print(cdf.linear_dml("numerator", "x1", ["x2", "x3"], cv=3).summary())

    print("== off-policy evaluation: value of a 70/30 policy (round 6) ==")
    sdf_ope = df.withColumn("mu", F.lit(0.5)) \
        .withColumn("r", F.col("numerator"))
    print(fcis.ope_report(sdf_ope, "r", "treatment", ["x1"],
                          {1: "0.7", 0: "0.3"}, "mu").to_string())

    print("== split-conformal ITE bands (round 6) ==")
    cm = fcis.conformal_fit(df, "numerator", "treatment", ["x1", "x2"],
                            alpha=0.1)
    print(f"q1={cm.q1:.3f} q0={cm.q0:.3f} (90% counterfactual bands)")
    cm.transform(df).select("ite", "ite_lo", "ite_hi").show(3)

    print("== quantile regression at the 90th percentile (round 6) ==")
    print(fcis.quantile_regression(df, "numerator ~ x1 + x2",
                                   tau=0.9).coef_table().to_string())

    print("== entropy balancing + weighted ATT (round 6) ==")
    eb = fcis.entropy_balancing(df, "treatment", ["x1", "x2"])
    print(eb.att(df, "numerator").to_string())

    print("== Oaxaca-Blinder gap decomposition (round 6) ==")
    print(fcis.oaxaca_blinder(df, "numerator", "treatment",
                              ["x1", "x2"]).to_string())

    print("== average marginal effects of a logistic model (round 6) ==")
    from fast_causal_inference_spark.operators.logistic import (
        logistic_regression,
    )

    lm = logistic_regression(
        df.withColumn("conv", (F.col("numerator") > 0).cast("double")),
        "conv ~ x1 + x2")
    print(fcis.average_marginal_effects(
        lm, df.withColumn("conv", (F.col("numerator") > 0)
                          .cast("double"))).to_string())

    print("== survival: competing risks, RMST, PH check (round 6) ==")
    from fast_causal_inference_spark.operators.survival import (
        aalen_johansen,
        proportional_hazards_test,
        rmst,
    )

    sdf_surv = df.select(
        F.round(F.abs("numerator") + 0.1, 1).alias("t"),
        (F.abs(F.xxhash64("id")) % 3).cast("int").alias("cause"),
        F.col("treatment").alias("g"), F.col("x1"))
    print(aalen_johansen(sdf_surv, "t", "cause").head(4).to_string())
    print(rmst(sdf_surv.withColumn("e", (F.col("cause") != 0)
                                   .cast("int")),
               "t", "e", tau=2.0, group="g").to_string())
    print(proportional_hazards_test(
        sdf_surv.withColumn("e", (F.col("cause") != 0).cast("int")),
        "t", "e", ["x1"]).to_string())

    print("== pure-numpy JPEG codec on a synthesized column (round 5) ==")
    from fast_causal_inference_spark.datapipe.multimodal import (
        image_stats,
        synthesize_image_column,
    )

    docs = spark.range(6).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("example doc "), F.col("id")).alias("text"))
    image_stats(synthesize_image_column(docs, "text", fmt="jpeg")).select(
        "doc_id", "width", "height", "mean_pixel").show()

    print("== All-in-SQL ==")
    from fast_causal_inference_spark.plans.sql_macros import sql
    from fast_causal_inference_spark.session import register_sql_functions

    register_sql_functions(spark)
    df.createOrReplaceTempView("tbl")
    sql(spark, "SELECT ttest_2samp('avg(numerator)/avg(denominator)', "
               "treatment) FROM tbl").show()
    spark.sql("SELECT 2 * norm_sf(1.96) AS p_two_sided").show()

    spark.stop()


if __name__ == "__main__":
    main()
