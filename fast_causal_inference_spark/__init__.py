"""fast_causal_inference_spark — a PySpark-native causal-inference analytics engine.

A brand-new implementation of the query and data-processing capabilities of
Tencent/fast-causal-inference (see SURVEY.md), built idiomatically on Spark SQL:
statistical operators are expressed as single-pass sufficient-statistics
aggregations (``groupBy().agg()`` of sums / cross-products kept inside
whole-stage codegen) followed by closed-form math rendered either as native
Column expressions or as vectorized post-aggregation finalizers; iterative
algorithms (logistic IRLS, DML, causal trees/forests) are driver-orchestrated
loops of Spark aggregations — the MLlib pattern.

Nothing here is a port of the reference's C++/Java engine code; reference
citations in docstrings (``path:line`` under /root/reference) document *what*
is being computed, never *how*.
"""

from fast_causal_inference_spark.session import get_session, configure_session
from fast_causal_inference_spark.formula import parse_formula
from fast_causal_inference_spark.operators.deltamethod import delta_method
from fast_causal_inference_spark.operators.ttest import (
    cluster_ttest_2samp,
    cupac_ttest_2samp,
    equivalence_ttest_2samp,
    ttest_1samp,
    ttest_2samp,
    ttests_2samp,
    student_ttest,
    welch_ttest,
    winsorized_ttest_2samp,
    mean_z_test,
)
from fast_causal_inference_spark.operators.srm import srm
from fast_causal_inference_spark.operators.ols import ols, wls, OlsModel, did, iv_regression, cluster_robust_ols, robust_ols
from fast_causal_inference_spark.operators.matrix import matrix_multiplication
from fast_causal_inference_spark.operators.mann_whitney import mann_whitney_utest
from fast_causal_inference_spark.operators.kstest import kolmogorov_smirnov_test
from fast_causal_inference_spark.operators.xexpt import xexpt_ttest_2samp
from fast_causal_inference_spark.operators.logistic import (
    stochastic_linear_regression,
    stochastic_logistic_regression,
)
from fast_causal_inference_spark.operators.resample import (
    boot_strap,
    boot_strap_multi,
    boot_strap_ols,
    permutation,
)
from fast_causal_inference_spark.operators.matching import (
    caliper_matching,
    exact_matching,
    smd,
)
from fast_causal_inference_spark.operators.groupset import group_set
from fast_causal_inference_spark.operators.rdd import regression_discontinuity
from fast_causal_inference_spark.operators.synth import synthetic_control
from fast_causal_inference_spark.operators.eventstudy import event_study
from fast_causal_inference_spark.dataframe import (
    CausalDataFrame,
    readClickHouse,
    readCsv,
    readOlap,
    readSparkDf,
    readStarRocks,
    readTable,
)
from fast_causal_inference_spark.plans.sql_macros import sql
from fast_causal_inference_spark.result import TestResult, test_result
from fast_causal_inference_spark.operators.logistic import logistic_regression, auc
from fast_causal_inference_spark.operators.dml import (
    linear_dml,
    linear_dml_grouped,
    non_param_dml,
)
from fast_causal_inference_spark.operators.quantile_test import (
    quantile_treatment_effect,
)
from fast_causal_inference_spark.operators.estimators import aipw_estimator, ate_estimator, ipw_estimator
from fast_causal_inference_spark.operators.offpolicy import (
    ope_dr,
    ope_ips,
    ope_report,
    ope_snips,
)
from fast_causal_inference_spark.operators.conformal import (
    conformal_fit,
    conformal_ite,
)
from fast_causal_inference_spark.operators.quantreg import (
    quantile_regression,
)
from fast_causal_inference_spark.operators.balancing import (
    entropy_balancing,
)
from fast_causal_inference_spark.operators.decompose import (
    oaxaca_blinder,
)
from fast_causal_inference_spark.operators.csdid import callaway_santanna
from fast_causal_inference_spark.operators.its import (
    interrupted_time_series,
)
from fast_causal_inference_spark.operators.mediation import mediation
from fast_causal_inference_spark.operators.ordinal import ordered_logit
from fast_causal_inference_spark.operators.selection import heckman
from fast_causal_inference_spark.operators.margins import (
    average_marginal_effects,
)
from fast_causal_inference_spark.operators.temporal import (
    asof_join,
    range_join,
    time_bucket_rollup,
)
from fast_causal_inference_spark.operators.contingency import (
    chi_square_independence,
    cmh_test,
    fisher_exact_2x2,
)
from fast_causal_inference_spark.operators.anova import (
    anova_oneway,
    bartlett_test,
    dunnett_test,
    kruskal_wallis_test,
)
from fast_causal_inference_spark.operators.proportion import (
    proportion_ztest,
    proportion_ztest_1samp,
)
from fast_causal_inference_spark.operators.multiple_testing import (
    adjust_pvalues,
)
from fast_causal_inference_spark.operators.power import (
    design_effect,
    effect_size,
    events_logrank,
    icc_oneway,
    mde_ttest,
    power_proportion,
    power_ttest,
    sample_size_cluster_ttest,
    sample_size_logrank,
    sample_size_proportion,
    sample_size_ttest,
)
from fast_causal_inference_spark.operators.bayes import (
    bayes_ab_binary,
    bayes_ab_continuous,
)
from fast_causal_inference_spark.operators.scorecard import (
    experiment_scorecard,
)
from fast_causal_inference_spark.operators.sequential import (
    conditional_power,
    group_sequential_boundaries,
    group_sequential_ttest,
)
from fast_causal_inference_spark.datapipe.similarity import (
    embedding_kmeans,
    embedding_pca,
    project_embeddings,
)
from fast_causal_inference_spark.utility import (
    data_split,
    feature_process,
    find_correlation_matrix,
    get_num_cat_feat,
    get_num_smd,
    preprocess_na,
    regression_string,
    roc_curve,
    simulate_randomized_trial,
)

__version__ = "0.1.0"

__all__ = [
    "get_session",
    "configure_session",
    "parse_formula",
    "regression_discontinuity",
    "synthetic_control",
    "event_study",
    "delta_method",
    "ttest_1samp",
    "ttest_2samp",
    "cupac_ttest_2samp",
    "ttests_2samp",
    "student_ttest",
    "welch_ttest",
    "mean_z_test",
    "srm",
    "ols",
    "wls",
    "OlsModel",
    "did",
    "iv_regression",
    "cluster_robust_ols",
    "robust_ols",
    "matrix_multiplication",
    "mann_whitney_utest",
    "kolmogorov_smirnov_test",
    "xexpt_ttest_2samp",
    "boot_strap",
    "stochastic_linear_regression",
    "stochastic_logistic_regression",
    "boot_strap_multi",
    "boot_strap_ols",
    "permutation",
    "caliper_matching",
    "exact_matching",
    "smd",
    "group_set",
    "CausalDataFrame",
    "readCsv",
    "readOlap",
    "readClickHouse",
    "readStarRocks",
    "readSparkDf",
    "readTable",
    "sql",
    "TestResult",
    "test_result",
    "logistic_regression",
    "auc",
    "linear_dml",
    "linear_dml_grouped",
    "quantile_treatment_effect",
    "cluster_ttest_2samp",
    "equivalence_ttest_2samp",
    "winsorized_ttest_2samp",
    "non_param_dml",
    "ate_estimator",
    "aipw_estimator",
    "ipw_estimator",
    "ope_ips",
    "ope_snips",
    "ope_dr",
    "ope_report",
    "conformal_fit",
    "conformal_ite",
    "quantile_regression",
    "entropy_balancing",
    "oaxaca_blinder",
    "callaway_santanna",
    "interrupted_time_series",
    "mediation",
    "ordered_logit",
    "heckman",
    "average_marginal_effects",
    "asof_join",
    "range_join",
    "time_bucket_rollup",
    "chi_square_independence",
    "cmh_test",
    "fisher_exact_2x2",
    "anova_oneway",
    "bartlett_test",
    "kruskal_wallis_test",
    "dunnett_test",
    "events_logrank",
    "sample_size_logrank",
    "proportion_ztest",
    "proportion_ztest_1samp",
    "adjust_pvalues",
    "effect_size",
    "power_proportion",
    "sample_size_proportion",
    "sample_size_cluster_ttest",
    "icc_oneway",
    "design_effect",
    "bayes_ab_binary",
    "bayes_ab_continuous",
    "experiment_scorecard",
    "conditional_power",
    "group_sequential_boundaries",
    "group_sequential_ttest",
    "mde_ttest",
    "power_ttest",
    "sample_size_ttest",
    "data_split",
    "feature_process",
    "find_correlation_matrix",
    "get_num_cat_feat",
    "get_num_smd",
    "preprocess_na",
    "regression_string",
    "roc_curve",
    "simulate_randomized_trial",
    "embedding_kmeans",
    "embedding_pca",
    "project_embeddings",
]
