"""Uplift / HTE subpackage: trees, forests, meta-learners, evaluation.

``evaluation`` carries the reference's lift()/qini/AUUC surface
(``uplift.py:76-194``); ``roi`` carries its PySpark evaluation-suite
surface (``lib/spark_evaluation.py``)."""

from fast_causal_inference_spark.uplift.evaluation import (  # noqa: F401
    auuc,
    cate_by_bucket,
    get_lift_gain,
    hte_plot,
    load_model,
    qini_curve,
    save_model,
    qini_score,
    uplift_report,
)
from fast_causal_inference_spark.uplift.roi import (  # noqa: F401
    assign_score_buckets,
    compute_auuc,
    compute_qini_coefficient,
    estimate_ate,
    estimate_cate_lift,
    estimate_cate_per_bucket,
    estimate_cate_per_quantile,
    estimate_cum_iroi,
    estimate_economics,
    estimate_iroi,
    estimate_iroi_per_bucket,
    estimate_iroi_per_quantile,
    estimate_metrics,
    estimate_qini,
    estimate_roi,
    estimate_target_rate_per_bucket,
    estimate_target_rate_per_quantile,
)
