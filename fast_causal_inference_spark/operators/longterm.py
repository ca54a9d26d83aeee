"""Long-term surrogate-index forecasting (recursive OLS).

Parity target: reference ``dataframe/longterm.py:11-290`` /
``RecursiveForcasting.java:28-160`` — forecast a long-horizon treatment
effect from short-term surrogates: fit a linear transition model from each
period's surrogate vector to the next (pooled over the training periods),
recursively roll predictions through the horizon, difference the key
metric between arms, and put bootstrap CIs on the rolled predictions
(the reference replays the whole pipeline per DistributedNodeRowNumber
resample; here a Poisson-bootstrap replica dimension rides the SAME
aggregation).

Spark-first shape: the transition Gramians, per-arm start vectors, and
per-period observed stats are all conditional ``F.sum`` columns — ONE
full-sample pass plus ONE replica-exploded pass (shuffle payload
B × O(k²·T) doubles, independent of row count).  Model solves and the
linear roll-forward are driver-side numpy on those tiny aggregates; the
roll of the arm MEAN is exact because the transition model is linear.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fast_causal_inference_spark.operators.ols import ols
from fast_causal_inference_spark.operators.resample import (
    poisson_weight_column,
)
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


def _lt_agg_columns(surrogates: list[list[str]], key_metric: int,
                    train_periods: int, w, arm_w0, arm_w1,
                    include_observed: bool = True):
    """Conditional-sum aggregate columns for one long_term pass.

    g_{a}_{b} / h_{a}_{c}: pooled transition Gramian of [1, S_t] against
    itself / against S_{t+1} over training transitions; n/s per arm at the
    roll start period; per-period key-metric moments per arm
    (``include_observed`` — only the full-sample pass needs those, the
    replica pass never reads them).
    """
    k = len(surrogates[0])
    start = train_periods - 1
    xcols = [[F.lit(1.0)] + [F.expr(c).cast("double") for c in surrogates[t]]
             for t in range(len(surrogates))]
    aggs = []
    for a in range(k + 1):
        for b in range(a, k + 1):
            expr = None
            for t in range(train_periods - 1):
                term = w * xcols[t][a] * xcols[t][b]
                expr = term if expr is None else expr + term
            aggs.append(F.sum(expr).alias(f"g_{a}_{b}"))
    for a in range(k + 1):
        for c in range(k):
            expr = None
            for t in range(train_periods - 1):
                term = w * xcols[t][a] * xcols[t + 1][c + 1]
                expr = term if expr is None else expr + term
            aggs.append(F.sum(expr).alias(f"h_{a}_{c}"))
    for arm, aw in ((0, arm_w0), (1, arm_w1)):
        aggs.append(F.sum(aw).alias(f"n{arm}"))
        for c in range(k):
            aggs.append(F.sum(aw * xcols[start][c + 1]).alias(f"s{arm}_{c}"))
    if include_observed:
        for t in range(len(surrogates)):
            y = F.expr(surrogates[t][key_metric]).cast("double")
            for arm, aw in ((0, arm_w0), (1, arm_w1)):
                aggs.append(F.sum(aw * y).alias(f"y{arm}_{t}"))
                aggs.append(F.sum(aw * y * y).alias(f"yy{arm}_{t}"))
    return aggs


def _lt_solve_and_roll(row, k: int, key_metric: int, horizons: int) -> list[float] | None:
    """Solve the pooled transition model from one aggregated row and roll
    both arms' start means through ``horizons`` steps; returns the per-step
    key-metric effect (arm1 − arm0), or None for a degenerate replica."""
    v = {}
    for arm in (0, 1):
        n = row[f"n{arm}"]
        n = float(n) if n is not None else 0.0
        if n <= 0.0:
            return None          # degenerate replica (one arm weightless)
        v[arm] = np.array([float(row[f"s{arm}_{c}"]) / n
                           for c in range(k)])
    p = k + 1
    G = np.empty((p, p))
    for a in range(p):
        for b in range(a, p):
            G[a, b] = G[b, a] = float(row[f"g_{a}_{b}"])
    H = np.empty((p, k))
    for a in range(p):
        for c in range(k):
            H[a, c] = float(row[f"h_{a}_{c}"])
    try:
        B = np.linalg.solve(G, H)
    except np.linalg.LinAlgError:
        B = np.linalg.lstsq(G, H, rcond=None)[0]
    effects = []
    for _ in range(horizons):
        for arm in (0, 1):
            v[arm] = np.concatenate([[1.0], v[arm]]) @ B
        effects.append(float(v[1][key_metric] - v[0][key_metric]))
    return effects


def long_term(df: DataFrame, surrogates: list[list[str]], treatment: str,
              key_metric: int = 0, train_periods: int = 2,
              predict_end: int | None = None, bs_num: int = 100,
              resample_frac: float = 1.0, seed: int = 42) -> pd.DataFrame:
    """Reference ``LongTerm`` semantics (``dataframe/longterm.py:253-282``).

    ``surrogates[t]`` — the period-(t+1) surrogate column list (equal
    lengths); ``key_metric`` — 0-based index of the outcome within each
    list (reference ``key_metric`` is 1-based); ``train_periods`` — the
    transition model pools periods 1..train_periods (reference
    ``train_Ts='2~1'`` ≙ 2); predictions roll from the last training
    period's observed surrogates out to ``predict_end`` (default: the
    last period).

    Returns one row per period t: observed ``estimate``/``stderr``/
    ``lower``/``upper`` (per-period z-test of the key metric, the
    reference's ``ttest`` helper with its hard-coded ±1.96), and for
    predicted periods ``mean_pred``/``std_pred``/``lower_pred``/
    ``upper_pred`` from ``bs_num`` Poisson-bootstrap replicas of the
    whole fit-and-roll pipeline.
    """
    T = len(surrogates)
    if T < 2:
        raise ValueError("need at least two surrogate periods")
    k = len(surrogates[0])
    if any(len(s) != k for s in surrogates):
        raise ValueError("all periods must list the same number of columns")
    if not 0 <= key_metric < k:
        raise ValueError(f"key_metric must be in [0, {k})")
    if not 2 <= train_periods <= T:
        raise ValueError("train_periods must be in [2, n_periods]")
    predict_end = T if predict_end is None else predict_end
    horizons = predict_end - train_periods
    if horizons < 1:
        raise ValueError("predict_end must exceed train_periods")

    idx = F.col(treatment) if treatment.isidentifier() else F.expr(treatment)
    arm0 = (idx == 0).cast("double")
    arm1 = (idx == 1).cast("double")
    allcols = [c for s in surrogates for c in s]
    guard = None
    for c in allcols:
        nn = F.expr(c).isNotNull()
        guard = nn if guard is None else (guard & nn)
    base = df.where(guard & idx.isin([0, 1]))

    one = F.lit(1.0)
    full = base.agg(*_lt_agg_columns(surrogates, key_metric,
                                     train_periods, one, arm0, arm1)) \
               .collect()[0]
    n0 = float(full["n0"] or 0.0)
    n1 = float(full["n1"] or 0.0)
    if n0 <= 1 or n1 <= 1:
        raise ValueError(
            f"long_term needs >1 non-null row in each treatment arm at the "
            f"roll start period; got n0={n0:g}, n1={n1:g}")

    # observed per-period effects (reference per-period z-test, ±1.96)
    rows = []
    for t in range(T):
        m0 = float(full[f"y0_{t}"]) / n0
        m1 = float(full[f"y1_{t}"]) / n1
        v0 = (float(full[f"yy0_{t}"]) - n0 * m0 * m0) / (n0 - 1.0)
        v1 = (float(full[f"yy1_{t}"]) - n1 * m1 * m1) / (n1 - 1.0)
        est = m1 - m0
        se = float(np.sqrt(v1 / n1 + v0 / n0))
        rows.append({"t": t + 1, "estimate": est, "stderr": se,
                     "lower": est - 1.96 * se, "upper": est + 1.96 * se,
                     "mean_pred": float("nan"), "std_pred": float("nan"),
                     "lower_pred": float("nan"),
                     "upper_pred": float("nan")})

    # bootstrap replicas of fit-and-roll (one exploded pass)
    rep = F.explode(F.sequence(F.lit(0), F.lit(bs_num - 1))) \
        .alias("replica_id")
    exploded = (base.select("*", rep)
                .withColumn("__u", F.rand(seed))
                .withColumn("__w", poisson_weight_column(
                    resample_frac, F.col("__u")).cast("double"))
                .drop("__u"))
    reps = exploded.groupBy("replica_id").agg(
        *_lt_agg_columns(surrogates, key_metric, train_periods,
                         F.col("__w"), F.col("__w") * arm0,
                         F.col("__w") * arm1,
                         include_observed=False)).collect()
    rolled = [_lt_solve_and_roll(r, k, key_metric, horizons) for r in reps]
    rolled = [e for e in rolled if e is not None]        # degenerate arms
    if len(rolled) < 2:
        raise ValueError(
            f"only {len(rolled)} of {bs_num} bootstrap replicas had weight "
            "in both arms; increase bs_num/resample_frac or supply more "
            "rows")
    eff = np.array(rolled)                               # (B_eff, horizons)
    for j in range(horizons):
        t = train_periods + 1 + j                        # 1-based period
        if t - 1 < len(rows):
            row = rows[t - 1]
        else:
            row = {"t": t, "estimate": float("nan"),
                   "stderr": float("nan"), "lower": float("nan"),
                   "upper": float("nan")}
            rows.append(row)
        col = eff[:, j]
        row["mean_pred"] = float(col.mean())
        row["std_pred"] = float(col.std())              # ddof=0, as reference
        row["lower_pred"] = float(np.quantile(col, 0.025))
        row["upper_pred"] = float(np.quantile(col, 0.975))
    return pd.DataFrame(rows)
