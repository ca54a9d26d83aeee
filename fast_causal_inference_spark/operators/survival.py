"""Survival utilities: Kaplan-Meier estimator and log-rank test.

Parity target: reference ``lib/survival.py`` (a minimal Cox/KM skeleton).
Spark-first: the KM product-limit estimator needs risk-set counts per distinct
event time — one groupBy + one ordered cumulative product over the (small)
distinct-time relation, done driver-side in pandas.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fast_causal_inference_spark import stats_distributions as dist


def kaplan_meier(df: DataFrame, time: str, event: str,
                 group: str | None = None) -> pd.DataFrame:
    """KM survival curve S(t) per optional group.

    Returns (group,) time, n_risk, n_event, survival.
    """
    keys = ([group] if group else [])
    t = F.expr(time).cast("double")
    e = F.expr(event).cast("double")
    agg = (df.groupBy(*keys, t.alias("time"))
             .agg(F.sum(e).alias("n_event"), F.count(F.lit(1)).alias("n_obs"))
             .orderBy(*keys, "time")
             .toPandas())
    out = []
    for g, sub in (agg.groupby(group) if group else [(None, agg)]):
        sub = sub.sort_values("time").reset_index(drop=True)
        total = sub.n_obs.sum()
        at_risk = total - sub.n_obs.cumsum().shift(fill_value=0)
        surv = ((at_risk - sub.n_event) / at_risk).cumprod()
        rec = pd.DataFrame({"time": sub.time, "n_risk": at_risk,
                            "n_event": sub.n_event, "survival": surv})
        if group:
            rec.insert(0, group, g)
        out.append(rec)
    return pd.concat(out, ignore_index=True)


def logrank_test(df: DataFrame, time: str, event: str,
                 group: str, group_values: tuple = (0, 1)) -> pd.DataFrame:
    """Two-sample log-rank test (chi-square, df=1)."""
    g = F.expr(group)
    v0, v1 = group_values
    t = F.expr(time).cast("double")
    e = F.expr(event).cast("double")
    agg = (df.where(g.isin([v0, v1]))
             .groupBy(t.alias("time"), (g == F.lit(v1)).cast("int").alias("g"))
             .agg(F.sum(e).alias("d"), F.count(F.lit(1)).alias("n"))
             .orderBy("time")
             .toPandas())
    pv = agg.pivot_table(index="time", columns="g",
                         values=["d", "n"], fill_value=0.0)
    d0 = pv.get(("d", 0), pd.Series(0.0, index=pv.index))
    d1 = pv.get(("d", 1), pd.Series(0.0, index=pv.index))
    n0 = pv.get(("n", 0), pd.Series(0.0, index=pv.index))
    n1 = pv.get(("n", 1), pd.Series(0.0, index=pv.index))
    tot0 = n0.sum() - n0.cumsum().shift(fill_value=0)
    tot1 = n1.sum() - n1.cumsum().shift(fill_value=0)
    ntot = tot0 + tot1
    dtot = d0 + d1
    exp1 = dtot * tot1 / ntot
    with np.errstate(divide="ignore", invalid="ignore"):
        var1 = (dtot * (tot1 / ntot) * (tot0 / ntot)
                * (ntot - dtot) / (ntot - 1)).fillna(0.0)
    o_minus_e = (d1 - exp1).sum()
    v = var1.sum()
    chi2 = o_minus_e ** 2 / v if v > 0 else float("nan")
    p = float(dist.chi2_sf(chi2, 1))
    return pd.DataFrame([{"chi2": chi2, "p_value": p,
                          "observed1": d1.sum(), "expected1": exp1.sum()}])
