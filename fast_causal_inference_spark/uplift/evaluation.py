"""Uplift evaluation: lift/gain curves, Qini, AUUC, per-bucket CATE.

Parity targets: reference ``uplift.py:76-194`` (get_lift_gain / ``lift()``
macro — rank by predicted ITE desc, K buckets, cumulative lift/gain vs the
ATE/random baselines, AUUC) and ``LiftParser.java:25-120`` (the window-SQL
rewrite the gateway generates); the reference also ships its own PySpark
evaluation suite (``lib/spark_evaluation.py``) whose metric definitions these
reproduce — implementation here is fresh.

Scale shape: ``ntile(K)`` over the ITE ordering + ONE groupBy(K buckets).
The only global structure is the K-bucket assignment; all cumulative math
happens on the K-row aggregate (driver-side pandas, K ≪ rows).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# auto method switch: exact global-sort ntile is fine (and engine-exact) up
# to this many rows; above it the approxQuantile sketch path keeps bucketing
# fully parallel — ntile(k) OVER (ORDER BY ite) is a single-partition window,
# the textbook driver-of-one bottleneck at 100 TB.
AUTO_NTILE_MAX = 1_000_000


def _bucketed_stats(df: DataFrame, ite: str, y: str, t: str,
                    k: int, tiebreak: str | None = None,
                    method: str = "auto",
                    n_rows: int | None = None) -> pd.DataFrame:
    """Per-ITE-rank-bucket treatment/control counts and outcome sums.

    ``tiebreak`` — optional column giving a deterministic total order under
    score ties (needed for engine-reproducible bucketing).
    ``method='quantile'`` — the scale path: bucket by approxQuantile sketch
    edges of the ITE instead of a global ntile sort (a single-partition
    window is the one non-distributed step of the exact variant; the sketch
    keeps everything parallel at the cost of slightly uneven buckets).
    ``n_rows`` — pre-known row count; spares the auto method switch its
    extra count() scan when the caller already knows it.
    """
    tcol = F.expr(t).cast("double")
    ycol = F.expr(y).cast("double")
    sel = [ycol.alias("__y"), tcol.alias("__t"), F.expr(ite).alias("__ite")]
    if tiebreak:
        sel.append(F.expr(tiebreak).alias("__tb"))
    base = df.select(*sel)
    if method == "auto":
        if n_rows is None:
            n_rows = base.count()
        method = "ntile" if n_rows <= AUTO_NTILE_MAX else "quantile"
    if method == "quantile":
        probs = [i / k for i in range(1, k)]
        edges = base.approxQuantile("__ite", probs, 0.001)
        edges = sorted(set(edges), reverse=True)   # bucket 1 = highest ITE
        bucket = None
        for i, e in enumerate(edges):
            cond = F.col("__ite") > e
            bucket = F.when(cond, i + 1) if bucket is None \
                else bucket.when(cond, i + 1)
        bucket = (bucket.otherwise(len(edges) + 1) if bucket is not None
                  else F.lit(1))
        b = base.withColumn("__bucket", bucket)
    else:
        order = [F.desc("__ite")] + ([F.col("__tb")] if tiebreak else [])
        b = base.withColumn("__bucket", F.ntile(k).over(Window.orderBy(*order)))
    agg = (b.groupBy("__bucket")
           .agg(F.count(F.lit(1)).alias("n"),
                F.sum("__t").alias("n1"),
                F.sum(F.when(F.col("__t") == 1, F.col("__y"))).alias("y1"),
                F.sum(F.when(F.col("__t") == 0, F.col("__y"))).alias("y0"),
                F.avg("__ite").alias("ite_avg"),
                # NULL / non-0/1 treatments would silently land in the
                # control denominator (n0 = n - n1) while contributing
                # nothing to y0 — count them in the SAME aggregation and
                # refuse rather than bias every lift/gain/Qini number
                F.count(F.when(F.col("__t").isNull()
                               | ~F.col("__t").isin(0.0, 1.0), 1))
                .alias("__bad"))
           .orderBy("__bucket"))
    pdf = agg.toPandas()
    bad = int(pdf["__bad"].sum())
    if bad:
        raise ValueError(
            f"{bad} rows have treatment outside {{0, 1}} (or NULL): "
            f"uplift evaluation needs binary 0/1 treatment — recode or "
            f"filter the frame first")
    pdf = pdf.drop(columns="__bad")
    pdf["n0"] = pdf["n"] - pdf["n1"]
    pdf[["y1", "y0"]] = pdf[["y1", "y0"]].fillna(0.0)
    return pdf


def _lift_gain_from_stats(pdf: pd.DataFrame) -> pd.DataFrame:
    cn1 = pdf.n1.cumsum()
    cn0 = pdf.n0.cumsum()
    cy1 = pdf.y1.cumsum()
    cy0 = pdf.y0.cumsum()
    cn = pdf.n.cumsum()
    total = pdf.n.sum()
    with np.errstate(divide="ignore", invalid="ignore"):
        uplift_cum = cy1 / cn1 - cy0 / cn0
    ate = float(pdf.y1.sum() / pdf.n1.sum() - pdf.y0.sum() / pdf.n0.sum())
    out = pd.DataFrame({
        "bucket": pdf["__bucket"],
        "ratio": cn / total,
        "ite_avg": pdf.ite_avg,
        "lift": uplift_cum,
        "gain": uplift_cum * (cn / total),
        "ate_baseline": ate,
        "random_gain": ate * (cn / total),
    })
    return out


def get_lift_gain(df: DataFrame, ite: str, y: str, t: str,
                  k: int = 10, tiebreak: str | None = None,
                  method: str = "auto",
                  n_rows: int | None = None) -> pd.DataFrame:
    """Cumulative lift/gain table over K ITE-ranked buckets.

    Columns: bucket, ratio (population share), lift (cumulative uplift of the
    targeted share), gain (lift·ratio, i.e. cumulative incremental outcome per
    capita scaled), ate_baseline (overall ATE), random_gain (ATE·ratio).

    ``method``: 'ntile' (exact global sort), 'quantile' (sketch buckets,
    fully parallel), or 'auto' (default — exact below AUTO_NTILE_MAX rows,
    sketch above).  ``n_rows`` spares auto its count() scan.
    """
    return _lift_gain_from_stats(
        _bucketed_stats(df, ite, y, t, k, tiebreak, method, n_rows))


def _qini_from_stats(pdf: pd.DataFrame) -> pd.DataFrame:
    cn1 = pdf.n1.cumsum()
    cn0 = pdf.n0.cumsum()
    cy1 = pdf.y1.cumsum()
    cy0 = pdf.y0.cumsum()
    cn = pdf.n.cumsum()
    total = pdf.n.sum()
    with np.errstate(divide="ignore", invalid="ignore"):
        qini = cy1 - cy0 * (cn1 / cn0.replace(0, np.nan))
    n1_tot = pdf.n1.sum()
    y1_tot = pdf.y1.sum()
    y0_tot = pdf.y0.sum()
    n0_tot = pdf.n0.sum()
    random_q = (y1_tot - y0_tot * n1_tot / n0_tot) * (cn / total)
    return pd.DataFrame({"bucket": pdf["__bucket"], "ratio": cn / total,
                         "qini": qini, "random_qini": random_q})


def qini_curve(df: DataFrame, ite: str, y: str, t: str, k: int = 10,
               n_rows: int | None = None) -> pd.DataFrame:
    """Qini curve points: incremental outcomes at each targeted share
    (treatment-count-scaled variant, the standard Qini definition)."""
    return _qini_from_stats(
        _bucketed_stats(df, ite, y, t, k, n_rows=n_rows))


def _auuc_from_stats(pdf: pd.DataFrame) -> float:
    g = _lift_gain_from_stats(pdf)
    x = np.concatenate([[0.0], g.ratio.to_numpy()])
    yv = np.concatenate([[0.0], g.gain.fillna(0.0).to_numpy()])
    return float(np.trapz(yv, x))


def _qini_score_from_stats(pdf: pd.DataFrame) -> float:
    q = _qini_from_stats(pdf)
    x = np.concatenate([[0.0], q.ratio.to_numpy()])
    actual = np.concatenate([[0.0], q.qini.fillna(0.0).to_numpy()])
    rand = np.concatenate([[0.0], q.random_qini.to_numpy()])
    return float(np.trapz(actual, x) - np.trapz(rand, x))


def auuc(df: DataFrame, ite: str, y: str, t: str, k: int = 100,
         n_rows: int | None = None) -> float:
    """RAW area under the uplift (gain) curve — trapezoid over K
    buckets, in the outcome's own units.  NOT baseline-adjusted: use
    :func:`qini_score` for the area net of the random-targeting line
    (the scale-comparable coefficient)."""
    return _auuc_from_stats(_bucketed_stats(df, ite, y, t, k, n_rows=n_rows))


def qini_score(df: DataFrame, ite: str, y: str, t: str, k: int = 100,
               n_rows: int | None = None) -> float:
    """Qini coefficient: area between the Qini curve and the random line."""
    return _qini_score_from_stats(
        _bucketed_stats(df, ite, y, t, k, n_rows=n_rows))


def _cate_from_stats(pdf: pd.DataFrame) -> pd.DataFrame:
    """Calibration table from bucketed stats (shared by cate_by_bucket
    and uplift_report so the two cannot diverge)."""
    with np.errstate(divide="ignore", invalid="ignore"):
        cate = pdf.y1 / pdf.n1 - pdf.y0 / pdf.n0
    return pd.DataFrame({"bucket": pdf["__bucket"], "n": pdf.n,
                         "ite_pred": pdf.ite_avg, "cate_actual": cate})


def cate_by_bucket(df: DataFrame, ite: str, y: str, t: str, k: int = 10,
                   n_rows: int | None = None) -> pd.DataFrame:
    """Non-cumulative per-bucket CATE vs predicted ITE (calibration table)."""
    return _cate_from_stats(_bucketed_stats(df, ite, y, t, k, n_rows=n_rows))


def uplift_report(df: DataFrame, ite: str, y: str, t: str, k: int = 10,
                  tiebreak: str | None = None, method: str = "auto",
                  n_rows: int | None = None) -> dict:
    """Full uplift evaluation from ONE bucketed-stats pass: lift/gain table,
    Qini curve, AUUC, Qini coefficient, and the calibration table all share
    a single scan+aggregation instead of one per metric."""
    pdf = _bucketed_stats(df, ite, y, t, k, tiebreak, method, n_rows)
    return {
        "lift_gain": _lift_gain_from_stats(pdf),
        "qini": _qini_from_stats(pdf),
        "auuc": _auuc_from_stats(pdf),
        "qini_score": _qini_score_from_stats(pdf),
        "cate_by_bucket": _cate_from_stats(pdf),
    }


def hte_plot(results, labels=None, plot: bool = False):
    """Uplift + gain curves for several models side by side (reference
    ``uplift.py:196-263``).  ``results`` — list of :func:`get_lift_gain`
    outputs.  Returns plot-ready data: a list of dicts with the model
    label, AUUC (mean gain — the reference's summary number), and the
    (ratio, lift, gain) curve; draws the two-panel figure only when
    matplotlib is importable and ``plot=True`` (this container ships
    without it)."""
    labels = list(labels or [])
    while len(labels) < len(results):
        labels.append(f"model_{len(labels) + 1}")
    data = []
    for pdf, label in zip(results, labels):
        data.append({
            "label": label,
            "auuc": round(float(pdf["gain"].sum() / len(pdf)), 2),
            "curve": pdf[["ratio", "lift", "gain", "ate_baseline",
                          "random_gain"]].reset_index(drop=True),
        })
    if plot and data:
        try:
            import matplotlib.pyplot as plt
        except ImportError:
            return data
        fig, (ax1, ax2) = plt.subplots(1, 2, sharex=True, figsize=(12, 4.8))
        for d in data:
            c = d["curve"]
            ax1.plot(c.ratio, c.lift, label=d["label"])
            ax2.plot([0] + list(c.ratio), [0] + list(c.gain),
                     label=f"{d['label']}(auuc:{d['auuc']})")
        c0 = data[0]["curve"]
        ax1.axhline(c0.ate_baseline.iloc[0], ls="--", color="gray")
        ax2.plot([0] + list(c0.ratio), [0] + list(c0.random_gain),
                 ls="--", color="gray", label="random")
        ax1.legend(); ax2.legend()
    return data


def save_model(model, file: str) -> None:
    """Pickle any fitted model object (CausalTree/CausalForest/OlsModel/
    meta-learner) to a local file — reference ``uplift.py:1864-1870``."""
    import pickle

    with open(file, "wb") as f:
        pickle.dump(model, f)


def load_model(file: str):
    """Inverse of :func:`save_model` — reference ``uplift.py:1872-1877``."""
    import pickle

    with open(file, "rb") as f:
        return pickle.load(f)
