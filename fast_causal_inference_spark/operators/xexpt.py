"""xexpt_ttest_2samp — experiment-platform report with power/MDE/sample-size.

Parity target: reference ``xexpt_ttest_2samp.h`` (buckets :161-171, power/MDE/
recommend :505-522, output :560-611) and Python facade ``statistics.py:258-509``.

Semantics:

* ``metric_type='avg'`` — delta-method t-test of ``avg(num)/avg(den)`` with
  optional CUPED, plus relative diff/CI, power at a given MDE, the MDE
  reachable at a given power, and a recommended sample size.
* ``metric_type='sum'`` — SUM metrics have no per-user denominator, so users
  are hashed into 128 buckets per arm; each bucket's sums form one observation
  and the same machinery runs at bucket level with the arm's traffic ratio as
  the denominator (``group_buckets``).

Spark-first: the row-scale pass is a plain two-level ``groupBy`` (arm ×
bucket) of native sums — bounded state (128·k doubles per arm), exactly the
pre-bucketing the reference uses to bound UDAF state, and what keeps this a
single shuffle at 100 TB.
"""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fast_causal_inference_spark import stats_distributions as dist
from fast_causal_inference_spark.formula import parse_formulas
from fast_causal_inference_spark.operators import _ttest_core as core
from fast_causal_inference_spark.operators.suffstats import (
    row_to_stats,
    suffstat_agg_columns,
)

N_BUCKETS = 128


def xexpt_ttest_2samp(df: DataFrame, numerator: str, denominator: str,
                      index: str, uin: str, metric_type: str = "avg",
                      group_buckets: tuple = (1, 1), alpha: float = 0.05,
                      mde: float = 0.005, power: float = 0.8,
                      X: str = "", treatment_values: tuple | None = None,
                      group_cols: list[str] | None = None):
    """Returns a pandas DataFrame with the full experiment report —
    one row per report cell (``group_cols``, reference
    ``df.groupBy('ds').xexpt_ttest_2samp(...)``) or a single row."""
    if group_cols:
        # drill-down: grouped suff-stats pass, per-cell finalize on the
        # driver (report cells are bounded; this matches the reference's
        # groupBy drill-down semantics, statistics.py:479-480)
        import pandas as pd

        cells = df.select(*group_cols).distinct().limit(1001).collect()
        if len(cells) > 1000:
            raise ValueError(
                "xexpt drill-down runs one aggregation per cell; >1000 "
                "distinct group values is almost never intended — bucket "
                "the group key first")
        outs = []
        for r in cells:
            cond = None
            for g in group_cols:
                c = (F.col(g) == F.lit(r[g])) if r[g] is not None \
                    else F.col(g).isNull()
                cond = c if cond is None else (cond & c)
            rep = xexpt_ttest_2samp(
                df.where(cond), numerator, denominator, index, uin,
                metric_type, group_buckets, alpha, mde, power, X,
                treatment_values)
            for g in group_cols:
                rep.insert(0, g, r[g])
            outs.append(rep)
        return pd.concat(outs, ignore_index=True)
    if metric_type not in ("avg", "sum"):
        raise ValueError("metric_type must be 'avg' or 'sum'")

    idx = F.col(index) if index.isidentifier() else F.expr(index)
    if treatment_values is None:
        vals = [r[0] for r in df.select(idx.alias("i")).distinct()
                .orderBy("i").limit(3).collect()]
        if len(vals) != 2:
            raise ValueError(f"index must have exactly 2 values, got {vals}")
        treatment_values = tuple(vals)
    v0, v1 = treatment_values

    x_parts = [p for p in X.replace("X=", "").split("+") if p.strip()] if X else []
    y_formula = f"avg({numerator})/avg({denominator})"
    nodes, base = parse_formulas([y_formula] + x_parts)
    ynode, xnodes = nodes[0], nodes[1:]
    k = len(base)

    if metric_type == "avg":
        aggs = (suffstat_agg_columns(base, "g0_", idx == F.lit(v0))
                + suffstat_agg_columns(base, "g1_", idx == F.lit(v1)))
        row = df.agg(*aggs).collect()[0]
        s0 = row_to_stats(row, k, "g0_")
        s1 = row_to_stats(row, k, "g1_")
        den_sums = None
    else:
        # stage 1: arm × hash-bucket sums of every base column (native agg)
        ucol = F.col(uin) if uin.isidentifier() else F.expr(uin)
        bucket = F.pmod(F.xxhash64(ucol), F.lit(N_BUCKETS))
        arm = F.when(idx == F.lit(v0), 0).when(idx == F.lit(v1), 1)
        sums = [F.sum(F.expr(e).cast("double")).alias(f"b{i}")
                for i, e in enumerate(base)]
        b = (df.where(arm.isNotNull())
               .groupBy(arm.alias("arm"), bucket.alias("bucket"))
               .agg(*sums))
        present = {r["arm"] for r in b.select("arm").distinct().collect()}
        if present != {0, 1}:
            raise ValueError(
                f"sum-metric xexpt needs rows in both arms; "
                f"present arms: {sorted(present)}")
        # the reference's bucket semantics are FIXED 128 buckets per arm:
        # sparse arms must contribute zero observations for empty buckets,
        # else mean = avg(bucket sums)/(ratio/128) inflates. Right-join the
        # (tiny) bucket relation against the full 0..127 × {0,1} grid.
        sess = df.sparkSession
        grid = (sess.range(N_BUCKETS).select(F.col("id").alias("bucket"))
                .crossJoin(sess.range(2).select(F.col("id").cast("int").alias("arm"))))
        b = (grid.join(b, ["arm", "bucket"], "left")
                 .na.fill({f"b{i}": 0.0 for i in range(k)}))
        # stage 2: sufficient stats over the (tiny) bucket relation; the
        # denominator observation becomes the arm's traffic share
        den_i = base.index(denominator.strip()) if denominator.strip() in base else 1
        repl = [F.col(f"b{i}") if i != den_i else
                F.lit(float(group_buckets[0])).alias("r")  # placeholder
                for i in range(k)]
        _ = repl
        # NB: bare "1.0/128" parses as DECIMAL in Spark SQL and rounds to
        # 0.007813 — route through repr() + string cast for an exact double
        r0, r1 = (float(group_buckets[0]) / N_BUCKETS,
                  float(group_buckets[1]) / N_BUCKETS)
        exprs = []
        for i in range(k):
            if i == den_i:
                exprs.append(
                    f"CASE WHEN arm = 0 THEN CAST('{r0!r}' AS DOUBLE) "
                    f"ELSE CAST('{r1!r}' AS DOUBLE) END")
            else:
                exprs.append(f"b{i}")
        aggs = (suffstat_agg_columns(exprs, "g0_", F.col("arm") == 0)
                + suffstat_agg_columns(exprs, "g1_", F.col("arm") == 1)
                + [F.sum(F.when(F.col("arm") == 0, F.col(f"b{den_i}"))).alias("den0__"),
                   F.sum(F.when(F.col("arm") == 1, F.col(f"b{den_i}"))).alias("den1__")])
        row = b.agg(*aggs).collect()[0]
        s0 = row_to_stats(row, k, "g0_")
        s1 = row_to_stats(row, k, "g1_")
        den_sums = (float(row["den0__"]), float(row["den1__"]))

    # delta-method means/vars (+CUPED pooled θ)
    if xnodes:
        from fast_causal_inference_spark.operators.suffstats import merge_stats

        pooled = merge_stats(s0, s1)
        theta = core.cuped_theta(pooled, ynode, xnodes)
        mean0, var0 = core.arm_mean_var(s0, ynode, xnodes, pooled, theta)
        mean1, var1 = core.arm_mean_var(s1, ynode, xnodes, pooled, theta)
    else:
        mean0, var0 = core.arm_mean_var(s0, ynode, None)
        mean1, var1 = core.arm_mean_var(s1, ynode, None)

    num_i = base.index(numerator.strip()) if numerator.strip() in base else 0
    den_i2 = base.index(denominator.strip()) if denominator.strip() in base else 1
    if metric_type == "avg":
        num_sums = (s0.means[num_i] * s0.n, s1.means[num_i] * s1.n)
        den_disp = (s0.means[den_i2] * s0.n, s1.means[den_i2] * s1.n)
    else:
        num_sums = (s0.means[num_i] * s0.n, s1.means[num_i] * s1.n)
        den_disp = (float(group_buckets[0]), float(group_buckets[1]))

    estimate = mean1 - mean0
    stderr = math.sqrt(var0 + var1)
    t_stat = estimate / stderr if stderr > 0 else float("nan")
    p_value = core.p_value(t_stat, "two-sided")
    count = s0.n + s1.n
    lower, upper = core.confidence_interval(estimate, stderr, count, alpha,
                                            "two-sided")
    diff_relative = estimate / mean0
    lower_rel, upper_rel = lower / mean0, upper / mean0

    # per-arm per-denominator-unit std (reference std_samp)
    std_samp0 = math.sqrt(max(var0, 0.0) * den_disp[0]) if metric_type == "sum" \
        else math.sqrt(max(var0 * s0.n, 0.0)) * math.sqrt(den_disp[0]) / math.sqrt(s0.n)
    std_samp1 = math.sqrt(max(var1, 0.0) * den_disp[1]) if metric_type == "sum" \
        else math.sqrt(max(var1 * s1.n, 0.0)) * math.sqrt(den_disp[1]) / math.sqrt(s1.n)

    # power / MDE / recommended samples (reference xexpt_ttest_2samp.h:505-522)
    z_a2 = float(dist.norm_ppf(1 - alpha / 2))
    z_a2_lo = float(dist.norm_ppf(alpha / 2))
    shift = abs(mean0 * mde) / stderr
    power_at_mde = float(1 - dist.norm_cdf(z_a2 - shift)
                         + dist.norm_cdf(z_a2_lo - shift))
    mde_at_power = (z_a2 + float(dist.norm_ppf(power))) * stderr / mean0
    std_ratio = std_samp0 / std_samp1 if std_samp1 > 0 else float("nan")
    cnt_ratio = den_disp[0] / den_disp[1] if den_disp[1] else float("nan")
    alpha_power = z_a2 - float(dist.norm_ppf(1 - power))
    recommend = ((std_ratio ** 2 + cnt_ratio) / cnt_ratio) * alpha_power ** 2 \
        * (std_samp1 / mean0) ** 2 / mde ** 2

    import pandas as pd

    return pd.DataFrame([{
        "groupname0": v0, "groupname1": v1,
        "numerator0": num_sums[0], "numerator1": num_sums[1],
        ("denominator0" if metric_type == "avg" else "ratio0"): den_disp[0],
        ("denominator1" if metric_type == "avg" else "ratio1"): den_disp[1],
        "mean0": mean0, "mean1": mean1,
        "std_samp0": std_samp0, "std_samp1": std_samp1,
        "diff": estimate, "diff_relative": diff_relative,
        "lower": lower, "upper": upper,
        "lower_relative": lower_rel, "upper_relative": upper_rel,
        "p_value": p_value, "t_stat": t_stat,
        "power": power_at_mde, "recommend_samples": float(np.floor(recommend + 0.5)),
        "mde": mde_at_power,
    }])


def xexpt_ttest_2samp_spark(df: DataFrame, *args, **kwargs) -> DataFrame:
    """Spark-DataFrame wrapper for the correctness gate."""
    skip = {"groupname0", "groupname1", *(kwargs.get("group_cols") or [])}
    pdf = xexpt_ttest_2samp(df, *args, **kwargs)
    return df.sparkSession.createDataFrame(
        pdf.astype({c: float for c in pdf.columns if c not in skip}))
