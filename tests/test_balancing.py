"""Entropy balancing: exact moment match, analytic binary case,
bias removal on confounded data, infeasibility detection."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from fast_causal_inference_spark.operators.balancing import (
    entropy_balancing,
)


@pytest.fixture(scope="module")
def confounded_pdf():
    rng = np.random.default_rng(21)
    n = 5000
    x1 = rng.normal(size=n)
    x2 = rng.uniform(size=n)
    p = 1 / (1 + np.exp(-(x1 + 2 * x2 - 1)))
    t = (rng.uniform(size=n) < p).astype(int)
    y = 3.0 * t + 2.0 * x1 + 4.0 * x2 + rng.normal(0, 0.5, n)
    return pd.DataFrame({"x1": x1, "x2": x2, "t": t, "y": y})


@pytest.fixture(scope="module")
def confounded_sdf(spark, confounded_pdf):
    return spark.createDataFrame(confounded_pdf).repartition(8).cache()


def test_exact_moment_balance(confounded_sdf):
    eb = entropy_balancing(confounded_sdf, "t", ["x1", "x2", "x1*x1"])
    assert eb.converged
    w = eb.weight_column()
    r = confounded_sdf.agg(
        F.sum(F.when(F.col("t") == 1, F.col("x1"))).alias("t1"),
        F.sum(F.when(F.col("t") == 1, F.lit(1.0))).alias("n1"),
        *[F.sum(F.when(F.col("t") == 0, w * F.expr(e))).alias(f"c{i}")
          for i, e in enumerate(["x1", "x2", "x1*x1", "1.0"])],
        F.sum(F.when(F.col("t") == 1, F.col("x2"))).alias("t2"),
        F.sum(F.when(F.col("t") == 1, F.col("x1") * F.col("x1"))).alias("t3"),
    ).collect()[0]
    n1 = float(r["n1"])
    sw = float(r["c3"])
    assert sw == pytest.approx(n1, rel=1e-9)          # mass preserved
    for tm, cm in (("t1", "c0"), ("t2", "c1"), ("t3", "c2")):
        assert float(r[cm]) / sw == pytest.approx(
            float(r[tm]) / n1, abs=1e-8)               # moments EXACT


def test_binary_covariate_analytic(spark):
    # control: 300 rows x=1, 700 rows x=0; treated: 600/400 — the dual
    # has a closed form: w1/w0 = (p1/(1-p1)) / (p0/(1-p0))
    pdf = pd.DataFrame({
        "x": [1.0] * 300 + [0.0] * 700 + [1.0] * 600 + [0.0] * 400,
        "t": [0] * 1000 + [1] * 1000})
    sdf = spark.createDataFrame(pdf)
    eb = entropy_balancing(sdf, "t", ["x"])
    w = (sdf.where("t = 0")
         .select("x", eb.weight_column().alias("w"))
         .groupBy("x").agg(F.avg("w").alias("w")).toPandas()
         .set_index("x").w)
    # weighted control share of x=1 must equal the treated share 0.6:
    # 300*w1 = 0.6 * 1000, 700*w0 = 0.4 * 1000
    assert w[1.0] == pytest.approx(600 / 300, rel=1e-8)
    assert w[0.0] == pytest.approx(400 / 700, rel=1e-8)


def test_att_debiased(confounded_sdf, confounded_pdf):
    naive = (confounded_pdf.query("t==1").y.mean()
             - confounded_pdf.query("t==0").y.mean())
    assert abs(naive - 3.0) > 0.8                      # confounding is real
    eb = entropy_balancing(confounded_sdf, "t",
                           ["x1", "x2", "x1*x1", "x2*x2", "x1*x2"])
    att = eb.att(confounded_sdf, "y")
    assert att.ATT.iloc[0] == pytest.approx(3.0, abs=0.15)
    assert att.stderr.iloc[0] < 0.15
    assert att.lower.iloc[0] < 3.0 < att.upper.iloc[0]
    assert 0 < att.ess_control.iloc[0] <= eb.n_control


def test_infeasible_target_raises(spark):
    pdf = pd.DataFrame({"x": list(np.linspace(0, 1, 50)) + [2.0] * 50,
                        "t": [0] * 50 + [1] * 50})
    with pytest.raises(ValueError, match="convex hull|converge"):
        entropy_balancing(spark.createDataFrame(pdf), "x > -1 AND t = 1",
                          ["x"], treatment_value=True,
                          control_value=False)


def test_validation(confounded_sdf):
    with pytest.raises(ValueError, match="feature"):
        entropy_balancing(confounded_sdf, "t", [])
    with pytest.raises(ValueError, match="empty arm"):
        entropy_balancing(confounded_sdf.where("t = 1"), "t", ["x1"])
