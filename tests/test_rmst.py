"""RMST: hand-computed small example, exponential DGP, group diff."""

import numpy as np
import pandas as pd
import pytest

from fast_causal_inference_spark.operators.survival import rmst


def test_hand_computed(spark):
    # events at 1,2 (d=1 each), censor at 3; n=3; tau=2.5
    pdf = pd.DataFrame({"t": [1.0, 2.0, 3.0], "e": [1, 1, 0]})
    out = rmst(spark.createDataFrame(pdf), "t", "e", tau=2.5)
    # S=1 on [0,1), 2/3 on [1,2), 1/3 on [2,2.5] ->
    # mu = 1 + 2/3 + 1/3*0.5 = 1.8333...
    mu = 1 + 2 / 3 + 0.5 / 3
    assert out.rmst.iloc[0] == pytest.approx(mu, rel=1e-12)
    # Klein variance: A1 = 2/3 + 1/6 = 5/6 over t1 (n=3,d=1);
    # A2 = 1/6 over t2 (n=2,d=1)
    v = (5 / 6) ** 2 * 1 / (3 * 2) + (1 / 6) ** 2 * 1 / (2 * 1)
    assert out.stderr.iloc[0] == pytest.approx(np.sqrt(v), rel=1e-12)
    assert out.events.iloc[0] == 2.0


def test_exponential_truth_and_tau_monotone(spark):
    rng = np.random.default_rng(6)
    n = 20000
    lam = 0.5
    t = rng.exponential(1 / lam, n)
    c = rng.exponential(6.0, n)
    pdf = pd.DataFrame({"t": np.round(np.minimum(t, c), 2),
                        "e": (t <= c).astype(float)})
    sdf = spark.createDataFrame(pdf)
    tau = 3.0
    out = rmst(sdf, "t", "e", tau=tau)
    truth = (1 - np.exp(-lam * tau)) / lam      # ∫ e^{-λt} on [0,τ]
    assert out.rmst.iloc[0] == pytest.approx(truth, abs=0.03)
    assert out.lower.iloc[0] < truth < out.upper.iloc[0]
    out2 = rmst(sdf, "t", "e", tau=1.5)
    assert out2.rmst.iloc[0] < out.rmst.iloc[0] <= tau


def test_group_difference(spark):
    rng = np.random.default_rng(8)
    n = 8000
    g = rng.integers(0, 2, n)
    t = rng.exponential(np.where(g == 1, 3.0, 2.0))
    c = rng.exponential(8.0, n)
    pdf = pd.DataFrame({"t": np.round(np.minimum(t, c), 2),
                        "e": (t <= c).astype(float), "g": g})
    out = rmst(spark.createDataFrame(pdf), "t", "e", tau=4.0, group="g")
    assert len(out) == 3
    truth1 = 3.0 * (1 - np.exp(-4.0 / 3.0))
    truth0 = 2.0 * (1 - np.exp(-4.0 / 2.0))
    by = out.set_index("group")
    assert by.loc[1, "rmst"] == pytest.approx(truth1, abs=0.06)
    assert by.loc[0, "rmst"] == pytest.approx(truth0, abs=0.06)
    diff_row = out.iloc[2]
    assert abs(diff_row.rmst) == pytest.approx(truth1 - truth0, abs=0.09)
    assert out.attrs["p_value"] < 1e-6          # clearly separated groups
    se = np.sqrt(by.loc[1, "stderr"] ** 2 + by.loc[0, "stderr"] ** 2)
    assert diff_row.stderr == pytest.approx(se, rel=1e-12)


def test_validation(spark):
    pdf = pd.DataFrame({"t": [1.0], "e": [1]})
    with pytest.raises(ValueError, match="tau"):
        rmst(spark.createDataFrame(pdf), "t", "e", tau=0.0)
