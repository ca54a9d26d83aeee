"""Synthetic control: weight recovery, effect recovery, placebo test."""

import numpy as np
import pandas as pd
import pytest


def _panel(effect=5.0, n_periods=30, t0=20, seed=59):
    """Treated unit = exact convex combo (0.6 A + 0.4 B) pre-period,
    plus a post-period treatment effect."""
    rng = np.random.default_rng(seed)
    t = np.arange(n_periods)
    base = {
        "A": 10 + 0.5 * t + 2 * np.sin(t / 3),
        "B": 20 - 0.2 * t + np.cos(t / 2),
        "C": 15 + 0.1 * t + rng.normal(0, 0.5, n_periods),
        "D": 12 + 0.3 * t + rng.normal(0, 0.5, n_periods),
    }
    base["T"] = 0.6 * base["A"] + 0.4 * base["B"]
    base["T"][t >= t0] += effect
    rows = [(u, int(ti), float(base[u][ti]))
            for u in base for ti in range(n_periods)]
    return pd.DataFrame(rows, columns=["unit", "time", "y"])


def test_synthetic_control_recovers_weights_and_effect(spark):
    from fast_causal_inference_spark.operators.synth import (
        synthetic_control,
    )

    pdf = _panel()
    out = synthetic_control(spark.createDataFrame(pdf), "unit", "time",
                            "y", "T", 20)
    w = dict(zip(out["weights"].unit, out["weights"].weight))
    assert w["A"] == pytest.approx(0.6, abs=0.02)
    assert w["B"] == pytest.approx(0.4, abs=0.02)
    assert out["att"] == pytest.approx(5.0, abs=0.1)
    assert out["pre_rmspe"] < 0.05
    # the treated unit has the most extreme RMSPE ratio -> smallest p
    assert out["p_value"] == pytest.approx(1 / 5, abs=1e-9)
    path = out["path"]
    assert (~path.is_post).sum() == 20 and path.is_post.sum() == 10
    pre_eff = path.loc[~path.is_post, "effect"].abs().max()
    assert pre_eff < 0.1


def test_synthetic_control_no_effect_high_p(spark):
    from fast_causal_inference_spark.operators.synth import (
        synthetic_control,
    )

    pdf = _panel(effect=0.0)
    out = synthetic_control(spark.createDataFrame(pdf), "unit", "time",
                            "y", "T", 20)
    assert abs(out["att"]) < 0.1
    assert out["p_value"] > 0.2          # nothing special about T


def test_synthetic_control_guards(spark):
    from fast_causal_inference_spark.operators.synth import (
        synthetic_control,
    )

    pdf = _panel()
    df = spark.createDataFrame(pdf)
    with pytest.raises(ValueError, match="not in panel"):
        synthetic_control(df, "unit", "time", "y", "Z", 20)
    with pytest.raises(ValueError, match="pre-treatment"):
        synthetic_control(df, "unit", "time", "y", "T", 1)
    with pytest.raises(ValueError, match="post-treatment"):
        synthetic_control(df, "unit", "time", "y", "T", 99)
    with pytest.raises(ValueError, match="unbalanced"):
        synthetic_control(
            spark.createDataFrame(pdf[~((pdf.unit == "C")
                                        & (pdf.time == 5))]),
            "unit", "time", "y", "T", 20)
    with pytest.raises(ValueError, match="max_cells"):
        synthetic_control(df, "unit", "time", "y", "T", 20, max_cells=10)


def test_simplex_lsq_exactness():
    from fast_causal_inference_spark.operators.synth import _simplex_lsq

    rng = np.random.default_rng(61)
    A = rng.normal(0, 1, (50, 4))
    w_true = np.array([0.1, 0.0, 0.7, 0.2])
    b = A @ w_true
    w = _simplex_lsq(A, b)
    assert np.allclose(w, w_true, atol=1e-4)
    assert w.min() >= -1e-12 and w.sum() == pytest.approx(1.0, abs=1e-9)


def test_placebo_pools_exclude_treated_unit(spark):
    """Abadie in-space placebos: the treated unit must not enter any
    placebo pool.  Precise detector: the donors' placebo ATTs must be
    IDENTICAL across treated-effect sizes — only T's post-period values
    differ between the panels, so any dependence means T's (treated)
    outcomes leaked into a placebo's synthetic path."""
    from fast_causal_inference_spark.operators.synth import (
        synthetic_control,
    )

    a = synthetic_control(spark.createDataFrame(_panel(effect=5.0)),
                          "unit", "time", "y", "T", 20)
    b = synthetic_control(spark.createDataFrame(_panel(effect=0.0)),
                          "unit", "time", "y", "T", 20)
    pa = dict(zip(a["placebo_att"].unit, a["placebo_att"].att))
    pb = dict(zip(b["placebo_att"].unit, b["placebo_att"].att))
    assert pa.keys() == pb.keys() and "T" not in pa
    for u in pa:
        assert pa[u] == pytest.approx(pb[u], rel=1e-9), u
    assert a["p_value"] == pytest.approx(1 / 5, abs=1e-9)


def test_synth_null_keys_dropped(spark):
    from fast_causal_inference_spark.operators.synth import (
        synthetic_control,
    )

    pdf = _panel()
    extra = pd.DataFrame({"unit": [None] * 30, "time": range(30),
                          "y": 999.0})
    base = synthetic_control(spark.createDataFrame(pdf), "unit", "time",
                             "y", "T", 20)
    out = synthetic_control(
        spark.createDataFrame(pd.concat([pdf, extra])), "unit", "time",
        "y", "T", 20)
    assert out["att"] == pytest.approx(base["att"], rel=1e-9)
    assert set(out["weights"].unit) == set(base["weights"].unit)


def test_simplex_lsq_anticorrelated_donors():
    """Exactly anticorrelated donors: the old power-iteration L estimate
    degenerated at the uniform start (null vector) and returned uniform
    weights without using b; the trace bound must still converge."""
    from fast_causal_inference_spark.operators.synth import _simplex_lsq

    a = np.linspace(1, 2, 40)
    A = np.column_stack([a, -a])
    w = _simplex_lsq(A, a.copy())
    assert w[0] == pytest.approx(1.0, abs=1e-6)
    assert w[1] == pytest.approx(0.0, abs=1e-6)
