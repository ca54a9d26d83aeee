"""Power/MDE/sample-size/effect-size vs closed-form identities."""

import math

import numpy as np
import pandas as pd
import pytest

from fast_causal_inference_spark.operators.power import (
    effect_size,
    mde_ttest,
    power_ttest,
    sample_size_ttest,
)


def test_power_sample_size_roundtrip():
    # the n recommended for (effect, power) must achieve >= that power
    n = sample_size_ttest(effect=0.2, std=1.0, power=0.8)
    p = power_ttest(0.2, 1.0, n, n)
    assert p >= 0.8
    assert power_ttest(0.2, 1.0, n * 0.8, n * 0.8) < p
    # classic closed form: n ≈ 2·(z_{.975}+z_{.8})²/d² ≈ 392.4 for d=0.2
    assert n == pytest.approx(393, abs=1)


def test_mde_power_consistency():
    mde = mde_ttest(std=1.0, n0=500, n1=500, power=0.8)
    assert power_ttest(mde, 1.0, 500, 500) == pytest.approx(0.8, abs=0.02)
    assert power_ttest(mde / 2, 1.0, 500, 500) < 0.5


def test_effect_size_matches_numpy(spark):
    rng = np.random.default_rng(4)
    n = 2000
    t = rng.integers(0, 2, n)
    y = 1.0 + 0.3 * t + rng.normal(0, 1.0, n)
    d = spark.createDataFrame(pd.DataFrame({"t": t, "y": y})).repartition(4)
    out = effect_size(d, "y", "t")
    y0, y1 = y[t == 0], y[t == 1]
    sp = math.sqrt(((len(y0) - 1) * y0.var(ddof=1)
                    + (len(y1) - 1) * y1.var(ddof=1))
                   / (len(y0) + len(y1) - 2))
    want_d = (y1.mean() - y0.mean()) / sp
    assert out.cohens_d[0] == pytest.approx(want_d, rel=1e-9)
    assert abs(out.hedges_g[0]) < abs(out.cohens_d[0])
    assert 0.0 < out.achieved_power[0] <= 1.0


def test_power_validations():
    with pytest.raises(ValueError):
        power_ttest(0.1, -1.0, 10, 10)
    assert sample_size_ttest(0.0, 1.0) == float("inf")


def test_proportion_power_textbook_values():
    from fast_causal_inference_spark.operators.power import (
        power_proportion,
        sample_size_proportion,
    )

    # classic conversion-rate designs (Fleiss normal approximation)
    assert abs(power_proportion(0.10, 0.12, 3841, 3841) - 0.8) < 0.005
    assert abs(sample_size_proportion(0.10, 0.12) - 3841) <= 2
    assert abs(sample_size_proportion(0.5, 0.6) - 388) <= 2
    # round trip: the recommended n achieves the requested power
    n = sample_size_proportion(0.2, 0.25, power=0.9)
    assert power_proportion(0.2, 0.25, n, n) >= 0.899
    import pytest as _pt
    with _pt.raises(ValueError):
        power_proportion(0.0, 0.5, 100, 100)
    assert sample_size_proportion(0.3, 0.3) == float("inf")


def test_icc_and_cluster_design(spark):
    import numpy as np
    import pandas as pd

    from fast_causal_inference_spark.operators.power import (
        design_effect,
        icc_oneway,
        sample_size_cluster_ttest,
        sample_size_ttest,
    )

    rng = np.random.default_rng(83)
    C, m = 100, 40
    cl = np.repeat(np.arange(C), m)
    sigma_b, sigma_w = 2.0, 3.0
    y = rng.normal(0, sigma_b, C)[cl] + rng.normal(0, sigma_w, C * m)
    df = spark.createDataFrame(pd.DataFrame({"cl": cl, "y": y}))
    res = icc_oneway(df, "y", "cl")
    true_icc = sigma_b ** 2 / (sigma_b ** 2 + sigma_w ** 2)
    assert res["icc"] == pytest.approx(true_icc, abs=0.06)
    assert res["n_clusters"] == C and res["n"] == C * m
    # balanced design: m_bar == m
    assert res["m_bar"] == pytest.approx(m, rel=1e-9)
    # design effect inflates the individual-randomized requirement
    d = sample_size_cluster_ttest(0.2, 1.0, m=m, icc=res["icc"])
    assert d["design_effect"] == pytest.approx(
        design_effect(m, res["icc"]), rel=1e-12)
    assert d["n_per_arm"] >= sample_size_ttest(0.2, 1.0)
    assert d["clusters_per_arm"] == pytest.approx(
        np.ceil(d["n_per_arm"] / m), rel=1e-12)


def test_schoenfeld_logrank_events():
    from fast_causal_inference_spark.operators.power import (
        events_logrank,
        sample_size_logrank,
    )

    # textbook value: HR=0.75, alpha=.05 two-sided, 80% power, 1:1 ->
    # d = (1.96+0.8416)^2 * 4 / ln(0.75)^2 = 379.5... -> 380
    assert events_logrank(0.75) == 380
    # symmetric in HR inversion
    assert events_logrank(0.75) == events_logrank(1 / 0.75)
    # stronger effects need fewer events; higher power needs more
    assert events_logrank(0.5) < events_logrank(0.75)
    assert events_logrank(0.75, power=0.9) > events_logrank(0.75)
    # unbalanced allocation is less efficient than 1:1
    assert events_logrank(0.75, ratio=3.0) > events_logrank(0.75)
    ss = sample_size_logrank(0.75, p_event=0.5)
    assert ss["n_total"] == np.ceil(380 / 0.5)
    assert ss["n_control"] + ss["n_treatment"] == ss["n_total"]
    with pytest.raises(ValueError, match="hazard_ratio"):
        events_logrank(1.0)
    with pytest.raises(ValueError, match="p_event"):
        sample_size_logrank(0.75, p_event=0.0)
