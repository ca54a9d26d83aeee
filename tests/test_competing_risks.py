"""Aalen-Johansen cumulative incidence: hand-computed small example,
single-cause reduction to 1-KM, and the CIF/KM additivity identity."""

import numpy as np
import pandas as pd
import pytest

from fast_causal_inference_spark.operators.survival import (
    aalen_johansen,
    kaplan_meier,
)


def test_hand_computed_example(spark):
    # times: 1(c1) 2(c2) 3(cens) 4(c1) 5(cens); n=5
    pdf = pd.DataFrame({"t": [1.0, 2.0, 3.0, 4.0, 5.0],
                        "e": [1, 2, 0, 1, 0]})
    out = aalen_johansen(spark.createDataFrame(pdf), "t", "e")
    # S(t-): 1, 4/5, 3/5, 3/5, ... ; AJ increments s_prev*d_k/n
    c1 = out[out.cause == 1].set_index("time")
    c2 = out[out.cause == 2].set_index("time")
    assert c1.loc[1.0, "cif"] == pytest.approx(1 / 5)
    assert c2.loc[2.0, "cif"] == pytest.approx((4 / 5) * (1 / 4))
    # cause-1 jump at t=4: S(4-) = (4/5)(3/4) = 3/5, n_risk = 2
    assert c1.loc[4.0, "cif"] == pytest.approx(1 / 5 + (3 / 5) * (1 / 2))
    # flat between jumps
    assert c1.loc[2.0, "cif"] == pytest.approx(1 / 5)
    assert c1.loc[5.0, "cif"] == pytest.approx(c1.loc[4.0, "cif"])
    assert (out.se >= 0).all()


@pytest.fixture(scope="module")
def cr_pdf():
    rng = np.random.default_rng(9)
    n = 3000
    t1 = rng.exponential(10, n)
    t2 = rng.exponential(15, n)
    c = rng.exponential(20, n)
    t = np.minimum(np.minimum(t1, t2), c)
    e = np.where(t == c, 0, np.where(t == t1, 1, 2))
    g = rng.integers(0, 2, n)
    return pd.DataFrame({"t": np.round(t, 1), "e": e, "g": g})


def test_additivity_identity(spark, cr_pdf):
    sdf = spark.createDataFrame(cr_pdf).repartition(8)
    aj = aalen_johansen(sdf, "t", "e")
    km = kaplan_meier(sdf.withColumn(
        "any_e", (sdf.e != 0).cast("int")), "t", "any_e")
    # sum_k CIF_k(t) = 1 - S_allcause(t) at every distinct time
    tot = (aj.pivot_table(index="time", columns="cause", values="cif")
             .sum(axis=1))
    s = km.set_index("time").survival
    merged = pd.concat([tot.rename("cif_sum"), s], axis=1).dropna()
    assert len(merged) == len(tot)
    assert np.allclose(merged.cif_sum, 1 - merged.survival, atol=1e-12)


def test_single_cause_reduces_to_km(spark, cr_pdf):
    one = cr_pdf.copy()
    one["e"] = (one.e != 0).astype(int)         # collapse causes
    sdf = spark.createDataFrame(one)
    aj = aalen_johansen(sdf, "t", "e")
    km = kaplan_meier(sdf, "t", "e")
    m = aj.set_index("time").join(km.set_index("time"), rsuffix="_km")
    assert np.allclose(m.cif, 1 - m.survival, atol=1e-12)
    # MV variance ~ Greenwood for one cause (same asymptotics)
    gw = (1 - m.cif).to_numpy() * np.sqrt(np.maximum(
        ((m.n_event / (m.n_risk * (m.n_risk - m.n_event)))
         .replace([np.inf, -np.inf], 0).fillna(0)).cumsum(), 0))
    nz = m.se.to_numpy() > 1e-12
    assert np.allclose(m.se.to_numpy()[nz], gw[nz], rtol=0.15)


def test_groups_and_monotonicity(spark, cr_pdf):
    sdf = spark.createDataFrame(cr_pdf)
    aj = aalen_johansen(sdf, "t", "e", group="g")
    assert set(aj.g.unique()) == {0, 1}
    for (_, _), sub in aj.groupby(["g", "cause"]):
        cif = sub.sort_values("time").cif.to_numpy()
        assert (np.diff(cif) >= -1e-12).all()
        assert cif[-1] <= 1.0 + 1e-12
    # cause 1 (faster hazard) dominates cause 2 at late times in each group
    late = aj[aj.time > 15].groupby(["g", "cause"]).cif.max()
    for g in (0, 1):
        assert late[(g, 1)] > late[(g, 2)]


def test_validation(spark, cr_pdf):
    sdf = spark.createDataFrame(cr_pdf)
    with pytest.raises(ValueError, match="censored"):
        aalen_johansen(sdf.withColumn("e", sdf.e * 0), "t", "e")


def test_cif_difference_test(spark):
    from fast_causal_inference_spark.operators.survival import (
        cif_difference_test,
    )

    rng = np.random.default_rng(31)
    n = 6000
    g = rng.integers(0, 2, n)
    # group 1 has double the cause-1 hazard; cause-2 hazard shared
    t1 = rng.exponential(np.where(g == 1, 5.0, 10.0))
    t2 = rng.exponential(12.0, n)
    c = rng.exponential(15.0, n)
    t = np.minimum(np.minimum(t1, t2), c)
    e = np.where(t == c, 0, np.where(t == t1, 1, 2))
    pdf = pd.DataFrame({"t": np.round(t, 1), "e": e, "g": g})
    sdf = spark.createDataFrame(pdf)
    out = cif_difference_test(sdf, "t", "e", cause=1, group="g", tau=6.0)
    r = out.iloc[0]
    # group 1 accumulates clearly more cause-1 failures by tau
    assert r.group_b == 0 and r.group_a == 1 or r.group_a == 0
    hi = r.cif_a if r.group_a == 1 else r.cif_b
    lo = r.cif_b if r.group_a == 1 else r.cif_a
    assert hi > lo + 0.05
    assert r.p_value < 1e-6
    assert r.lower < r.cif_diff < r.upper
    # cause-2 hazards are IDENTICAL, yet the CIFs differ — the classic
    # competing-risks phenomenon: group 1's doubled cause-1 hazard
    # removes subjects first, so group 1 accumulates FEWER cause-2
    # failures; assert that direction (and a smaller gap than cause 1)
    out2 = cif_difference_test(sdf, "t", "e", cause=2, group="g", tau=6.0)
    r2 = out2.iloc[0]
    cif2 = {r2.group_a: r2.cif_a, r2.group_b: r2.cif_b}
    assert cif2[1] < cif2[0]
    assert abs(r2.cif_diff) < abs(r.cif_diff)
    with pytest.raises(ValueError, match="cause"):
        cif_difference_test(sdf, "t", "e", cause=9, group="g", tau=6.0)
    with pytest.raises(ValueError, match="tau"):
        cif_difference_test(sdf, "t", "e", cause=1, group="g", tau=-1)


def test_weighted_km(spark, cr_pdf):
    from fast_causal_inference_spark.operators.survival import kaplan_meier

    one = cr_pdf.copy()
    one["e"] = (one.e != 0).astype(int)
    sdf = spark.createDataFrame(one)
    # weight 1 == unweighted
    base = kaplan_meier(sdf, "t", "e")
    w1 = kaplan_meier(sdf, "t", "e", weight="1.0")
    assert np.allclose(base.survival, w1.survival)
    # integer weight k == replicating each row k times
    k = (np.arange(len(one)) % 3 + 1)
    rep = one.loc[one.index.repeat(k)].reset_index(drop=True)
    wdf = spark.createDataFrame(one.assign(w=k.astype(float)))
    w_km = kaplan_meier(wdf, "t", "e", weight="w")
    r_km = kaplan_meier(spark.createDataFrame(rep), "t", "e")
    m = w_km.set_index("time").join(r_km.set_index("time"), rsuffix="_r")
    assert np.allclose(m.survival, m.survival_r, atol=1e-12)
    assert np.allclose(m.n_risk, m.n_risk_r, atol=1e-9)
