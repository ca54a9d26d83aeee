"""Group-sequential boundaries vs published Lan-DeMets tables + monitor."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from fast_causal_inference_spark.operators.sequential import (
    alpha_spending,
    group_sequential_boundaries,
    group_sequential_ttest,
)


def test_obf_boundaries_match_published_table():
    # Lan-DeMets OBF-spending, 5 equally spaced looks, TWO-SIDED 0.05
    # (Lan & DeMets 1983; the oft-quoted 4.877... row is the one-sided
    # 0.025 variant): 4.383, 3.100, 2.553, 2.254, 2.064
    got = group_sequential_boundaries([0.2, 0.4, 0.6, 0.8, 1.0],
                                      alpha=0.05, style="obf")
    want = np.array([4.3826, 3.0997, 2.5534, 2.2539, 2.0636])
    assert np.allclose(got, want, atol=4e-3), got


def test_pocock_boundaries_match_published_table():
    # Lan-DeMets Pocock-spending, 5 looks, 0.05: ~2.438, 2.427, 2.410,
    # 2.397, 2.383 (gsDesign sfLDPocock)
    got = group_sequential_boundaries([0.2, 0.4, 0.6, 0.8, 1.0],
                                      alpha=0.05, style="pocock")
    want = np.array([2.4380, 2.4268, 2.4101, 2.3966, 2.3831])
    assert np.allclose(got, want, atol=5e-3), got


def test_single_look_reduces_to_fixed_test():
    got = group_sequential_boundaries([1.0], alpha=0.05)
    assert abs(got[0] - 1.959963984540054) < 1e-6


def test_total_crossing_probability_is_alpha():
    # Monte Carlo under H0: the walk crosses ANY boundary w.p. ~alpha
    fracs = [0.25, 0.5, 0.75, 1.0]
    b = group_sequential_boundaries(fracs, alpha=0.05, style="obf")
    rng = np.random.default_rng(3)
    n_sim = 200_000
    taus = np.diff([0.0] + fracs)
    s = np.zeros(n_sim)
    crossed = np.zeros(n_sim, dtype=bool)
    for tau, t_k, bk in zip(taus, fracs, b):
        s = s + rng.normal(0, np.sqrt(tau), n_sim)
        crossed |= np.abs(s / np.sqrt(t_k)) >= bk
    rate = crossed.mean()
    assert abs(rate - 0.05) < 0.003, rate


def test_spending_monotone_and_terminal():
    for style in ("obf", "pocock"):
        sp = [alpha_spending(t, 0.05, style)
              for t in (0.1, 0.3, 0.6, 1.0)]
        assert all(b > a for a, b in zip(sp, sp[1:]))
        assert abs(sp[-1] - 0.05) < 1e-9
    with pytest.raises(ValueError):
        alpha_spending(0.0)
    with pytest.raises(ValueError):
        group_sequential_boundaries([0.5, 0.4])


@pytest.fixture(scope="module")
def looks_df(spark):
    # 4 weekly looks, true effect +0.5 sd from week 2 on
    return (spark.range(40000)
            .withColumn("week", (F.col("id") % 4 + 1).cast("int"))
            .withColumn("arm", ((F.col("id") / 4) % 2).cast("int"))
            .withColumn("y",
                        F.pmod(F.xxhash64("id", F.lit(9)), F.lit(1000))
                        .cast("double") / 288.675  # ~U*sd->1.0
                        + 0.25 * F.col("arm")))


def test_group_sequential_ttest(looks_df):
    out = group_sequential_ttest(looks_df, "y", "arm", "week")
    assert list(out["look"]) == [1, 2, 3, 4]
    assert out["info_fraction"].iloc[-1] == 1.0
    # boundaries decrease over looks (OBF shape)
    bs = out["boundary"].to_numpy()
    assert (np.diff(bs) < 0).all()
    # cumulative z grows with information under a real effect
    assert out["z"].iloc[-1] > 2.0
    assert bool(out["crossed"].any())
    # alpha spent is the spending function at the realized fractions
    assert np.isclose(out["alpha_spent"].iloc[-1], 0.05)


def test_interim_monitoring_with_planned_info(looks_df):
    # at look 2 of 4 with the PLANNED final information, the boundary
    # must be the interim OBF one, not the fixed-test 1.96
    interim = looks_df.where("week <= 2")
    full = group_sequential_ttest(looks_df, "y", "arm", "week")
    total = (1.0 / (1.0 / full["n0"].iloc[-1]
                    + 1.0 / full["n1"].iloc[-1]))
    out = group_sequential_ttest(interim, "y", "arm", "week",
                                 total_info=total)
    assert out["info_fraction"].iloc[-1] == pytest.approx(0.5, abs=0.01)
    # spending gives ~2.77 at t=0.5 (alpha(0.5)=0.0083), far above the
    # 1.96 the naive treat-now-as-final default would use
    assert out["boundary"].iloc[-1] > 2.5
    import pytest as _pt
    with _pt.raises(ValueError, match="below the information"):
        group_sequential_ttest(looks_df, "y", "arm", "week",
                               total_info=total / 10)


def test_conditional_power_vs_simulation():
    from fast_causal_inference_spark.operators.sequential import (
        conditional_power,
    )

    rng = np.random.default_rng(13)
    for z_k, t in [(1.2, 0.4), (2.2, 0.6), (-0.5, 0.3)]:
        s_t = z_k * np.sqrt(t)
        theta = s_t / t            # current trend
        n = 400_000
        s1 = s_t + theta * (1 - t) + rng.normal(0, np.sqrt(1 - t), n)
        zc = 1.959963984540054
        mc = (s1 >= zc).mean() if z_k >= 0 else (s1 <= -zc).mean()
        got = conditional_power(z_k, t)
        assert abs(got - mc) < 3e-3, (z_k, t, got, mc)
    # limits: overwhelming interim z -> CP ~ 1; H0 drift deflates CP
    assert conditional_power(5.0, 0.9) > 0.999
    assert conditional_power(1.2, 0.4, drift=0.0) < \
        conditional_power(1.2, 0.4)
    import pytest as _pt
    with _pt.raises(ValueError):
        conditional_power(1.0, 1.0)
