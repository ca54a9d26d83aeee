"""Edgeworth-corrected one-sided t-test p-values (round 10).

The reference gateway grammar parses an ``edgeworthtest`` token
(Parser.jj:2200, SqlForwardTest edgeWorthTestClickHouse) and forwards a
trailing boolean, but the engine snapshot carries no Edgeworth branch —
here the surface is implemented for real: the one-term studentized
Edgeworth expansion P(T <= x) ~ Phi(x) + gamma_eff (2x^2+1)/6 phi(x)
(Hall), with gamma_eff = (mu3_1/n1^2 - mu3_0/n0^2)/V^1.5 from the
per-arm third central moments of the delta-method influence values.

The Monte-Carlo test below pins the SIGN and magnitude of the
polynomial against 40k simulated two-sample t statistics on skewed
data — a wrong sign or the non-studentized polynomial (x^2-1 with a
minus) fails it."""

import math

import numpy as np
import pandas as pd
import pytest

from fast_causal_inference_spark.operators._ttest_core import edgeworth_p
from fast_causal_inference_spark.operators.ttest import ttest_2samp


def _mc_t_stats(n0, n1, draws, seed):
    """Two-sample Welch t on exponential(1) arms, vectorized."""
    rng = np.random.default_rng(seed)
    x0 = rng.exponential(1.0, (draws, n0))
    x1 = rng.exponential(1.0, (draws, n1))
    d = x1.mean(axis=1) - x0.mean(axis=1)
    v = x0.var(axis=1, ddof=1) / n0 + x1.var(axis=1, ddof=1) / n1
    return d / np.sqrt(v)


def test_edgeworth_polynomial_sign_against_monte_carlo():
    """Empirical P(T <= x) on skewed small-sample data must be closer
    to the Edgeworth CDF than to Phi(x) at moderate x — this pins the
    studentized polynomial +gamma(2x^2+1)/6 (both a flipped sign and
    the non-studentized (x^2-1) form are farther from truth)."""
    n0 = n1 = 15
    t = _mc_t_stats(n0, n1, 40_000, 11)
    # population gamma_eff for exp(1): mu3 = 2, sigma^2 = 1
    V = 1.0 / n0 + 1.0 / n1
    gam = (2.0 / n1 ** 2 - 2.0 / n0 ** 2) / V ** 1.5  # = 0 symmetric!
    assert gam == 0.0
    # asymmetric arm sizes give a real skew term (gamma_eff ~ 0.35;
    # still inside the one-term expansion's validity — at extreme
    # gamma ~ 0.5+ the O(gamma^2) term bites in the far tail)
    n0, n1 = 60, 15
    t = _mc_t_stats(n0, n1, 60_000, 13)
    V = 1.0 / n0 + 1.0 / n1
    gam = (2.0 / n1 ** 2 - 2.0 / n0 ** 2) / V ** 1.5
    from fast_causal_inference_spark import stats_distributions as dist

    for x in (-1.5, -0.5, 0.5, 1.5):
        emp = float((t <= x).mean())
        phi = math.exp(-x * x / 2) / math.sqrt(2 * math.pi)
        edge = dist.norm_cdf(x) + gam * (2 * x * x + 1) / 6 * phi
        plain = dist.norm_cdf(x)
        assert abs(edge - emp) < abs(plain - emp), (x, emp, edge, plain)
        # edgeworth_p('less') is exactly this CDF (clipped)
        assert edgeworth_p(x, gam, "less") == pytest.approx(
            min(1, max(0, edge)))


def test_edgeworth_p_properties():
    # two-sided invariant (first-order term cancels in the two tails)
    from fast_causal_inference_spark.operators._ttest_core import p_value

    for t in (-2.0, -0.3, 0.0, 1.7):
        assert edgeworth_p(t, 0.8, "two-sided") == p_value(t, "two-sided")
        # zero skew reduces to the normal p
        assert edgeworth_p(t, 0.0, "less") == pytest.approx(
            p_value(t, "less"))
    assert edgeworth_p(float("nan"), 0.5, "less") != edgeworth_p(
        float("nan"), 0.5, "less")            # NaN propagates
    assert 0.0 <= edgeworth_p(3.0, -5.0, "greater") <= 1.0  # clipped


def test_ttest_2samp_edgeworth_spark_matches_numpy(spark):
    """The Spark two-pass gamma (delta-method influence third moments)
    equals a numpy recompute on the same rows; p flows through
    edgeworth_p; symmetric data leaves p ~ unchanged."""
    rng = np.random.default_rng(21)
    n0, n1 = 400, 60
    y = np.concatenate([rng.exponential(2.0, n0),
                        rng.exponential(2.0, n1) + 0.2])
    tcol = np.r_[np.zeros(n0, int), np.ones(n1, int)]
    df = spark.createDataFrame(pd.DataFrame({"y": y, "t": tcol}))
    out = ttest_2samp(df, "avg(y)", "t", alternative="greater",
                      edgeworth=True).toPandas().iloc[0]
    plain = ttest_2samp(df, "avg(y)", "t", alternative="greater") \
        .toPandas().iloc[0]
    # numpy recompute: influence of avg(y) is y - mean(arm)
    mu3 = [float(np.mean((y[tcol == a] - y[tcol == a].mean()) ** 3))
           for a in (0, 1)]
    V = y[tcol == 0].var(ddof=1) / n0 + y[tcol == 1].var(ddof=1) / n1
    gam = (mu3[1] / n1 ** 2 - mu3[0] / n0 ** 2) / V ** 1.5
    want = edgeworth_p(float(plain["t_stat"]), gam, "greater")
    assert out["p_value"] == pytest.approx(want, rel=1e-6)
    assert out["t_stat"] == pytest.approx(float(plain["t_stat"]))
    assert out["p_value"] != pytest.approx(float(plain["p_value"]))
    # near-symmetric data: correction ~ vanishes
    ys = rng.normal(0, 1, n0 + n1)
    dfs = spark.createDataFrame(pd.DataFrame({"y": ys, "t": tcol}))
    oe = ttest_2samp(dfs, "avg(y)", "t", alternative="less",
                     edgeworth=True).toPandas().iloc[0]
    op = ttest_2samp(dfs, "avg(y)", "t", alternative="less") \
        .toPandas().iloc[0]
    assert oe["p_value"] == pytest.approx(float(op["p_value"]), abs=0.02)
    with pytest.raises(ValueError, match="ungrouped"):
        ttest_2samp(df, "avg(y)", "t", group_cols=["t"], edgeworth=True)


def test_edgeworth_gateway_forms(spark):
    """SqlForwardTest edgeWorthTestClickHouse:622-631: the trailing
    edgeworthtest token, plain and with a CUPED covariate."""
    from fast_causal_inference_spark.plans.sql_macros import sql

    rng = np.random.default_rng(3)
    n = 500
    pdf = pd.DataFrame({
        "lognorm_values": rng.lognormal(0, 1, n),
        "index": rng.integers(0, 2, n),
        "x_pre": rng.normal(0, 1, n)})
    spark.createDataFrame(pdf).createOrReplaceTempView("edgeworth")
    out = sql(spark, "select ttest_2samp(avg(lognorm_values)/avg(1), "
                     "index, 'less', edgeworthtest) from edgeworth")
    p_edge = out.toPandas().iloc[0]
    out2 = sql(spark, "select ttest_2samp(avg(lognorm_values)/avg(1), "
                      "index, 'less') from edgeworth").toPandas().iloc[0]
    assert not math.isnan(p_edge["p_value"])
    assert p_edge["t_stat"] == pytest.approx(float(out2["t_stat"]))
    assert p_edge["p_value"] != pytest.approx(float(out2["p_value"]))
    # CUPED + edgeworth combined form
    out3 = sql(spark, "select ttest_2samp(avg(lognorm_values)/avg(1), "
                      "index, 'less', avg(x_pre), edgeworthtest) "
                      "from edgeworth").toPandas().iloc[0]
    assert not math.isnan(out3["p_value"])
    assert out3["stderr"] <= p_edge["stderr"] * 1.05  # CUPED tightens


def test_edgeworth_components_consistency(spark):
    """edgeworth_components exposes the same arithmetic the edgeworth=True
    path consumes: identical corrected p, poly_term = gamma*(2t^2+1)/6,
    and per-arm skewness matching a direct numpy computation."""
    from fast_causal_inference_spark.operators.ttest import (
        edgeworth_components,
        ttest_2samp,
    )

    rng = np.random.default_rng(11)
    n0, n1 = 700, 650
    ys = np.concatenate([rng.lognormal(0, 1, n0),
                         rng.lognormal(0.05, 1, n1)])
    tcol = np.concatenate([np.zeros(n0, int), np.ones(n1, int)])
    df = spark.createDataFrame(pd.DataFrame({"y": ys, "t": tcol}))
    comp = edgeworth_components(df, "avg(y)", "t",
                                alternative="greater").toPandas().iloc[0]
    ref = ttest_2samp(df, "avg(y)", "t", alternative="greater",
                      edgeworth=True).toPandas().iloc[0]
    assert comp["p_value"] == pytest.approx(float(ref["p_value"]))
    assert comp["t_stat"] == pytest.approx(float(ref["t_stat"]))
    assert comp["stderr"] == pytest.approx(float(ref["stderr"]))
    t = comp["t_stat"]
    assert comp["poly_term"] == pytest.approx(
        comp["gamma_eff"] * (2 * t * t + 1) / 6)
    for arm, dat in ((0, ys[:n0]), (1, ys[n0:])):
        mu3 = float(np.mean((dat - dat.mean()) ** 3))
        skew = mu3 / float(np.mean((dat - dat.mean()) ** 2)) ** 1.5
        assert comp[f"skew{arm}"] == pytest.approx(skew, rel=1e-9)
    assert comp["n0"] == n0 and comp["n1"] == n1
