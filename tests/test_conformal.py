"""Split-conformal ITE bands: exactness of the pieces + coverage."""

import numpy as np
import pandas as pd
import pytest

from fast_causal_inference_spark.operators.conformal import (
    conformal_fit,
    conformal_ite,
)


@pytest.fixture(scope="module")
def trial_pdf():
    rng = np.random.default_rng(5)
    n = 6000
    x1 = rng.uniform(-1, 1, n)
    x2 = rng.uniform(-1, 1, n)
    t = rng.integers(0, 2, n)
    # true ITE = 2 + x1; homoscedastic noise
    y0 = 1.0 + 0.5 * x1 - 0.3 * x2 + rng.normal(0, 0.5, n)
    ite = 2.0 + x1
    y = y0 + t * ite
    return pd.DataFrame({"x1": x1, "x2": x2, "t": t, "y": y,
                         "y1": y0 + ite, "y0": y0})


@pytest.fixture(scope="module")
def trial_sdf(spark, trial_pdf):
    return spark.createDataFrame(
        trial_pdf.drop(columns=["y1", "y0"])).repartition(8)


def test_band_structure_and_determinism(trial_sdf):
    m = conformal_fit(trial_sdf, "y", "t", ["x1", "x2"], alpha=0.1, seed=3)
    m2 = conformal_fit(trial_sdf.repartition(3), "y", "t", ["x1", "x2"],
                       alpha=0.1, seed=3)
    # fold hash is row-content based -> stable across layouts (up to
    # Gramian summation-order float jitter)
    assert m.q1 == pytest.approx(m2.q1, rel=1e-9)
    assert m.q0 == pytest.approx(m2.q0, rel=1e-9)
    assert np.allclose(m.mu1.beta, m2.mu1.beta, rtol=1e-9)
    assert m.q1 > 0 and m.q0 > 0
    out = m.transform(trial_sdf).limit(50).toPandas()
    w = out.ite_hi - out.ite_lo
    assert np.allclose(w, 2 * (m.q1 + m.q0))
    assert np.allclose(out.ite, out.mu1 - out.mu0)
    assert np.allclose(out.y1_hi - out.y1_lo, 2 * m.q1)


def test_counterfactual_coverage(spark, trial_pdf):
    # score the bands against the SIMULATED ground-truth potential outcomes
    sdf = spark.createDataFrame(trial_pdf.drop(columns=["y1", "y0"]))
    out = conformal_ite(sdf, "y", "t", ["x1", "x2"], alpha=0.1,
                        seed=3).toPandas()
    merged = out.merge(trial_pdf, on=["x1", "x2", "t", "y"])
    assert len(merged) == len(trial_pdf)
    cov1 = ((merged.y1 >= merged.y1_lo) & (merged.y1 <= merged.y1_hi)).mean()
    cov0 = ((merged.y0 >= merged.y0_lo) & (merged.y0 <= merged.y0_hi)).mean()
    # marginal guarantee is >= 90%; grant simulation slack downward
    assert cov1 > 0.88 and cov0 > 0.88
    # bands should not be badly conservative on this well-specified DGP
    assert cov1 < 0.97 and cov0 < 0.97
    ite = merged.y1 - merged.y0
    cov_ite = ((ite >= merged.ite_lo) & (ite <= merged.ite_hi)).mean()
    assert cov_ite > 0.9          # Bonferroni: >= 1 - 2*alpha
    # the point estimate tracks the true CATE shape
    r = np.corrcoef(merged.ite, 2.0 + merged.x1)[0, 1]
    assert r > 0.95


def test_conformal_quantile_is_exact_order_stat(spark):
    # tiny frame where the ceil((n+1)(1-alpha)) order statistic is known
    rng = np.random.default_rng(0)
    n = 39                        # per arm in calibration, roughly
    pdf = pd.DataFrame({
        "x": np.tile(np.linspace(0, 1, 20), 10),
        "t": np.repeat([0, 1], 100),
        "y": rng.normal(size=200),
    })
    sdf = spark.createDataFrame(pdf)
    m = conformal_fit(sdf, "y", "t", ["x"], alpha=0.2, seed=1)
    # recompute driver-side: same folds, same models, same scores
    h = sdf.selectExpr("x", "t", "y",
                       "pmod(xxhash64(x, 1), 2) AS fold").toPandas()
    for arm, (mu, q) in ((1, (m.mu1, m.q1)), (0, (m.mu0, m.q0))):
        cal = h[(h.t == arm) & (h.fold == 1)]
        pred = mu.beta[0] + mu.beta[1] * cal.x.to_numpy()
        s = np.sort(np.abs(cal.y.to_numpy() - pred))
        rank = int(np.ceil((len(s) + 1) * 0.8))
        assert q == pytest.approx(s[rank - 1], rel=1e-12)


def test_order_stat_bracket_refine_ties_and_edges(spark):
    # the bracket-and-refine selection must return EXACT order statistics
    # even when the distribution is tie-heavy (value mass sitting on the
    # bracket probes) and at the extreme ranks 1 and n
    from fast_causal_inference_spark.operators.conformal import (
        _order_stats_two_arms,
    )
    rng = np.random.default_rng(7)
    v1 = np.round(rng.normal(size=4001), 1)      # ~60 distinct values
    v0 = np.concatenate([np.full(2000, 3.25), rng.uniform(size=1501)])
    pdf = pd.DataFrame({
        "__arm": np.r_[np.ones(len(v1), int), np.zeros(len(v0), int)],
        "__s": np.r_[v1, v0]})
    sdf = spark.createDataFrame(pdf).repartition(7)
    for r1, r0 in ((1, 1), (len(v1), len(v0)),
                   (int(0.9 * len(v1)), int(0.9 * len(v0)))):
        q1, q0 = _order_stats_two_arms(sdf, r1, len(v1), r0, len(v0))
        assert q1 == pytest.approx(np.sort(v1)[r1 - 1], rel=1e-12)
        assert q0 == pytest.approx(np.sort(v0)[r0 - 1], rel=1e-12)


def test_validation_errors(trial_sdf):
    with pytest.raises(ValueError, match="alpha"):
        conformal_fit(trial_sdf, "y", "t", ["x1"], alpha=1.5)
    with pytest.raises(ValueError, match="feature"):
        conformal_fit(trial_sdf, "y", "t", [])
    with pytest.raises(ValueError, match="calibration|fit fold|n="):
        conformal_fit(trial_sdf.limit(4), "y", "t", ["x1"], alpha=0.01)


def test_guard_refusal_not_masked_by_fit_failure(trial_sdf, monkeypatch):
    """When the grouped fit itself blows up on degenerate low-cardinality
    X, the fold-guard's diagnostic ValueError must surface instead of the
    fit's exception (the guard job overlaps the fit — ADVICE r11)."""
    import pyspark.sql.functions as F

    from fast_causal_inference_spark.operators import conformal as mod

    def _boom(*a, **k):
        raise RuntimeError("synthetic grouped-fit failure")

    monkeypatch.setattr(mod, "ols_grouped", _boom)
    degenerate = trial_sdf.withColumn("x1", (F.col("x1") > 0).cast("double")) \
                          .withColumn("x2", F.lit(1.0))
    with pytest.raises(ValueError, match="distinct value cells"):
        mod.conformal_fit(degenerate, "y", "t", ["x1", "x2"], alpha=0.1,
                          seed=3)
    # non-degenerate X: the fit's own exception must still propagate
    with pytest.raises(RuntimeError, match="synthetic grouped-fit"):
        mod.conformal_fit(trial_sdf, "y", "t", ["x1", "x2"], alpha=0.1,
                          seed=3)
