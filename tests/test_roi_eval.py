"""ROI / iROI / target-rate evaluation suite (uplift/roi.py) vs a
hand-computed pandas oracle on seeded data."""

import numpy as np
import pandas as pd
import pytest

from fast_causal_inference_spark.uplift import roi as R


@pytest.fixture(scope="module")
def trial(spark):
    rng = np.random.default_rng(7)
    n = 3000
    pdf = pd.DataFrame({
        "treatment": rng.integers(0, 2, n),
        "outcome": rng.normal(1.0, 1.0, n),
        "revenue": rng.gamma(3.0, 1.0, n),
        "cost": rng.gamma(1.0, 0.3, n),
        "score": rng.normal(0.0, 1.0, n),
    })
    return pdf, spark.createDataFrame(pdf)


def test_estimate_ate_matches_pandas(trial):
    pdf, df = trial
    out = R.estimate_ate(df)
    t, c = pdf[pdf.treatment == 1], pdf[pdf.treatment == 0]
    assert out.ate.iloc[0] == pytest.approx(
        t.outcome.mean() - c.outcome.mean(), abs=1e-10)
    assert out.treatment_count.iloc[0] == len(t)
    assert out.fraction.iloc[0] == 1.0


def test_estimate_roi_iroi_match_pandas(trial):
    pdf, df = trial
    assert R.estimate_roi(df).roi.iloc[0] == pytest.approx(
        pdf.revenue.sum() / pdf.cost.sum(), abs=1e-10)
    t, c = pdf[pdf.treatment == 1], pdf[pdf.treatment == 0]
    sf = len(t) / len(c)
    ib = t.revenue.sum() - c.revenue.sum() * sf
    ic = t.cost.sum() - c.cost.sum() * sf
    out = R.estimate_iroi(df)
    assert out.iroi.iloc[0] == pytest.approx(ib / ic, abs=1e-10)
    assert out.incremental_benefit.iloc[0] == pytest.approx(ib, rel=1e-12)


def test_assign_score_buckets_quantile_semantics(trial):
    pdf, df = trial
    b = R.assign_score_buckets(df, 5, "score").toPandas()
    assert b.bucket.nunique() == 5 and len(b) == len(pdf)
    # buckets partition the score axis in order
    mx = b.groupby("bucket").score.max().sort_index().to_numpy()
    mn = b.groupby("bucket").score.min().sort_index().to_numpy()
    assert (mx[:-1] <= mn[1:] + 1e-12).all()
    # threshold = left edge: -inf for bucket 0, else the bucket's min edge
    assert np.isneginf(b[b.bucket == 0].threshold).all()
    for k in range(1, 5):
        assert (b[b.bucket == k].score >= b[b.bucket == k].threshold.iloc[0]).all()
    # labels mode
    lab = R.assign_score_buckets(df, 3, "score", add_labels=True).toPandas()
    assert lab.bucket.str.startswith("[").all()


def test_cate_per_bucket_matches_groupby(trial):
    pdf, df = trial
    b = R.assign_score_buckets(df, 4, "score")
    out = R.estimate_cate_per_bucket(b.drop("threshold"), "bucket")
    bp = b.toPandas()
    exp = bp.groupby("bucket").apply(
        lambda g: g[g.treatment == 1].outcome.mean()
        - g[g.treatment == 0].outcome.mean(), include_groups=False)
    assert np.allclose(out.sort_values("bucket").ate.to_numpy(),
                       exp.sort_index().to_numpy())


def test_qini_cumulative_and_scores(trial):
    pdf, df = trial
    q = R.estimate_qini(df, n_buckets=5, score_colname="score")
    # zero anchor row
    assert q.fraction.iloc[0] == 0.0 and q.ate.iloc[0] == 0.0
    assert np.isinf(q.threshold.iloc[0])
    bp = R.assign_score_buckets(df, 5, "score").toPandas()
    n = len(bp)
    exp = []
    for bk in sorted(bp.bucket.unique(), reverse=True):
        sub = bp[bp.bucket >= bk]
        st, sc = sub[sub.treatment == 1], sub[sub.treatment == 0]
        exp.append((st.outcome.mean() - sc.outcome.mean()) * len(sub) / n)
    assert np.allclose(q.ate.to_numpy()[1:], exp, atol=1e-10)
    # final point of the curve = overall ATE (fraction 1)
    t, c = pdf[pdf.treatment == 1], pdf[pdf.treatment == 0]
    assert q.ate.iloc[-1] == pytest.approx(
        t.outcome.mean() - c.outcome.mean(), abs=1e-9)
    auuc = R.compute_auuc(q)
    qc = R.compute_qini_coefficient(q)
    # qini coefficient = auuc - random triangle
    rand = 0.5 * q.ate.iloc[-1] * (q.fraction.iloc[-1] - q.fraction.iloc[0])
    assert qc == pytest.approx(auuc - rand, abs=1e-12)


def test_cate_lift_is_cumulative_ate(trial):
    pdf, df = trial
    lift = R.estimate_cate_lift(df, n_buckets=4, score_colname="score")
    assert list(lift.columns[:3]) == ["bucket", "count", "fraction"]
    # last row (all buckets) = overall ATE
    t, c = pdf[pdf.treatment == 1], pdf[pdf.treatment == 0]
    assert lift.cum_cate.iloc[-1] == pytest.approx(
        t.outcome.mean() - c.outcome.mean(), abs=1e-9)
    assert lift.fraction.iloc[-1] == pytest.approx(1.0)
    assert (lift.bucket.to_numpy()[:-1] > lift.bucket.to_numpy()[1:]).all()


def test_cum_iroi_final_row_is_population_iroi(trial):
    pdf, df = trial
    cum = R.estimate_cum_iroi(df, n_buckets=4, score_colname="score")
    pop = R.estimate_iroi(df)
    assert cum.iroi.iloc[-1] == pytest.approx(pop.iroi.iloc[0], abs=1e-9)


def test_bootstrap_ci_brackets_point_estimate(trial):
    _, df = trial
    out = R.estimate_ate(df, bootstrap=True, n_bootstraps=40, seed=11)
    assert out.ate_lower.iloc[0] < out.ate.iloc[0] < out.ate_upper.iloc[0]
    assert out.ate_std_error.iloc[0] > 0
    # replica 0 is the unweighted point estimate
    pe = R.estimate_ate(df)
    assert out.ate.iloc[0] == pytest.approx(pe.ate.iloc[0], abs=1e-10)
    # deterministic under a fixed seed
    again = R.estimate_ate(df, bootstrap=True, n_bootstraps=40, seed=11)
    assert again.ate_std_error.iloc[0] == pytest.approx(
        out.ate_std_error.iloc[0], abs=1e-12)


def test_target_rate_per_quantile(trial):
    pdf, df = trial
    out = R.estimate_target_rate_per_quantile(
        df, n_buckets=3, score_colname="score", target_colname="outcome")
    bp = R.assign_score_buckets(df, 3, "score").toPandas()
    exp = bp.groupby("bucket").outcome.mean()
    assert np.allclose(out.sort_values("bucket").target_rate.to_numpy(),
                       exp.sort_index().to_numpy())


def test_hte_plot_and_model_io(trial, tmp_path):
    import fast_causal_inference_spark.uplift as up

    pdf, df = trial
    lg = up.get_lift_gain(df, "score", "outcome", "treatment", k=5)
    data = up.hte_plot([lg, lg], labels=["a"])
    assert [d["label"] for d in data] == ["a", "model_2"]
    assert data[0]["auuc"] == round(float(lg.gain.sum() / len(lg)), 2)
    f = tmp_path / "m.pkl"
    up.save_model({"model": [1, 2, 3]}, str(f))
    assert up.load_model(str(f)) == {"model": [1, 2, 3]}


def test_polynomial_features():
    from fast_causal_inference_spark.functions.features import (
        polynomial_features,
    )

    assert polynomial_features("x", 2) == ["pow(x,1)", "pow(x,2)"]


def test_estimate_economics_one_scan_matches_parts(trial):
    pdf, df = trial
    alle = R.estimate_economics(df)
    assert alle.ate.iloc[0] == pytest.approx(
        R.estimate_ate(df).ate.iloc[0], abs=1e-12)
    assert alle.roi.iloc[0] == pytest.approx(
        R.estimate_roi(df).roi.iloc[0], abs=1e-12)
    assert alle.iroi.iloc[0] == pytest.approx(
        R.estimate_iroi(df).iroi.iloc[0], abs=1e-12)
    assert alle.target_rate.iloc[0] == pytest.approx(
        pdf.outcome.mean(), abs=1e-12)
    boot = R.estimate_economics(df, bootstrap=True, n_bootstraps=20)
    for m in ("ate", "roi", "iroi", "target_rate"):
        assert f"{m}_std_error" in boot.columns
