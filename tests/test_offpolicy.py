"""Off-policy evaluation: IPS / SNIPS / DR vs direct numpy recomputation."""

import numpy as np
import pandas as pd
import pytest

from fast_causal_inference_spark.operators.offpolicy import (
    ope_dr,
    ope_ips,
    ope_report,
    ope_snips,
)


@pytest.fixture(scope="module")
def logged_pdf():
    rng = np.random.default_rng(11)
    n = 4000
    x = rng.uniform(size=n)
    mu1 = 0.2 + 0.6 * x                       # behavior P(a=1|x)
    a = (rng.uniform(size=n) < mu1).astype(int)
    r = 1.0 + 2.0 * x + 1.5 * a + rng.normal(0, 0.3, n)
    mu_logged = np.where(a == 1, mu1, 1 - mu1)
    return pd.DataFrame({"x": x, "a": a, "r": r, "mu": mu_logged})


@pytest.fixture(scope="module")
def logged_sdf(spark, logged_pdf):
    return spark.createDataFrame(logged_pdf).repartition(8)


PI1 = 0.7          # target policy: choose a=1 w.p. 0.7 regardless of x


def _pi_logged(pdf):
    return np.where(pdf.a == 1, PI1, 1 - PI1)


def test_ips_matches_numpy(logged_sdf, logged_pdf):
    out = ope_ips(logged_sdf, "r",
                  "CASE WHEN a = 1 THEN 0.7 ELSE 0.3 END", "mu")
    w = _pi_logged(logged_pdf) / logged_pdf.mu.to_numpy()
    wr = w * logged_pdf.r.to_numpy()
    assert out.value.iloc[0] == pytest.approx(wr.mean(), rel=1e-12)
    assert out.stderr.iloc[0] == pytest.approx(
        wr.std(ddof=1) / np.sqrt(len(wr)), rel=1e-12)
    assert out.ess.iloc[0] == pytest.approx(w.sum() ** 2 / (w * w).sum(),
                                            rel=1e-12)
    assert out.lower.iloc[0] < out.value.iloc[0] < out.upper.iloc[0]


def test_ips_clip(logged_sdf, logged_pdf):
    out = ope_ips(logged_sdf, "r",
                  "CASE WHEN a = 1 THEN 0.7 ELSE 0.3 END", "mu", clip=1.5)
    w = np.minimum(_pi_logged(logged_pdf) / logged_pdf.mu.to_numpy(), 1.5)
    wr = w * logged_pdf.r.to_numpy()
    assert out.value.iloc[0] == pytest.approx(wr.mean(), rel=1e-12)
    with pytest.raises(ValueError, match="clip"):
        ope_ips(logged_sdf, "r", "0.7", "mu", clip=0.0)


def test_snips_matches_numpy(logged_sdf, logged_pdf):
    out = ope_snips(logged_sdf, "r",
                    "CASE WHEN a = 1 THEN 0.7 ELSE 0.3 END", "mu")
    w = _pi_logged(logged_pdf) / logged_pdf.mu.to_numpy()
    r = logged_pdf.r.to_numpy()
    v = (w * r).sum() / w.sum()
    assert out.value.iloc[0] == pytest.approx(v, rel=1e-12)
    phi = w * (r - v) / w.mean()
    assert out.stderr.iloc[0] == pytest.approx(
        phi.std(ddof=1) / np.sqrt(len(phi)), rel=1e-9)
    # SNIPS is translation-equivariant; IPS is not
    shifted = ope_snips(
        logged_sdf.selectExpr("x", "a", "mu", "r + 10 AS r"), "r",
        "CASE WHEN a = 1 THEN 0.7 ELSE 0.3 END", "mu")
    assert shifted.value.iloc[0] == pytest.approx(v + 10, rel=1e-9)


def test_dr_matches_numpy(logged_sdf, logged_pdf):
    out = ope_dr(logged_sdf, "r", "a", ["x"],
                 {1: "0.7", 0: "0.3"}, "mu")
    pdf = logged_pdf
    # per-action simple OLS r ~ x, closed form
    qhat = {}
    for act in (0, 1):
        sub = pdf[pdf.a == act]
        b = np.cov(sub.x, sub.r, ddof=1)[0, 1] / sub.x.var(ddof=1)
        qhat[act] = (sub.r.mean() - b * sub.x.mean(), b)
    q = {act: qhat[act][0] + qhat[act][1] * pdf.x.to_numpy()
         for act in (0, 1)}
    dm = PI1 * q[1] + (1 - PI1) * q[0]
    w = _pi_logged(pdf) / pdf.mu.to_numpy()
    q_logged = np.where(pdf.a == 1, q[1], q[0])
    phi = dm + w * (pdf.r.to_numpy() - q_logged)
    assert out.value.iloc[0] == pytest.approx(phi.mean(), rel=1e-10)
    assert out.stderr.iloc[0] == pytest.approx(
        phi.std(ddof=1) / np.sqrt(len(phi)), rel=1e-10)
    # DR value should sit near the analytic truth 1 + 2*E[x] + 1.5*0.7
    assert abs(out.value.iloc[0] - (1 + 2 * 0.5 + 1.5 * PI1)) < 0.1
    # variance no worse than IPS on this well-specified q
    ips = ope_ips(logged_sdf, "r",
                  "CASE WHEN a = 1 THEN 0.7 ELSE 0.3 END", "mu")
    assert out.stderr.iloc[0] < ips.stderr.iloc[0]


def test_dr_validation(logged_sdf):
    with pytest.raises(ValueError, match="target_probs"):
        ope_dr(logged_sdf, "r", "a", ["x"], {}, "mu")
    with pytest.raises(ValueError, match="never appear"):
        ope_dr(logged_sdf, "r", "a", ["x"], {7: "1.0"}, "mu")


def test_report_stacks_three(logged_sdf):
    rep = ope_report(logged_sdf, "r", "a", ["x"], {1: "0.7", 0: "0.3"},
                     "mu")
    assert list(rep.estimator) == ["ips", "snips", "dr"]
    # all three estimate the same value — they should agree within joint CI
    spread = rep.value.max() - rep.value.min()
    assert spread < 4 * rep.stderr.max()
