"""Average marginal effects: numpy mirrors per family + identities."""

import numpy as np
import pandas as pd
import pytest

from fast_causal_inference_spark.operators.glm import glm
from fast_causal_inference_spark.operators.logistic import (
    logistic_regression,
)
from fast_causal_inference_spark.operators.margins import (
    average_marginal_effects,
)


@pytest.fixture(scope="module")
def margins_pdf():
    rng = np.random.default_rng(17)
    n = 3000
    x1 = rng.normal(size=n)
    x2 = rng.uniform(size=n)
    eta = -0.5 + 0.8 * x1 - 1.2 * x2
    pr = 1 / (1 + np.exp(-eta))
    yb = (rng.uniform(size=n) < pr).astype(float)
    yc = rng.poisson(np.exp(0.3 + 0.4 * x1 + 0.2 * x2))
    yg = eta + rng.normal(0, 0.5, n)
    return pd.DataFrame({"x1": x1, "x2": x2, "yb": yb,
                         "yc": yc.astype(float), "yg": yg})


@pytest.fixture(scope="module")
def margins_sdf(spark, margins_pdf):
    return spark.createDataFrame(margins_pdf).repartition(8).cache()


def _np_ame_logit(pdf, beta):
    X = np.column_stack([np.ones(len(pdf)), pdf.x1, pdf.x2])
    eta = X @ beta
    mu = 1 / (1 + np.exp(-eta))
    dmu = mu * (1 - mu)
    abar = dmu.mean()
    cvec = (dmu * (1 - 2 * mu))[:, None] * X
    cbar = cvec.mean(axis=0)
    A = (dmu[:, None, None] * X[:, :, None] * X[:, None, :]).sum(axis=0)
    cov = np.linalg.inv(A)
    ame = abar * beta[1:]
    J = np.zeros((2, 3))
    for r, bi in enumerate((1, 2)):
        J[r] = beta[bi] * cbar
        J[r, bi] += abar
    se = np.sqrt(np.diag(J @ cov @ J.T))
    return ame, se


def test_logit_matches_numpy(margins_sdf, margins_pdf):
    m = logistic_regression(margins_sdf, "yb ~ x1 + x2")
    out = average_marginal_effects(m, margins_sdf)
    ame, se = _np_ame_logit(margins_pdf, np.asarray(m.beta))
    assert out.ame.to_numpy() == pytest.approx(ame, rel=1e-9)
    assert out.stderr.to_numpy() == pytest.approx(se, rel=1e-7)
    # glm binomial-logit path agrees with the LogisticModel path
    g = glm(margins_sdf, "yb ~ x1 + x2", family="binomial")
    out_g = average_marginal_effects(g, margins_sdf)
    assert out_g.ame.to_numpy() == pytest.approx(out.ame.to_numpy(),
                                                 rel=1e-6)


def test_gaussian_ame_is_beta(margins_sdf):
    g = glm(margins_sdf, "yg ~ x1 + x2", family="gaussian")
    out = average_marginal_effects(g, margins_sdf)
    assert out.ame.to_numpy() == pytest.approx(g.beta[1:], rel=1e-12)
    assert out.stderr.to_numpy() == pytest.approx(g.stderr[1:], rel=1e-9)


def test_poisson_matches_numpy(margins_sdf, margins_pdf):
    g = glm(margins_sdf, "yc ~ x1 + x2", family="poisson")
    out = average_marginal_effects(g, margins_sdf)
    X = np.column_stack([np.ones(len(margins_pdf)), margins_pdf.x1,
                         margins_pdf.x2])
    mu = np.exp(X @ np.asarray(g.beta))
    abar = mu.mean()
    assert out.ame.to_numpy() == pytest.approx(abar * g.beta[1:], rel=1e-9)
    cbar = (mu[:, None] * X).mean(axis=0)
    A = (mu[:, None, None] * X[:, :, None] * X[:, None, :]).sum(axis=0)
    cov = np.linalg.inv(A)
    J = np.zeros((2, 3))
    for r, bi in enumerate((1, 2)):
        J[r] = g.beta[bi] * cbar
        J[r, bi] += abar
    se = np.sqrt(np.diag(J @ cov @ J.T))
    assert out.stderr.to_numpy() == pytest.approx(se, rel=1e-7)
    # finite-difference check: mean prediction moved by eps in x1
    eps = 1e-5
    fd = (np.exp(X @ g.beta + eps * g.beta[1]).mean() - mu.mean()) / eps
    assert out.ame.iloc[0] == pytest.approx(fd, rel=1e-3)


def test_probit_cloglog_run_and_probe(margins_sdf, margins_pdf):
    for link in ("probit", "cloglog"):
        g = glm(margins_sdf, "yb ~ x1 + x2", family="binomial", link=link)
        out = average_marginal_effects(g, margins_sdf)
        # logit/probit/cloglog AMEs should broadly agree on the same DGP
        assert out.ame.iloc[0] == pytest.approx(0.8 * 0.19, abs=0.05)
        assert (out.stderr > 0).all()
        assert (out.p_value < 0.01).all()


def test_tweedie_and_negbin_paths(margins_sdf):
    tw = glm(margins_sdf, "yc ~ x1 + x2", family="tweedie", var_power=1.4)
    out = average_marginal_effects(tw, margins_sdf)
    assert (out.stderr > 0).all() and np.isfinite(out.ame).all()
    from fast_causal_inference_spark.operators.glm import (
        negative_binomial_regression,
    )

    nb = negative_binomial_regression(margins_sdf, "yc ~ x1 + x2")
    out_nb = average_marginal_effects(nb, margins_sdf)
    assert (out_nb.stderr > 0).all() and np.isfinite(out_nb.ame).all()
    # poisson-ish data: NB and tweedie AMEs should be near the poisson AME
    po = glm(margins_sdf, "yc ~ x1 + x2", family="poisson")
    out_po = average_marginal_effects(po, margins_sdf)
    assert out_nb.ame.to_numpy() == pytest.approx(out_po.ame.to_numpy(),
                                                  rel=0.1)


def test_joint_ame_differing_null_masks(spark):
    """N=2 joint scan where the models' complete-case masks differ on a
    frame WITH NULLs: each model's slice must equal its solo AME (the
    mask-gated sums must not leak the other model's excluded rows)."""
    import numpy as np
    import pandas as pd

    from fast_causal_inference_spark.operators.glm import glm
    from fast_causal_inference_spark.operators.margins import (
        average_marginal_effects,
        average_marginal_effects_joint,
    )

    rng = np.random.default_rng(11)
    n = 2000
    x1 = rng.normal(0, 1, n)
    x2 = rng.normal(0, 1, n)
    y1 = rng.poisson(np.exp(0.4 + 0.3 * x1)).astype(float)
    y2 = rng.binomial(1, 1 / (1 + np.exp(-(0.2 + 0.5 * x2)))).astype(float)
    pdf = pd.DataFrame({"x1": x1, "x2": x2, "y1": y1, "y2": y2})
    # model A loses rows where x1 is NULL; model B where y2 is NULL —
    # disjoint missingness so the two masks genuinely differ
    pdf.loc[: n // 10, "x1"] = np.nan
    pdf.loc[n - n // 10:, "y2"] = np.nan
    df = spark.createDataFrame(pdf).cache()
    ma = glm(df, "y1 ~ x1", family="poisson")
    mb = glm(df, "y2 ~ x2", family="binomial")
    joint = average_marginal_effects_joint([ma, mb], df)
    solo = [average_marginal_effects(ma, df),
            average_marginal_effects(mb, df)]
    for k in range(2):
        np.testing.assert_array_equal(
            joint[k][["ame", "stderr"]].to_numpy(),
            solo[k][["ame", "stderr"]].to_numpy())
    df.unpersist()
