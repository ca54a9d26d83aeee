"""p-value adjustment vs hand-computed BH/Holm/Bonferroni."""

import numpy as np
import pandas as pd
import pytest

from fast_causal_inference_spark.operators.multiple_testing import (
    adjust_pvalues,
)

# classic worked example (Benjamini & Hochberg 1995 style)
P = [0.01, 0.04, 0.03, 0.005, 0.55, np.nan, 0.2]


def test_bonferroni():
    out = adjust_pvalues(pd.DataFrame({"p_value": P}), method="bonferroni")
    m = 6
    want = [min(p * m, 1.0) if p == p else np.nan for p in P]
    np.testing.assert_allclose(out.p_value_bonferroni, want)


def test_bh_matches_hand():
    out = adjust_pvalues(pd.DataFrame({"p_value": P}), method="bh")
    pv = np.array([p for p in P if p == p])
    m = len(pv)
    order = np.argsort(pv)
    ranked = pv[order] * m / (np.arange(m) + 1)
    ranked = np.minimum.accumulate(ranked[::-1])[::-1]
    want_sorted = dict(zip(pv[order], np.minimum(ranked, 1.0)))
    got = out.p_value_bh.to_numpy()
    for p, g in zip(P, got):
        if p != p:
            assert np.isnan(g)
        else:
            assert g == pytest.approx(want_sorted[p])
    # q-values are monotone in p
    ok = out.dropna().sort_values("p_value")
    assert (ok.p_value_bh.diff().dropna() >= -1e-12).all()


def test_holm_dominates_bonferroni():
    out_h = adjust_pvalues(pd.DataFrame({"p_value": P}), method="holm")
    out_b = adjust_pvalues(pd.DataFrame({"p_value": P}),
                           method="bonferroni")
    ok = ~np.isnan(np.array(P, dtype=float))
    assert (out_h.p_value_holm[ok] <= out_b.p_value_bonferroni[ok]
            + 1e-12).all()


def test_spark_roundtrip(spark, ab_df):
    from fast_causal_inference_spark.operators.ttest import ttest_2samp

    res = pd.concat([ttest_2samp(ab_df, y, "treatment").toPandas()
                     for y in ("avg(y)", "avg(numerator)",
                               "avg(denominator)")], ignore_index=True)
    sdf = spark.createDataFrame(res)
    adj = adjust_pvalues(sdf, method="bh")
    pdf = adj.toPandas() if not isinstance(adj, pd.DataFrame) else adj
    assert "p_value_bh" in pdf.columns
    assert (pdf.p_value_bh >= pdf.p_value - 1e-12).all()
